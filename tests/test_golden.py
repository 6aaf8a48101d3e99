"""Golden-value parity tests.

The reference repo has exactly two golden numeric anchors
(`ppca/src/ppca_model.rs:628-681`): on the toy output covariance with
C = [[1,1,0],[1,0,1]]^T and sigma = 0.1,

    quadratic_form([1,1,1]) ~= 34.219288
    covariance_log_det      ~= -3.49328

Our mask-weighted dense formulation must reproduce both through the full-mask
path, plus the llk smoke test value computed from the same toy model.
"""

import numpy as np
import jax.numpy as jnp

from ppca_rs_tpu import Dataset, PPCAModel
from ppca_rs_tpu.ops import masked_linalg as ml

C = np.array([[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]])  # (D=3, k=2)
SIGMA = 0.1
MEAN = np.array([0.0, 1.0, 0.0])


def _block_post(x):
    CC = ml.outer_flat(jnp.asarray(C))
    data = jnp.asarray(x)[None, :]
    mask_f = jnp.ones_like(data)
    return ml.block_posterior(
        jnp.asarray(C), CC, jnp.zeros(3), jnp.asarray(SIGMA), data, mask_f
    )


def test_quadratic_form_golden():
    post = _block_post(np.array([1.0, 1.0, 1.0]))
    rnorm = float(jnp.sum(post.R * post.R))
    quad = (rnorm - float(jnp.sum(post.b * post.states))) / SIGMA**2
    assert np.isclose(quad, 34.219288, rtol=1e-6)


def test_covariance_log_det_golden():
    post = _block_post(np.array([1.0, 1.0, 1.0]))
    diag = jnp.diagonal(post.chol, axis1=-2, axis2=-1)
    logdet_m = 2.0 * float(jnp.sum(jnp.log(diag)))
    logdet = logdet_m + 2.0 * np.log(SIGMA) * (3 - 2)
    assert np.isclose(logdet, -3.49328, rtol=1e-5)


def test_llk_toy_model():
    """llk smoke value (`ppca_model.rs:673-680`), checked against the naive
    dense density."""
    model = PPCAModel(isotropic_noise=SIGMA, transform=C, mean=MEAN)
    ds = Dataset(np.array([[1.0, 2.0, 3.0]]))
    llk = model.llk(ds)

    from reference_impl import llk_one

    expected = llk_one(C, MEAN, SIGMA, np.array([1.0, 2.0, 3.0]), np.ones(3, dtype=bool))
    assert np.isclose(llk, expected, rtol=1e-10)
