"""Fully-observed fast path (ops/dense_fast.py) vs the masked path.

A fully-observed dataset must produce identical results through the dense
shortcut (one shared k x k solve) and through the generic masked machinery
with an all-True mask — on a single device and on an 8-device mesh.
"""

import numpy as np
import pytest

import jax

from ppca_rs_tpu import Dataset, PPCAModel, PPCATrainer, Prior, config
from ppca_rs_tpu.parallel.mesh import make_mesh, shard_dataset


def make_pair(rng, n=64, d=10, k=3):
    """(dense-flagged dataset, force-masked-path dataset) with same values."""
    C = rng.normal(size=(d, k))
    mean = rng.normal(size=d)
    data = rng.normal(size=(n, d)) + mean
    weights = rng.random(n) + 0.5
    model = PPCAModel(isotropic_noise=0.4, transform=C, mean=mean)
    ds = Dataset(data, weights=weights)
    assert ds.all_observed()
    masked_ds = Dataset(data, weights=weights)
    masked_ds._all_observed = False  # force the generic masked machinery
    return model, ds, masked_ds


def test_dense_matches_masked(rng):
    model, ds, masked_ds = make_pair(rng)
    np.testing.assert_allclose(model.llks(ds), model.llks(masked_ds), rtol=1e-9)
    assert np.isclose(model.llk(ds), model.llk(masked_ds), rtol=1e-10)

    inf_d = model.infer(ds)
    inf_m = model.infer(masked_ds)
    np.testing.assert_allclose(inf_d.states(), inf_m.states(), rtol=1e-8, atol=1e-11)
    np.testing.assert_allclose(
        inf_d.covariances_array(), inf_m.covariances_array(), rtol=1e-8, atol=1e-12
    )

    np.testing.assert_allclose(
        model.smooth(ds).numpy(), model.smooth(masked_ds).numpy(), rtol=1e-8
    )
    np.testing.assert_allclose(model.extrapolate(ds).numpy(), ds.numpy(), rtol=1e-12)


@pytest.mark.parametrize("prior_kind", ["none", "all"])
def test_dense_em_matches_masked(rng, prior_kind):
    model, ds, masked_ds = make_pair(rng, n=80, d=8, k=3)
    prior = None
    if prior_kind == "all":
        prior = (
            Prior()
            .with_isotropic_noise_prior(2.0, 3.0)
            .with_transformation_precision(0.4)
            .with_mean_prior(rng.normal(size=8), np.eye(8) * 0.6)
        )
    if prior is None:
        m_d, m_m = model.iterate(ds), model.iterate(masked_ds)
    else:
        m_d = model.iterate_with_prior(ds, prior)
        m_m = model.iterate_with_prior(masked_ds, prior)
    np.testing.assert_allclose(m_d.transform, m_m.transform, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(m_d.mean, m_m.mean, rtol=1e-7, atol=1e-10)
    assert np.isclose(m_d.isotropic_noise, m_m.isotropic_noise, rtol=1e-9)

    # fused llk agrees too
    _, llk_d = model._iterate_with_llk(ds, prior)
    _, llk_m = model._iterate_with_llk(masked_ds, prior)
    assert np.isclose(llk_d, llk_m, rtol=1e-10)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2)])
def test_dense_sharded_matches_single(rng, mesh_shape):
    model, ds, _ = make_pair(rng, n=101, d=8, k=3)  # padding exercised
    mesh = make_mesh(data=mesh_shape[0], model=mesh_shape[1])
    sds = shard_dataset(ds, mesh)
    assert sds.all_observed()
    assert np.isclose(model.llk(sds), model.llk(ds), rtol=1e-10)
    np.testing.assert_allclose(model.llks(sds), model.llks(ds), rtol=1e-9)
    m_s, m_d = model.iterate(sds), model.iterate(ds)
    np.testing.assert_allclose(m_s.transform, m_d.transform, rtol=1e-8, atol=1e-11)
    np.testing.assert_allclose(m_s.mean, m_d.mean, rtol=1e-8, atol=1e-11)
    assert np.isclose(m_s.isotropic_noise, m_d.isotropic_noise, rtol=1e-10)


def test_dense_training_converges(rng):
    real = PPCAModel(
        isotropic_noise=0.1,
        transform=rng.normal(size=(6, 2)),
        mean=rng.normal(size=6),
    )
    data = real.sample(400, 0.0)  # fully observed
    assert data.all_observed()
    seen = []
    PPCATrainer(data).train(
        state_size=2, n_iters=10, quiet=True, callback=lambda i, m: seen.append(m.llk)
    )
    assert seen[-1] > seen[0]
    assert all(b >= a - 1e-7 for a, b in zip(seen, seen[1:]))
