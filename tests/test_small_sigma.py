"""Near-noiseless regime: the residual-identity statistic bodies.

The EM stat bodies compute |dev|^2 = rnorm - b.s - sigma^2 |s|^2 (exact
identity via M s = b) instead of materializing residuals.  When the model
explains the data almost perfectly the true |dev|^2 is ~0 and the f32
cancellation can dip epsilon-negative; an unclamped sum would make the
sigma^2 update negative and NaN the model via sqrt.  These tests build
exact low-rank data, place the model AT the truth with a tiny sigma, and
assert one EM step stays finite and non-negative — in f32, where the
cancellation is real (CPU f32; the kernel branch gets the same coverage
from the interpret-mode em_stats parity tests).
"""

import numpy as np
import jax.numpy as jnp

from ppca_rs_tpu import Dataset, PPCAMix, PPCAModel


def f32_model(U, sigma=1e-4):
    """A model whose params are REALLY f32 on device (the public
    constructor upcasts to f64 under the tests' x64 mode, which would make
    the whole EM run in f64 and defeat the f32 regime these tests pin)."""
    d = U.shape[0]
    return PPCAModel._from_params(
        jnp.asarray(U, jnp.float32),
        jnp.zeros((d,), jnp.float32),
        jnp.asarray(sigma, jnp.float32),
    )


def lowrank_data(rng, n, d, k):
    U = rng.normal(size=(d, k)).astype(np.float32)
    z = rng.normal(size=(n, k)).astype(np.float32)
    return z @ U.T, U


def test_dense_iterate_noiseless_stays_finite(rng):
    n, d, k = 4096, 64, 4
    data, U = lowrank_data(rng, n, d, k)
    ds = Dataset(np.asarray(data, np.float64)).astype(np.float32)
    model = f32_model(U)
    assert model._transform.dtype == jnp.float32
    for _ in range(3):
        model = model.iterate(ds)
        sig = float(model.isotropic_noise)
        assert np.isfinite(sig) and sig >= 0.0
        assert np.isfinite(np.asarray(model.transform)).all()
    assert sig < 1e-2  # still recognizes the near-noiseless fit


def test_masked_iterate_noiseless_stays_finite(rng):
    n, d, k = 4096, 64, 4
    data, U = lowrank_data(rng, n, d, k)
    data = np.asarray(data, np.float64)
    data[rng.random((n, d)) < 0.3] = np.nan   # masked path
    ds = Dataset(data).astype(np.float32)
    model = f32_model(U)
    for _ in range(3):
        model = model.iterate(ds)
        sig = float(model.isotropic_noise)
        assert np.isfinite(sig) and sig >= 0.0
        assert np.isfinite(np.asarray(model.transform)).all()


def test_pattern_iterate_noiseless_stays_finite(rng):
    n, d, k, P = 4096, 64, 4, 5
    data, U = lowrank_data(rng, n, d, k)
    data = np.asarray(data, np.float64)
    patterns = rng.random((P, d)) < 0.3
    pidx = rng.integers(0, P, size=n)
    data[patterns[pidx]] = np.nan
    ds = Dataset(data).astype(np.float32)
    assert ds.pattern_info() is not None
    model = f32_model(U)
    for _ in range(3):
        model = model.iterate(ds)
        sig = float(model.isotropic_noise)
        assert np.isfinite(sig) and sig >= 0.0


def test_mix_iterate_noiseless_stays_finite(rng):
    n, d, k, M = 2048, 32, 3, 2
    data, U = lowrank_data(rng, n, d, k)
    data = np.asarray(data, np.float64)
    data[rng.random((n, d)) < 0.2] = np.nan
    ds = Dataset(data).astype(np.float32)
    models = [f32_model(U + 0.01 * i) for i in range(M)]
    mix = PPCAMix(models, np.zeros(M, np.float32))
    for _ in range(3):
        mix = mix.iterate(ds)
        for m in mix.models:
            sig = float(m.isotropic_noise)
            assert np.isfinite(sig) and sig >= 0.0
    assert np.isfinite(float(mix.llk(ds)))


def test_dense_large_mean_offset_f32_accuracy(rng):
    """Dense-path statistics stay accurate in f32 when the data mean is
    large relative to the residual spread — regression for the uncentered
    |data|^2 - 2 data.mu + |mu|^2 expansion, whose cancellation lost ~3 of
    7 significant digits at offset 1e3 (review finding, round 2b)."""
    n, d, k = 2048, 64, 4
    U = rng.normal(size=(d, k))
    offset = 1000.0 * (1.0 + rng.random(d))
    data = rng.normal(size=(n, k)) @ U.T + offset + 0.1 * rng.normal(size=(n, d))

    ds32 = Dataset(data).astype(np.float32)
    ds64 = Dataset(data)
    m32 = PPCAModel._from_params(
        jnp.asarray(U, jnp.float32),
        jnp.asarray(offset, jnp.float32),
        jnp.asarray(0.5, jnp.float32),
    )
    m64 = PPCAModel._from_params(
        jnp.asarray(U, jnp.float64),
        jnp.asarray(offset, jnp.float64),
        jnp.asarray(0.5, jnp.float64),
    )

    llk32, llk64 = float(m32.llk(ds32)), float(m64.llk(ds64))
    assert abs(llk32 - llk64) / abs(llk64) < 1e-5

    a32, _ = m32._iterate_with_llk(ds32, None)
    a64, _ = m64._iterate_with_llk(ds64, None)
    assert abs(float(a32.isotropic_noise) - float(a64.isotropic_noise)) < 1e-4
    np.testing.assert_allclose(a32.mean, a64.mean, rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(a32.transform, a64.transform, rtol=5e-4, atol=1e-4)
