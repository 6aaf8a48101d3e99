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
from ppca_rs_tpu.models.ppca import PPCAModel as Model


def lowrank_data(rng, n, d, k):
    U = rng.normal(size=(d, k)).astype(np.float32)
    z = rng.normal(size=(n, k)).astype(np.float32)
    return z @ U.T, U


def test_dense_iterate_noiseless_stays_finite(rng):
    n, d, k = 4096, 64, 4
    data, U = lowrank_data(rng, n, d, k)
    ds = Dataset(np.asarray(data, np.float64)).astype(np.float32)
    model = PPCAModel(
        isotropic_noise=np.float32(1e-4),
        transform=U,
        mean=np.zeros(d, np.float32),
    )
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
    model = PPCAModel(
        isotropic_noise=np.float32(1e-4),
        transform=U,
        mean=np.zeros(d, np.float32),
    )
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
    model = PPCAModel(
        isotropic_noise=np.float32(1e-4),
        transform=U,
        mean=np.zeros(d, np.float32),
    )
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
    models = [
        PPCAModel(
            isotropic_noise=np.float32(1e-4),
            transform=U + 0.01 * i,
            mean=np.zeros(d, np.float32),
        )
        for i in range(M)
    ]
    mix = PPCAMix(models, np.zeros(M, np.float32))
    for _ in range(3):
        mix = mix.iterate(ds)
        for m in mix.models:
            sig = float(m.isotropic_noise)
            assert np.isfinite(sig) and sig >= 0.0
    assert np.isfinite(float(mix.llk(ds)))
