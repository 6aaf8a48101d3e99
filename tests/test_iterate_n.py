"""iterate_n: n EM iterations in one compiled scan == n sequential
iterate calls, on every dispatch path (masked / dense / pattern / sharded /
mixture), including priors and the llk trace convention (llks[i] = llk of
the model BEFORE step i)."""

import numpy as np
import pytest
import jax

from ppca_rs_tpu import Dataset, PPCAMix, PPCAModel, PPCAMixTrainer, PPCATrainer, Prior
from ppca_rs_tpu.parallel.mesh import make_mesh, shard_dataset


def _masked_data(rng, n, d, miss=0.3):
    data = rng.normal(size=(n, d))
    data[rng.random((n, d)) < miss] = np.nan
    data[3] = np.nan
    w = rng.random(n) + 0.5
    w[5] = 0.0
    return Dataset(data, weights=w)


def _check_single(model, ds, n_iters, prior=None):
    fast, llks = model.iterate_n(ds, n_iters, prior)
    slow = model
    slow_llks = []
    for _ in range(n_iters):
        slow, llk = slow._iterate_with_llk(ds, prior)
        slow_llks.append(llk)
    np.testing.assert_allclose(llks, slow_llks, rtol=1e-10)
    np.testing.assert_allclose(fast.transform, slow.transform, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(fast.mean, slow.mean, rtol=1e-9, atol=1e-12)
    assert np.isclose(fast.isotropic_noise, slow.isotropic_noise, rtol=1e-10)


def test_iterate_n_masked(rng):
    ds = _masked_data(rng, 80, 9)
    model = PPCAModel.init(3, ds, key=jax.random.PRNGKey(0))
    _check_single(model, ds, 4)


def test_iterate_n_masked_with_prior(rng):
    ds = _masked_data(rng, 60, 7)
    model = PPCAModel.init(2, ds, key=jax.random.PRNGKey(1))
    prior = (
        Prior()
        .with_isotropic_noise_prior(2.0, 1.0)
        .with_transformation_precision(0.05)
        .with_mean_prior(np.zeros(7), 0.5 * np.eye(7))
    )
    _check_single(model, ds, 3, prior)


def test_iterate_n_dense(rng):
    ds = Dataset(rng.normal(size=(64, 8)))
    assert ds.all_observed()
    model = PPCAModel.init(3, ds, key=jax.random.PRNGKey(2))
    _check_single(model, ds, 4)


def test_iterate_n_pattern(rng):
    n, d, P = 96, 12, 3
    pats = rng.random((P, d)) < 0.4
    pidx = rng.integers(0, P, size=n)
    data = rng.normal(size=(n, d))
    data[pats[pidx]] = np.nan
    ds = Dataset(data)
    assert ds.pattern_info() is not None
    model = PPCAModel.init(3, ds, key=jax.random.PRNGKey(3))
    _check_single(model, ds, 3)


def test_iterate_n_sharded(rng):
    ds = _masked_data(rng, 64, 8)
    mesh = make_mesh(data=4, model=2)
    sds = shard_dataset(ds, mesh)
    model = PPCAModel.init(3, ds, key=jax.random.PRNGKey(4))
    fast, llks = model.iterate_n(sds, 3)
    ref, ref_llks = model.iterate_n(ds, 3)
    np.testing.assert_allclose(llks, ref_llks, rtol=1e-8)
    np.testing.assert_allclose(fast.transform, ref.transform, rtol=1e-7, atol=1e-10)


def test_iterate_n_mixture(rng):
    ds = _masked_data(rng, 90, 8)
    mix = PPCAMix.init(2, 3, ds, key=jax.random.PRNGKey(5))
    fast, llks = mix.iterate_n(ds, 3)
    slow = mix
    slow_llks = []
    for _ in range(3):
        slow, llk = slow._iterate_with_llk(ds, Prior())
        slow_llks.append(llk)
    np.testing.assert_allclose(llks, slow_llks, rtol=1e-10)
    for a, b in zip(fast.models, slow.models):
        np.testing.assert_allclose(a.transform, b.transform, rtol=1e-8, atol=1e-11)
        assert np.isclose(a.isotropic_noise, b.isotropic_noise, rtol=1e-9)
    np.testing.assert_allclose(fast.log_weights, slow.log_weights, rtol=1e-9)


def test_iterate_n_mixture_pattern(rng):
    n, d, P = 96, 10, 3
    pats = rng.random((P, d)) < 0.3
    pidx = rng.integers(0, P, size=n)
    data = rng.normal(size=(n, d))
    data[pats[pidx]] = np.nan
    ds = Dataset(data)
    assert ds.pattern_info() is not None
    mix = PPCAMix.init(2, 3, ds, key=jax.random.PRNGKey(6))
    fast, llks = mix.iterate_n(ds, 3)
    slow = mix
    for _ in range(3):
        slow, _ = slow._iterate_with_llk(ds, Prior())
    for a, b in zip(fast.models, slow.models):
        np.testing.assert_allclose(a.transform, b.transform, rtol=1e-8, atol=1e-11)


def test_iterate_n_zero_iters(rng):
    ds = _masked_data(rng, 20, 5)
    model = PPCAModel.init(2, ds, key=jax.random.PRNGKey(7))
    same, llks = model.iterate_n(ds, 0)
    assert same is model and llks.shape == (0,)


def test_trainer_quiet_uses_scan_and_matches(rng):
    """quiet training (the scan fast path) == verbose training (the
    per-iteration loop), for both trainers."""
    ds = _masked_data(rng, 70, 8)
    a = PPCATrainer(ds).train(state_size=3, n_iters=4, quiet=True, key=jax.random.PRNGKey(11))
    b = PPCATrainer(ds).train(state_size=3, n_iters=4, quiet=False, key=jax.random.PRNGKey(11))
    np.testing.assert_allclose(a.transform, b.transform, rtol=1e-9, atol=1e-12)

    am = PPCAMixTrainer(ds).train(n_models=2, state_size=3, n_iters=3, quiet=True, key=jax.random.PRNGKey(12))
    bm = PPCAMixTrainer(ds).train(n_models=2, state_size=3, n_iters=3, quiet=False, key=jax.random.PRNGKey(12))
    for x, y in zip(am.models, bm.models):
        np.testing.assert_allclose(x.transform, y.transform, rtol=1e-8, atol=1e-11)


def test_iterate_n_bf16_storage(rng):
    """bf16-stored datasets run the scan path with f32 math (same dtype
    promotion contract as single-step iterate)."""
    import jax.numpy as jnp

    ds = _masked_data(rng, 64, 8).astype(jnp.bfloat16)
    assert ds.dtype == jnp.bfloat16
    model = PPCAModel.init(3, ds, key=jax.random.PRNGKey(13))
    fast, llks = model.iterate_n(ds, 3)
    slow = model
    for _ in range(3):
        slow = slow.iterate(ds)
    np.testing.assert_allclose(fast.transform, slow.transform, rtol=1e-6, atol=1e-8)
    assert np.isfinite(llks).all()


def test_iterate_n_mixture_sharded(rng):
    """Mixture scan over a (data x model) mesh == unsharded scan."""
    from ppca_rs_tpu.parallel.mesh import make_mesh, shard_dataset

    ds = _masked_data(rng, 64, 8)
    mesh = make_mesh(data=4, model=2)
    sds = shard_dataset(ds, mesh)
    mix = PPCAMix.init(2, 3, ds, key=jax.random.PRNGKey(21))
    fast, llks = mix.iterate_n(sds, 2)
    ref, ref_llks = mix.iterate_n(ds, 2)
    np.testing.assert_allclose(llks, ref_llks, rtol=1e-8)
    for a, b in zip(fast.models, ref.models):
        np.testing.assert_allclose(a.transform, b.transform, rtol=1e-7, atol=1e-10)
        assert np.isclose(a.isotropic_noise, b.isotropic_noise, rtol=1e-8)
