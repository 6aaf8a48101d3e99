"""Dataset / model API surface tests (parity with
`src/python_bindings.rs:28-166,367-533`)."""

import pickle

import numpy as np
import pytest

from ppca_rs_tpu import Dataset, PPCAModel, PPCAMix


def test_dataset_roundtrip():
    data = np.array([[1.0, np.nan, 3.0], [np.inf, 2.0, -1.0]])
    ds = Dataset(data)
    assert len(ds) == 2
    assert ds.output_size() == 3
    out = ds.numpy()
    np.testing.assert_allclose(out[0], [1.0, np.nan, 3.0])
    assert np.isnan(out[1, 0])  # inf becomes masked, exported as NaN
    np.testing.assert_allclose(ds.weights_numpy(), [1.0, 1.0])


def test_dataset_weights_and_empty_dimensions():
    """examples/empty_dimensions.py behavior."""
    ds = Dataset(
        np.array([[1.0, 1.0, np.nan], [1.0, 1.0, np.nan]]),
        weights=np.array([1.0, 2.0]),
    )
    assert ds.empty_dimensions() == [2]
    np.testing.assert_allclose(ds.weights_numpy(), [1.0, 2.0])


def test_dataset_chunks_and_concat():
    data = np.arange(14.0).reshape(7, 2)
    ds = Dataset(data, weights=np.arange(7.0) + 1)
    chunks = list(ds.chunks(3))
    assert [len(c) for c in chunks] == [3, 3, 1]
    back = Dataset.concat(chunks)
    np.testing.assert_allclose(back.numpy(), data)
    np.testing.assert_allclose(back.weights_numpy(), np.arange(7.0) + 1)


def test_dataset_dump_load_pickle():
    data = np.array([[1.0, np.nan], [3.0, 4.0]])
    ds = Dataset(data, weights=np.array([2.0, 1.0]))
    ds2 = Dataset.load(ds.dump())
    np.testing.assert_allclose(
        ds2.numpy(), ds.numpy()
    )
    ds3 = pickle.loads(pickle.dumps(ds))
    np.testing.assert_allclose(ds3.weights_numpy(), [2.0, 1.0])


def test_model_properties_and_repr():
    C = np.array([[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]])
    model = PPCAModel(isotropic_noise=0.1, transform=C, mean=np.array([[0.0, 1.0, 0.0]]))
    assert model.output_size == 3
    assert model.state_size == 2
    assert model.n_parameters == 1 + 6 + 3
    np.testing.assert_allclose(model.transform, C)
    np.testing.assert_allclose(model.mean, [0.0, 1.0, 0.0])
    assert np.isclose(model.isotropic_noise, 0.1)
    sv = model.singular_values
    np.testing.assert_allclose(sv, np.sqrt(np.linalg.norm(C, axis=0)))
    assert "PPCAModel" in repr(model)


def test_model_mean_shapes():
    C = np.eye(3)
    for mean in (np.zeros(3), np.zeros((3, 1)), np.zeros((1, 3))):
        m = PPCAModel(isotropic_noise=1.0, transform=C, mean=mean)
        assert m.mean.shape == (3,)
    with pytest.raises(ValueError):
        PPCAModel(isotropic_noise=1.0, transform=C, mean=np.zeros((2, 2)))


def test_model_pickle_roundtrip():
    """examples/pickling.py behavior."""
    model = PPCAModel(
        isotropic_noise=0.1,
        transform=np.array([[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]]),
        mean=np.array([0.0, 1.0, 0.0]),
    )
    de = pickle.loads(pickle.dumps(model))
    np.testing.assert_allclose(de.transform, model.transform)
    np.testing.assert_allclose(de.mean, model.mean)
    assert np.isclose(de.isotropic_noise, model.isotropic_noise)

    de2 = PPCAModel.load(model.dump())
    np.testing.assert_allclose(de2.transform, model.transform)


def test_init_zeroes_empty_dimensions():
    data = np.array([[1.0, np.nan, 2.0]] * 5)
    ds = Dataset(data)
    model = PPCAModel.init(2, ds)
    np.testing.assert_allclose(model.transform[1], [0.0, 0.0])
    assert model.isotropic_noise == 1.0
    np.testing.assert_allclose(model.mean, np.zeros(3))


def test_sample_shapes_and_masking(rng):
    model = PPCAModel(
        isotropic_noise=0.1,
        transform=rng.normal(size=(4, 2)),
        mean=np.zeros(4),
    )
    ds = model.sample(1000, 0.25)
    assert len(ds) == 1000
    frac_masked = 1.0 - np.asarray(ds.mask).mean()
    assert 0.2 < frac_masked < 0.3
    # statistics: observed variance ~ diag(CC^T) + sigma^2
    vals = ds.numpy()
    var = np.nanvar(vals, axis=0)
    want = np.sum(model.transform**2, axis=1) + model.isotropic_noise**2
    np.testing.assert_allclose(var, want, rtol=0.2)


def test_posterior_sampler(rng):
    C = rng.normal(size=(5, 2))
    model = PPCAModel(isotropic_noise=0.05, transform=C, mean=np.zeros(5))
    data = model.sample(2000, 0.2)
    inf = model.infer(data)
    sampler = inf.posterior_sampler()
    draws = sampler.sample()
    assert draws.numpy().shape == (2000, 5)
    # different keys -> different draws
    d2 = sampler.sample()
    assert not np.allclose(draws.numpy(), d2.numpy())
    # posterior draws should hover around the smoothed values
    sm = inf.smoothed(model).numpy()
    resid = np.mean((draws.numpy() - sm) ** 2)
    assert resid < 1.0


def test_empty_dataset_iterate_raises():
    """Regression: empty-dataset EM returned a silent NaN model (the
    reference panics with 'non-empty dataset')."""
    ds = Dataset(np.zeros((0, 4)))
    model = PPCAModel(isotropic_noise=1.0, transform=np.zeros((4, 2)), mean=np.zeros(4))
    with pytest.raises(ValueError):
        model.iterate(ds)
    mix = PPCAMix([model], np.zeros(1))
    with pytest.raises(ValueError):
        mix.iterate(ds)


def test_to_canonical_overcomplete_raises():
    """Regression: state_size > output_size silently shrank the transform
    (the reference panics in SVD recompose)."""
    model = PPCAModel(
        isotropic_noise=1.0, transform=np.random.randn(2, 5), mean=np.zeros(2)
    )
    with pytest.raises(ValueError):
        model.to_canonical()


def test_bf16_storage(rng):
    """bf16 value storage halves HBM per sample; math still runs in f32 and
    results stay within bf16-input tolerance of the f32 pipeline."""
    import jax.numpy as jnp

    data = rng.normal(size=(300, 16))
    data[rng.random(data.shape) < 0.3] = np.nan
    ds = Dataset(data)
    ds16 = ds.astype(jnp.bfloat16)
    assert ds16.dtype == jnp.bfloat16
    assert ds16.weights_dev.dtype != jnp.bfloat16

    model = PPCAModel(
        isotropic_noise=0.6, transform=rng.normal(size=(16, 3)), mean=rng.normal(size=16)
    )
    llk32, llk16 = model.llk(ds), model.llk(ds16)
    assert np.isclose(llk16, llk32, rtol=2e-2)
    m32 = model.iterate(ds)
    m16 = model.iterate(ds16)
    np.testing.assert_allclose(m16.transform, m32.transform, rtol=0.1, atol=0.05)
    assert np.isclose(m16.isotropic_noise, m32.isotropic_noise, rtol=2e-2)
