"""Out-of-core streaming EM == single-shot EM on the concatenated data."""

import numpy as np

from ppca_rs_tpu import Dataset, PPCAModel, Prior, StreamingPPCATrainer, iterate_streamed


def make_data(rng, n=90, d=6):
    data = rng.normal(size=(n, d))
    data[rng.random((n, d)) < 0.3] = np.nan
    return data


def test_streamed_iteration_matches_single_shot(rng):
    data = make_data(rng)
    full = Dataset(data, weights=rng.random(90) + 0.5)
    chunks = list(full.chunks(4))
    model = PPCAModel(
        isotropic_noise=0.5,
        transform=rng.normal(size=(6, 2)),
        mean=rng.normal(size=6),
    )
    prior = Prior().with_isotropic_noise_prior(2.0, 2.0)

    m_stream, llk_stream = iterate_streamed(model, chunks, prior)
    m_full, llk_full = model._iterate_with_llk(full, prior)

    assert np.isclose(llk_stream, llk_full, rtol=1e-10)
    np.testing.assert_allclose(m_stream.transform, m_full.transform, rtol=1e-8)
    np.testing.assert_allclose(m_stream.mean, m_full.mean, rtol=1e-8)
    assert np.isclose(m_stream.isotropic_noise, m_full.isotropic_noise, rtol=1e-10)


def test_streaming_trainer_converges(rng):
    real = PPCAModel(
        isotropic_noise=0.2,
        transform=rng.normal(size=(8, 2)),
        mean=np.zeros(8),
    )
    full = real.sample(600, 0.2)
    chunks = list(full.chunks(5))
    seen = []
    model = StreamingPPCATrainer(chunks).train(
        state_size=2, n_iters=8, quiet=True,
        callback=lambda i, m: seen.append(m.llk),
    )
    assert seen[-1] > seen[0]
    assert all(b >= a - 1e-7 for a, b in zip(seen, seen[1:]))
    assert model.state_size == 2


def test_lazy_chunk_callables(rng):
    data = make_data(rng, n=40)
    full = Dataset(data)
    parts = [full.slice(0, 20), full.slice(20, 40)]
    calls = []

    def lazy(i):
        def load():
            calls.append(i)
            return parts[i]
        return load

    model = PPCAModel(
        isotropic_noise=0.7, transform=rng.normal(size=(6, 2)), mean=np.zeros(6)
    )
    m1, llk1 = iterate_streamed(model, [lazy(0), lazy(1)])
    m2, llk2 = model._iterate_with_llk(full, None)
    assert calls == [0, 1]
    assert np.isclose(llk1, llk2, rtol=1e-10)
    np.testing.assert_allclose(m1.transform, m2.transform, rtol=1e-8)
