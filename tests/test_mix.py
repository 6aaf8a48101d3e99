"""Mixture model tests (`ppca/src/mix.rs` behavior)."""

import pickle

import numpy as np
import pytest

from ppca_rs_tpu import Dataset, PPCAMix, PPCAModel, Prior


def two_component_mix(rng=None):
    m1 = PPCAModel(
        isotropic_noise=0.1,
        transform=np.array([[1.0, 0.0], [0.0, 0.0], [0.0, 1.0]]),
        mean=np.array([1.0, 1.0, 1.0]),
    )
    m2 = PPCAModel(
        isotropic_noise=0.1,
        transform=np.array([[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]]),
        mean=np.array([0.0, 1.0, 0.0]),
    )
    return PPCAMix([m1, m2], np.log([0.33333, 0.66667]))


def test_mix_construction_and_weights():
    mix = two_component_mix()
    assert mix.output_size == 3
    assert mix.state_sizes == [2, 2]
    assert mix.n_parameters == 2 * (1 + 6 + 3) + 1
    np.testing.assert_allclose(np.sum(mix.weights), 1.0, rtol=1e-9)
    np.testing.assert_allclose(mix.weights, [0.33333, 0.66667], rtol=1e-4)


def test_mix_output_size_mismatch():
    m1 = PPCAModel(isotropic_noise=1.0, transform=np.ones((3, 1)), mean=np.zeros(3))
    m2 = PPCAModel(isotropic_noise=1.0, transform=np.ones((4, 1)), mean=np.zeros(4))
    with pytest.raises(ValueError):
        PPCAMix([m1, m2], np.zeros(2))


def test_mix_llk_consistency():
    """Mixture llk: single-component mixture equals the component;
    generally logsumexp dominates each weighted component."""
    mix = two_component_mix()
    data = mix.sample(50, 0.2)
    single = PPCAMix([mix.models[0]], np.zeros(1))
    np.testing.assert_allclose(
        single.llks(data), mix.models[0].llks(data), rtol=1e-9
    )
    mix_llks = mix.llks(data)
    comp_llks = np.stack([m.llks(data) for m in mix.models], axis=1)
    lw = mix.log_weights
    assert np.all(mix_llks >= (comp_llks + lw).max(axis=1) - 1e-9)
    assert np.all(mix_llks <= comp_llks.max(axis=1) + 1e-9)


def test_infer_cluster_log_posteriors():
    mix = two_component_mix()
    data = mix.sample(30, 0.2)
    log_post = mix.infer_cluster(data)
    assert log_post.shape == (30, 2)
    # log-softmax rows: exp sums to 1
    np.testing.assert_allclose(np.exp(log_post).sum(axis=1), 1.0, rtol=1e-9)
    inf = mix.infer(data)
    np.testing.assert_allclose(inf.log_posteriors(), log_post, rtol=1e-9)
    np.testing.assert_allclose(inf.posteriors(), np.exp(log_post), rtol=1e-9)


def test_mix_em_increases_llk():
    """`mix.rs:267-269`: iterate increases the mixture llk."""
    mix = two_component_mix()
    data = mix.sample(300, 0.1)
    model = PPCAMix.init(2, 2, data)
    prev = model.llk(data)
    for _ in range(10):
        model = model.iterate(data)
        cur = model.llk(data)
        assert cur >= prev - 1e-6
        prev = cur


def test_mix_em_with_prior_runs():
    mix = two_component_mix()
    data = mix.sample(100, 0.1)
    prior = Prior().with_isotropic_noise_prior(10.0, 10.0).with_transformation_precision(0.1)
    model = PPCAMix.init(2, 2, data)
    for _ in range(3):
        model = model.iterate_with_prior(data, prior)
    assert np.isfinite(model.llk(data))


def test_mix_heterogeneous_state_sizes():
    """Components may have different state sizes (`mix.rs:41-45`)."""
    m1 = PPCAModel(isotropic_noise=0.5, transform=np.ones((3, 1)), mean=np.zeros(3))
    m2 = PPCAModel(
        isotropic_noise=0.5, transform=np.eye(3)[:, :2], mean=np.ones(3)
    )
    mix = PPCAMix([m1, m2], np.zeros(2))
    assert mix.state_sizes == [1, 2]
    data = mix.sample(40, 0.2)
    assert np.isfinite(mix.llk(data))
    new = mix.iterate(data)
    assert new.state_sizes == [1, 2]
    inf = mix.infer(data)
    # D-space readouts work with heterogeneous k
    assert inf.smoothed(mix).numpy().shape == (40, 3)
    assert inf.extrapolated(mix, data).numpy().shape == (40, 3)
    assert inf.smoothed_covariances_diagonal(mix).numpy().shape == (40, 3)
    # state-space moment matching requires equal k
    with pytest.raises(ValueError):
        inf.states()


def test_mix_smooth_extrapolate_moment_match():
    mix = two_component_mix()
    data = mix.sample(25, 0.3)
    inf = mix.infer(data)
    post = inf.posteriors()
    per_sm = [
        (m.infer(data).states() @ m.transform.T + m.mean) for m in mix.models
    ]
    want = sum(post[:, i : i + 1] * per_sm[i] for i in range(2))
    np.testing.assert_allclose(mix.smooth(data).numpy(), want, rtol=1e-7, atol=1e-9)

    extr = mix.extrapolate(data).numpy()
    mask = np.asarray(data.mask)
    vals = np.nan_to_num(data.numpy())
    want_ex = sum(
        post[:, i : i + 1] * np.where(mask, vals, per_sm[i]) for i in range(2)
    )
    np.testing.assert_allclose(extr, want_ex, rtol=1e-7, atol=1e-9)
    # observed entries unchanged
    np.testing.assert_allclose(extr[mask], vals[mask], rtol=1e-9)


def test_mix_state_covariance_law_of_total_variance():
    mix = two_component_mix()
    data = mix.sample(10, 0.3)
    inf = mix.infer(data)
    post = inf.posteriors()
    states = inf.states()
    comp_states = [m.infer(data).states() for m in mix.models]
    comp_covs = [m.infer(data).covariances_array() for m in mix.models]
    want_state = sum(post[:, i : i + 1] * comp_states[i] for i in range(2))
    np.testing.assert_allclose(states, want_state, rtol=1e-8)
    # the reference-bug compat flag weights by RAW log-posterior entries
    # (mix.rs:374-380) instead of their exponentials
    log_post = inf.log_posteriors()
    want_ref = sum(log_post[:, i : i + 1] * comp_states[i] for i in range(2))
    np.testing.assert_allclose(
        inf.states(reference_log_weighting=True), want_ref, rtol=1e-6
    )
    covs = inf.covariances()
    for n in range(10):
        want = sum(
            post[n, i]
            * (
                comp_covs[i][n]
                + np.outer(comp_states[i][n] - want_state[n], comp_states[i][n] - want_state[n])
            )
            for i in range(2)
        )
        np.testing.assert_allclose(covs[n], want, rtol=1e-7, atol=1e-10)


def test_mix_second_moments():
    """E[s s^T] = sum_i post_i (Sigma_i + s_i s_i^T) = cov + mean mean^T."""
    mix = two_component_mix()
    data = mix.sample(10, 0.3)
    inf = mix.infer(data)
    states = inf.states()
    covs = inf.covariances()
    sms = inf.second_moments()
    for n in range(10):
        want = covs[n] + np.outer(states[n], states[n])
        np.testing.assert_allclose(sms[n], want, rtol=1e-7, atol=1e-10)


def test_mix_to_canonical_preserves_llk():
    mix = two_component_mix()
    data = mix.sample(40, 0.2)
    canon = mix.to_canonical()
    np.testing.assert_allclose(canon.llks(data), mix.llks(data), rtol=1e-8)


def test_mix_dump_load_pickle():
    mix = two_component_mix()
    mix2 = PPCAMix.load(mix.dump())
    np.testing.assert_allclose(mix2.log_weights, mix.log_weights)
    for a, b in zip(mix.models, mix2.models):
        np.testing.assert_allclose(a.transform, b.transform)
    mix3 = pickle.loads(pickle.dumps(mix))
    np.testing.assert_allclose(mix3.log_weights, mix.log_weights)


def test_mix_posterior_sampler():
    mix = two_component_mix()
    data = mix.sample(100, 0.2)
    sampler = mix.infer(data).posterior_sampler()
    d1 = sampler.sample()
    d2 = sampler.sample()
    assert d1.numpy().shape == (100, 3)
    assert not np.allclose(d1.numpy(), d2.numpy())


def test_mix_zero_weight_samples_dropped():
    """Zero-weight samples are excluded from the responsibility pass
    (`mix.rs:304-309`)."""
    mix = two_component_mix()
    data = mix.sample(20, 0.1)
    w = np.ones(20)
    w[5] = 0.0
    ds = Dataset(data.numpy(), weights=w)
    new = mix.iterate(ds)
    assert np.isfinite(new.llk(ds))
