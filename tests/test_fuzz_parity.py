"""Randomized parity fuzz: many random shapes/masks/weights/priors through
the full EM + llk + posterior pipeline vs the brute-force reference formulas
(tests/reference_impl.py) in f64."""

import numpy as np
import pytest

import reference_impl as ref
from ppca_rs_tpu import Dataset, PPCAModel, Prior


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_em_llk_posterior(seed):
    rng = np.random.default_rng(1000 + seed)
    n = int(rng.integers(5, 60))
    d = int(rng.integers(1, 12))
    k = int(rng.integers(0, min(d, 5) + 1))
    mask_prob = float(rng.uniform(0.0, 0.7))

    C = rng.normal(size=(d, k)) * rng.uniform(0.3, 3.0)
    mean = rng.normal(size=d)
    sigma = float(rng.uniform(0.05, 2.0))
    data = rng.normal(size=(n, d)) * 2.0 + mean
    mask = rng.random((n, d)) > mask_prob
    if n > 3 and rng.random() < 0.5:
        mask[2] = False                       # all-masked row
    if d > 2 and rng.random() < 0.5:
        mask[:, 1] = False                    # empty dimension
        C = C.copy()
        C[1] = 0.0
    weights = rng.random(n) + 0.1
    data = np.where(mask, data, np.nan)

    model = PPCAModel(isotropic_noise=sigma, transform=C, mean=mean)
    ds = Dataset(data, weights=weights)

    # llks
    got = model.llks(ds)
    want = np.array([
        ref.llk_one(C, mean, sigma, np.nan_to_num(data[i]), mask[i]) for i in range(n)
    ])
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-8)

    # posterior
    if k > 0:
        inf = model.infer(ds)
        for i in range(0, n, max(1, n // 5)):
            s, cov = ref.infer_one(C, mean, sigma, np.nan_to_num(data[i]), mask[i])
            np.testing.assert_allclose(inf.states()[i], s, rtol=1e-7, atol=1e-9)
            np.testing.assert_allclose(inf.covariances_array()[i], cov, rtol=1e-7, atol=1e-9)

    # EM with a random prior combination
    kwargs = {}
    prior = Prior()
    if rng.random() < 0.5:
        a, b = float(rng.uniform(0.5, 20)), float(rng.uniform(0.5, 20))
        prior = prior.with_isotropic_noise_prior(a, b)
        kwargs["noise_prior"] = (a, b)
    if rng.random() < 0.5:
        lam = float(rng.uniform(0.0, 2.0))
        prior = prior.with_transformation_precision(lam)
        kwargs["transformation_precision"] = lam
    if rng.random() < 0.5:
        pm = rng.normal(size=d)
        pc = np.eye(d) * rng.uniform(0.2, 2.0)
        prior = prior.with_mean_prior(pm, pc)
        kwargs["mean_prior"] = (pm, np.linalg.inv(pc))

    new_model = model.iterate_with_prior(ds, prior)
    want_C, want_mean, want_sigma = ref.em_iterate(
        C, mean, sigma, np.nan_to_num(data), mask, weights, **kwargs
    )
    np.testing.assert_allclose(new_model.transform, want_C, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(new_model.mean, want_mean, rtol=1e-6, atol=1e-8)
    assert np.isclose(new_model.isotropic_noise, want_sigma, rtol=1e-7)


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_pattern_path_parity(seed):
    """Structured missingness (P patterns << N) routes through the
    pattern-table fast path — same llks/posteriors/EM as the brute-force
    reference formulas."""
    rng = np.random.default_rng(2000 + seed)
    n = int(rng.integers(120, 300))
    d = int(rng.integers(4, 14))
    k = int(rng.integers(1, min(d, 5) + 1))
    P = int(rng.integers(1, 5))

    pats = rng.random((P, d)) < rng.uniform(0.0, 0.6)
    pats[:, int(rng.integers(0, d))] = False        # one dim missing in some
    pats[0, 0] = True                               # >=1 genuinely masked entry
    pidx = rng.integers(0, P, size=n)
    pidx[0] = 0                                     # (else the draw can be fully
                                                    # observed -> dense path)
    mask = ~pats[pidx]                               # pattern True = missing
    C = rng.normal(size=(d, k))
    mean = rng.normal(size=d) * 3.0
    sigma = float(rng.uniform(0.1, 1.5))
    data = np.where(mask, rng.normal(size=(n, d)) + mean, np.nan)
    weights = rng.random(n) + 0.1

    ds = Dataset(data, weights=weights)
    assert ds.pattern_info() is not None             # the fast path is live

    model = PPCAModel(isotropic_noise=sigma, transform=C, mean=mean)
    got = model.llks(ds)
    want = np.array([
        ref.llk_one(C, mean, sigma, np.nan_to_num(data[i]), mask[i]) for i in range(n)
    ])
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-8)

    inf = model.infer(ds)
    for i in range(0, n, max(1, n // 7)):
        s, cov = ref.infer_one(C, mean, sigma, np.nan_to_num(data[i]), mask[i])
        np.testing.assert_allclose(inf.states()[i], s, rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(inf.covariances_array()[i], cov, rtol=1e-7, atol=1e-9)

    new_model = model.iterate(ds)
    want_C, want_mean, want_sigma = ref.em_iterate(
        C, mean, sigma, np.nan_to_num(data), mask, weights,
    )
    np.testing.assert_allclose(new_model.transform, want_C, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(new_model.mean, want_mean, rtol=1e-6, atol=1e-8)
    assert np.isclose(new_model.isotropic_noise, want_sigma, rtol=1e-7)


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_dense_path_parity(seed):
    """Fully observed data routes through the dense fast path — same
    llks/EM as the reference formulas with an all-True mask, including
    LARGE mean offsets (regression class: centered-form cancellation)."""
    rng = np.random.default_rng(3000 + seed)
    n = int(rng.integers(50, 200))
    d = int(rng.integers(2, 14))
    k = int(rng.integers(1, min(d, 5) + 1))
    offset = rng.normal(size=d) * float(rng.choice([1.0, 50.0, 500.0]))

    C = rng.normal(size=(d, k))
    mean = offset + rng.normal(size=d)
    sigma = float(rng.uniform(0.1, 1.5))
    data = rng.normal(size=(n, d)) + offset
    weights = rng.random(n) + 0.1
    mask = np.ones((n, d), bool)

    ds = Dataset(data, weights=weights)
    assert ds.all_observed()                         # the dense path is live

    model = PPCAModel(isotropic_noise=sigma, transform=C, mean=mean)
    got = model.llks(ds)
    want = np.array([
        ref.llk_one(C, mean, sigma, data[i], mask[i]) for i in range(n)
    ])
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-8)

    # n chained iterations through iterate_n == n reference EM steps
    n_steps = 3
    fast, _ = model.iterate_n(ds, n_steps)
    want_C, want_mean, want_sigma = np.asarray(C), np.asarray(mean), sigma
    for _ in range(n_steps):
        want_C, want_mean, want_sigma = ref.em_iterate(
            want_C, want_mean, want_sigma, data, mask, weights,
        )
    np.testing.assert_allclose(fast.transform, want_C, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(fast.mean, want_mean, rtol=1e-6, atol=1e-7)
    assert np.isclose(fast.isotropic_noise, want_sigma, rtol=1e-7)
