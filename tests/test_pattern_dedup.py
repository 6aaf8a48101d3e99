"""Mask-pattern deduplication (ops/pattern_dedup.py): detection gates and
exact f64 parity with the general masked path — same reductions, different
grouping."""

import numpy as np
import pytest

import jax.numpy as jnp

from ppca_rs_tpu import Dataset, PPCAModel, PPCATrainer, Prior
from ppca_rs_tpu.config import config
from ppca_rs_tpu.ops import masked_linalg as ml
from ppca_rs_tpu.ops import pattern_dedup as pd


def make_patterned_dataset(rng, n=96, d=9, n_patterns=5, empty_dim=True,
                           all_masked_row=True, zero_weight=True):
    """Data whose masks are drawn from a small pattern pool, with all the
    degenerate cases mixed in."""
    pats = rng.random((n_patterns, d)) < 0.6
    if empty_dim:
        pats[:, 3] = False                 # dimension 3 never observed
    pats[0] = False                        # an all-masked pattern
    pats[1] = True
    pats[1, 3] = not empty_dim
    idx = rng.integers(0, n_patterns, size=n)
    values = rng.normal(size=(n, d))
    values[~pats[idx]] = np.nan
    if all_masked_row:
        values[7] = np.nan
    weights = rng.random(n) + 0.25
    if zero_weight:
        weights[11] = 0.0
    return Dataset(values, weights=weights)


def make_model(rng, d=9, k=3):
    return PPCAModel(
        isotropic_noise=0.45,
        transform=rng.normal(size=(d, k)),
        mean=rng.normal(size=d),
    )


# --------------------------------------------------------------------- #
# detection


def test_pattern_info_reconstructs_mask(rng):
    ds = make_patterned_dataset(rng)
    info = ds.pattern_info()
    assert info is not None
    pidx, pats = info
    np.testing.assert_array_equal(
        np.asarray(ds.mask), np.asarray(pats)[np.asarray(pidx)]
    )
    # caching: second call returns the same objects; with_weights shares them
    assert ds.pattern_info() is info
    assert ds.with_weights(np.ones(len(ds))).pattern_info() is info


def test_pattern_info_gates(rng):
    # unstructured masks: every row distinct => not profitable
    values = rng.normal(size=(64, 12))
    values[rng.random((64, 12)) < 0.5] = np.nan
    assert Dataset(values).pattern_info() is None

    # fully observed: dense fast path owns this case
    assert Dataset(rng.normal(size=(32, 4))).pattern_info() is None

    # config switch
    ds = make_patterned_dataset(rng)
    config.use_pattern_dedup = False
    try:
        assert ds.pattern_info() is None
    finally:
        config.use_pattern_dedup = True

    # the gate is re-checked each call: a dataset with CACHED patterns must
    # honor a later config toggle (the kill switch), and a dataset first
    # probed with the flag off is not permanently demoted
    ds2 = make_patterned_dataset(rng)
    assert ds2.pattern_info() is not None      # cached now
    config.use_pattern_dedup = False
    try:
        assert ds2.pattern_info() is None      # toggle respected despite cache
        ds3 = make_patterned_dataset(rng)
        assert ds3.pattern_info() is None
    finally:
        config.use_pattern_dedup = True
    assert ds2.pattern_info() is not None
    assert ds3.pattern_info() is not None      # not poisoned by the off probe

    # include_dense: mixture path gets a P=1 table for fully-observed data,
    # single-model path (no flag) does not
    dense = Dataset(rng.normal(size=(32, 4)))
    assert dense.pattern_info() is None
    info = dense.pattern_info(include_dense=True)
    assert info is not None and info[1].shape == (1, 4)


def test_hash_collision_demotes(rng, monkeypatch):
    """A hash collision may group distinct mask rows together; the exact
    count verification must catch it and demote to the general path (never
    silently mis-group).  Simulated by forcing every row to hash equal."""
    import ppca_rs_tpu.dataset as dsm

    ds = make_patterned_dataset(rng)
    n = int(ds.mask.shape[0])
    # _detect looks _row_hashes_jit up at call time, so the patch holds even
    # with warm jit caches.
    monkeypatch.setattr(
        dsm, "_row_hashes_jit", lambda mask: jnp.zeros((n, 2), jnp.int32)
    )
    assert ds.pattern_info() is None
    assert ds._patterns is False  # demoted, not retried


# --------------------------------------------------------------------- #
# parity with the general masked path (f64)


@pytest.mark.parametrize("k", [1, 3])
def test_verbs_match_masked_path(rng, k):
    ds = make_patterned_dataset(rng)
    model = make_model(rng, k=k)
    C, mean, sigma = model._transform, model._mean, model._isotropic_noise
    pidx, pats = ds.pattern_info()
    bs = 32

    ref_llks = ml.llks(C, mean, sigma, ds.data, ds.mask, block_size=bs)
    pat_llks = pd.llks(C, mean, sigma, ds.data, ds.mask, pidx, pats, block_size=bs)
    np.testing.assert_allclose(pat_llks, ref_llks, rtol=1e-10, atol=1e-12)

    ref_states = ml.states(C, mean, sigma, ds.data, ds.mask, block_size=bs)
    pat_states = pd.states(C, mean, sigma, ds.data, ds.mask, pidx, pats, block_size=bs)
    np.testing.assert_allclose(pat_states, ref_states, rtol=1e-9, atol=1e-12)

    ref_s, ref_cov = ml.infer(C, mean, sigma, ds.data, ds.mask, block_size=bs)
    pat_s, pat_cov = pd.infer(C, mean, sigma, ds.data, ds.mask, pidx, pats, block_size=bs)
    np.testing.assert_allclose(pat_s, ref_s, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(pat_cov, ref_cov, rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("group_outer", [True, False])
def test_em_stats_match_masked_path(rng, group_outer):
    if group_outer:
        ds = make_patterned_dataset(rng, n=96, d=9, n_patterns=5)   # P <= D
    else:
        ds = make_patterned_dataset(rng, n=128, d=4, n_patterns=9,
                                    empty_dim=False)                # P > D
    model = make_model(rng, d=ds.output_size(), k=2)
    C, mean, sigma = model._transform, model._mean, model._isotropic_noise
    pidx, pats = ds.pattern_info()
    assert (pats.shape[0] <= ds.output_size()) == group_outer
    bs = 32

    ref = ml.em_stats(C, mean, sigma, ds.data, ds.mask, ds.weights_dev, block_size=bs)
    pat = pd.em_stats(C, mean, sigma, ds.data, ds.mask, pidx, pats, ds.weights_dev,
                      block_size=bs)
    for name in ref._fields:
        np.testing.assert_allclose(
            getattr(pat, name), getattr(ref, name), rtol=1e-9, atol=1e-11,
            err_msg=f"EMStats field {name}",
        )


def test_bf16_storage_keeps_patterns(rng):
    """astype(bfloat16) shares the pattern cache (same mask) and the dedup
    math still runs in compute precision."""
    import jax.numpy as jnp

    ds = make_patterned_dataset(rng)
    info = ds.pattern_info()
    ds16 = ds.astype(jnp.bfloat16)
    assert ds16.pattern_info() is info
    model = make_model(rng)
    llk16 = model.llk(ds16)
    llk = model.llk(ds)
    assert np.isclose(llk16, llk, rtol=2e-2)  # bf16 storage rounding only
    assert model.iterate(ds16).transform.dtype == np.float64


def test_model_dispatch_and_training(rng):
    """End-to-end: the model verbs route through the dedup path for a
    patterned dataset and produce the same numbers as the general path."""
    ds = make_patterned_dataset(rng, n=120)
    model = make_model(rng)
    prior = (
        Prior()
        .with_isotropic_noise_prior(2.0, 2.0)
        .with_transformation_precision(0.2)
        .with_mean_prior(np.zeros(9), 0.5 * np.eye(9))
    )

    assert ds.pattern_info() is not None  # verbs below route through dedup

    llk_pat = model.llk(ds)
    ext_pat = model.extrapolate(ds).numpy()
    new_pat = model.iterate_with_prior(ds, prior)

    config.use_pattern_dedup = False
    try:
        ds2 = Dataset(np.where(np.asarray(ds.mask), np.asarray(ds.data), np.nan),
                      weights=ds.weights_numpy())
        assert ds2.pattern_info() is None
        llk_ref = model.llk(ds2)
        ext_ref = model.extrapolate(ds2).numpy()
        new_ref = model.iterate_with_prior(ds2, prior)
    finally:
        config.use_pattern_dedup = True

    assert np.isclose(llk_pat, llk_ref, rtol=1e-10)
    np.testing.assert_allclose(ext_pat, ext_ref, rtol=1e-9, atol=1e-12, equal_nan=True)
    np.testing.assert_allclose(new_pat.transform, new_ref.transform, rtol=1e-8, atol=1e-11)
    np.testing.assert_allclose(new_pat.mean, new_ref.mean, rtol=1e-8, atol=1e-11)
    assert np.isclose(new_pat.isotropic_noise, new_ref.isotropic_noise, rtol=1e-9)

    # monotone EM through the dedup path
    trained = PPCATrainer(ds).train(state_size=3, n_iters=8, quiet=True)
    assert np.isfinite(trained.llk(ds))
    prev = model.llk(ds)
    cur = model
    for _ in range(5):
        cur = cur.iterate(ds)
        llk = cur.llk(ds)
        assert llk >= prev - 1e-8
        prev = llk


@pytest.mark.parametrize("group_outer", [True, False])
def test_em_stats_s_slab_matches(rng, group_outer):
    """pattern_dedup.em_stats under config.s_slab_stats (tril-wedge outer,
    packed Souter carry, unpack after assembly) == the full path exactly
    where em_finalize reads (tril of S; every other field verbatim), at a
    k unaligned to the slab width."""
    from ppca_rs_tpu.config import config

    if group_outer:
        ds = make_patterned_dataset(rng, n=96, d=24, n_patterns=5)   # P <= D
    else:
        ds = make_patterned_dataset(rng, n=128, d=4, n_patterns=9,
                                    empty_dim=False)                 # P > D
    k = 11
    model = make_model(rng, d=ds.output_size(), k=k)
    C, mean, sigma = model._transform, model._mean, model._isotropic_noise
    pidx, pats = ds.pattern_info()
    bs = 32

    old = config.s_slab_stats
    try:
        config.s_slab_stats = False
        ref = pd.em_stats(C, mean, sigma, ds.data, ds.mask,
                          pidx, pats, ds.weights_dev, block_size=bs)
        config.s_slab_stats = True
        got = pd.em_stats(C, mean, sigma, ds.data, ds.mask,
                          pidx, pats, ds.weights_dev, block_size=bs)
    finally:
        config.s_slab_stats = old

    D = ds.output_size()
    tril = np.tril(np.ones((k, k)))
    S_ref = np.asarray(ref.S, np.float64).reshape(D, k, k) * tril
    S_got = np.asarray(got.S, np.float64).reshape(D, k, k) * tril
    np.testing.assert_allclose(S_got, S_ref, rtol=1e-9, atol=1e-11)
    for name in ref._fields:
        if name == "S":
            continue
        np.testing.assert_allclose(
            getattr(got, name), getattr(ref, name), rtol=1e-9, atol=1e-11,
            err_msg=f"EMStats field {name}",
        )


def test_em_stats_grouped_estep_matches(rng):
    """config.pat_grouped_estep (candidate-matmul states + pattern-grouped
    mask corrections) is an exact reordering of the ungrouped sums: every
    EMStats field and the states/llks verbs match to f64 roundoff, at a
    P * k both below and above the sall candidates bound."""
    ds = make_patterned_dataset(rng, n=128, d=24, n_patterns=6)
    k = 11
    model = make_model(rng, d=ds.output_size(), k=k)
    C, mean, sigma = model._transform, model._mean, model._isotropic_noise
    pidx, pats = ds.pattern_info()
    bs = 32

    old_bound = pd._SALL_MAX_PK
    old = config.pat_grouped_estep
    try:
        config.pat_grouped_estep = False
        ref = pd.em_stats(C, mean, sigma, ds.data, ds.mask,
                          pidx, pats, ds.weights_dev, block_size=bs)
        ref_s = pd.states(C, mean, sigma, ds.data, ds.mask,
                          pidx, pats, block_size=bs)
        ref_l = pd.llks(C, mean, sigma, ds.data, ds.mask,
                        pidx, pats, block_size=bs)
        config.pat_grouped_estep = True
        for bound in (old_bound, 1):   # matmul-sall path / gather fallback
            pd._SALL_MAX_PK = bound
            got = pd.em_stats(C, mean, sigma, ds.data, ds.mask,
                              pidx, pats, ds.weights_dev, block_size=bs)
            got_s = pd.states(C, mean, sigma, ds.data, ds.mask,
                              pidx, pats, block_size=bs)
            got_l = pd.llks(C, mean, sigma, ds.data, ds.mask,
                            pidx, pats, block_size=bs)
            for name in ref._fields:
                np.testing.assert_allclose(
                    getattr(got, name), getattr(ref, name),
                    rtol=1e-9, atol=1e-11, err_msg=f"EMStats field {name}",
                )
            np.testing.assert_allclose(got_s, ref_s, rtol=1e-9, atol=1e-11)
            np.testing.assert_allclose(got_l, ref_l, rtol=1e-9, atol=1e-11)
    finally:
        config.pat_grouped_estep = old
        pd._SALL_MAX_PK = old_bound


def test_em_stats_sorted_matches(rng):
    """em_stats_sorted (the pattern-SORTED segment path) is an exact
    reordering of em_stats' sums: every EMStats field matches to f64
    roundoff, including garbage at masked data positions, a zero-count
    pattern, zero weights and the all-masked pattern."""
    ds = make_patterned_dataset(rng, n=333, d=24, n_patterns=6)
    k = 11
    model = make_model(rng, d=ds.output_size(), k=k)
    C, mean, sigma = model._transform, model._mean, model._isotropic_noise
    pidx, pats = ds.pattern_info()
    P = int(pats.shape[0])
    pidx_h = np.asarray(pidx)

    ref = pd.em_stats(C, mean, sigma, ds.data, ds.mask,
                      pidx, pats, ds.weights_dev, block_size=64)

    perm = np.argsort(pidx_h, kind="stable")
    counts = tuple(int(c) for c in np.bincount(pidx_h, minlength=P))
    # poison the masked entries: the sorted path multiplies by the constant
    # pattern row, so whatever the buffer holds there must be inert
    data = np.asarray(ds.data).copy()
    data[~np.asarray(ds.mask)] = 123.456
    got = pd.em_stats_sorted(C, mean, sigma, jnp.asarray(data)[perm],
                             ds.weights_dev[jnp.asarray(perm)], pats, counts,
                             block_size=64)
    for name in ref._fields:
        np.testing.assert_allclose(
            getattr(got, name), getattr(ref, name), rtol=1e-9, atol=1e-11,
            err_msg=f"EMStats field {name}",
        )


def test_pattern_order_gates_and_em_routing(rng, monkeypatch):
    """Dataset.pattern_order caching + gates, and the end-to-end EM routing:
    with config.pat_sorted_estep on, PPCAModel.iterate on a patterned
    dataset goes through the sorted path and produces the same model as the
    table-grouped path (f64 exact-reordering parity); with_weights twins
    share the sorted cache but use their own weights."""
    from ppca_rs_tpu.ops import pattern_dedup as pdm

    ds = make_patterned_dataset(rng, n=200, d=16, n_patterns=4)
    model = make_model(rng, d=16, k=5)

    # n=200 is below the fragmented-mask gate; this test pins ROUTING
    # parity, so open the gate (the gate itself is asserted at the end)
    monkeypatch.setattr(config, "pat_sorted_min_rows", 0)
    monkeypatch.setattr(config, "pat_sorted_estep", False)
    assert ds.pattern_order() is None          # flag off -> no order
    ref = model.iterate(ds)

    monkeypatch.setattr(config, "pat_sorted_estep", True)
    ds2 = make_patterned_dataset(rng, n=200, d=16, n_patterns=4)
    order = ds2.pattern_order()
    assert order is not None
    data_s, perm, counts = order
    assert sum(counts) == 200 and len(counts) == int(ds2.pattern_info()[1].shape[0])
    assert ds2.pattern_order() is order        # cached
    # with_weights shares the cache (same data)
    wtwin = ds2.with_weights(np.asarray(rng.random(200) + 0.1))
    assert wtwin.pattern_order() is order

    # routing parity: same RNG-dataset as ds (re-seed) => same stats path
    calls = []
    orig = pdm.em_stats_sorted
    monkeypatch.setattr(pdm, "em_stats_sorted",
                        lambda *a, **kw: (calls.append(1), orig(*a, **kw))[1])
    got = model.iterate(ds)
    assert calls, "sorted path did not engage"
    for a, b in zip(
        (got._transform, got._mean, got._isotropic_noise),
        (ref._transform, ref._mean, ref._isotropic_noise),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-11)
    # reweighted twin: shares the sorted cache, weights re-sorted per call
    w2 = np.asarray(rng.random(200) + 0.1)
    monkeypatch.setattr(config, "pat_sorted_estep", False)
    ref2 = model.iterate(ds.with_weights(w2))
    monkeypatch.setattr(config, "pat_sorted_estep", True)
    got2 = model.iterate(ds.with_weights(w2))
    np.testing.assert_allclose(np.asarray(got2._transform),
                               np.asarray(ref2._transform),
                               rtol=1e-9, atol=1e-11)

    # gates: P cap and bytes cap demote (cached False)
    monkeypatch.setattr(config, "pat_sorted_max_p", 1)
    dsp = make_patterned_dataset(rng, n=200, d=16, n_patterns=4)
    assert dsp.pattern_order() is None
    monkeypatch.setattr(config, "pat_sorted_max_p", 256)
    assert dsp.pattern_order() is None         # demotion cached
    monkeypatch.setattr(config, "pat_sorted_max_bytes", 8)
    dsb = make_patterned_dataset(rng, n=200, d=16, n_patterns=4)
    assert dsb.pattern_order() is None
    # fragmented-mask gate: avg segment size below pat_sorted_min_rows
    # demotes to the grouped path (tiny segments bloat the unrolled
    # program — the round-5 XLA:CPU segfault class)
    monkeypatch.setattr(config, "pat_sorted_max_bytes", 4 << 30)
    monkeypatch.setattr(config, "pat_sorted_min_rows", 512)
    dsm = make_patterned_dataset(rng, n=200, d=16, n_patterns=4)
    assert dsm.pattern_order() is None         # 200 < 4 * 512
    assert dsm.pattern_info() is not None      # dedup tables still engage
