"""The copy-free blocked scan (masked_linalg._scan_blocks): when block_size
doesn't divide N, the FINAL window re-reads the last `block` rows and marks
the overlap stale (`fresh` mask) — reductions must neutralize stale rows
(zero weight + zero mask, the padding-row invariant) and per-row outputs
must drop them at assembly.  These tests pin the multi-window unaligned
path against the single-window path (n <= block, plain pad) for every
blocked verb family."""

import numpy as np
import jax.numpy as jnp
import pytest

from ppca_rs_tpu.ops import masked_linalg as ml
from ppca_rs_tpu.ops import dense_fast as df
from ppca_rs_tpu.ops import mix_fused as mf


@pytest.fixture
def rng():
    return np.random.default_rng(42)


# n = 300 with block 128 -> 3 windows, the last re-reading 84 stale rows;
# block 512 -> one window (the reference path).
N, UNALIGNED, ALIGNED = 300, 128, 512


def _masked_inputs(rng, D=24, k=5):
    C = jnp.asarray(rng.normal(size=(D, k)))
    mean = jnp.asarray(rng.normal(size=D))
    sig = jnp.asarray(0.8)
    data = jnp.asarray(rng.normal(size=(N, D)))
    mask = jnp.asarray(rng.random((N, D)) > 0.4)
    mask = mask.at[N - 1].set(False)          # all-masked row INSIDE the overlap
    data = jnp.where(mask, data, 0.0)
    w = jnp.asarray(rng.random(N) + 0.5)
    w = w.at[N - 2].set(0.0)                  # zero-weight row in the overlap
    return C, mean, sig, data, mask, w


def test_masked_verbs_unaligned_blocks(rng):
    C, mean, sig, data, mask, w = _masked_inputs(rng)
    for fn, args in [
        (ml.llks, (C, mean, sig, data, mask)),
        (ml.states, (C, mean, sig, data, mask)),
    ]:
        ref = fn(*args, block_size=ALIGNED)
        got = fn(*args, block_size=UNALIGNED)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-12)
    ref_s, ref_cov = ml.infer(C, mean, sig, data, mask, block_size=ALIGNED)
    got_s, got_cov = ml.infer(C, mean, sig, data, mask, block_size=UNALIGNED)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref_s), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(got_cov), np.asarray(ref_cov), rtol=1e-12)

    ref = ml.em_stats(C, mean, sig, data, mask, w, block_size=ALIGNED)
    got = ml.em_stats(C, mean, sig, data, mask, w, block_size=UNALIGNED)
    for name, a, b in zip(ref._fields, got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-9,
                                   err_msg=name)


def test_dense_stats_unaligned_blocks(rng):
    D, k = 24, 5
    C = jnp.asarray(rng.normal(size=(D, k)))
    mean = jnp.asarray(rng.normal(size=D))
    sig = jnp.asarray(0.8)
    data = jnp.asarray(rng.normal(size=(N, D)))
    w = jnp.asarray(rng.random(N) + 0.5)
    ref = df.em_stats(C, mean, sig, data, w, block_size=ALIGNED)
    got = df.em_stats(C, mean, sig, data, w, block_size=UNALIGNED)
    for name, a, b in zip(ref._fields, got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-9,
                                   err_msg=name)


def test_mix_verbs_unaligned_blocks(rng):
    M, D, k = 3, 16, 4
    Cs = jnp.asarray(rng.normal(size=(M, D, k)))
    means = jnp.asarray(rng.normal(size=(M, D)))
    sigmas = jnp.asarray(rng.random(M) + 0.5)
    lw = jnp.log(jnp.full((M,), 1.0 / M))
    data = jnp.asarray(rng.normal(size=(N, D)))
    mask = jnp.asarray(rng.random((N, D)) > 0.3)
    mask = mask.at[N - 1].set(False)
    data = jnp.where(mask, data, 0.0)
    w = jnp.asarray(rng.random(N) + 0.5)

    ref = mf.mix_em_stats(Cs, means, sigmas, lw, data, mask, w, block_size=ALIGNED)
    got = mf.mix_em_stats(Cs, means, sigmas, lw, data, mask, w, block_size=UNALIGNED)
    for name, a, b in zip(ref._fields, got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-9,
                                   err_msg=name)

    ref_llks = mf.mix_llks(Cs, means, sigmas, data, mask, block_size=ALIGNED)
    got_llks = mf.mix_llks(Cs, means, sigmas, data, mask, block_size=UNALIGNED)
    np.testing.assert_allclose(np.asarray(got_llks), np.asarray(ref_llks), rtol=1e-12)

    args = (Cs, means, sigmas, lw, data, mask)
    ref_lp, ref_s, ref_cov = mf.mix_infer(*args, block_size=ALIGNED)
    got_lp, got_s, got_cov = mf.mix_infer(*args, block_size=UNALIGNED)
    np.testing.assert_allclose(np.asarray(got_lp), np.asarray(ref_lp), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref_s), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(got_cov), np.asarray(ref_cov), rtol=1e-9)
    ref_sm = mf.mix_smooth(*args, block_size=ALIGNED)
    got_sm = mf.mix_smooth(*args, block_size=UNALIGNED)
    np.testing.assert_allclose(np.asarray(got_sm), np.asarray(ref_sm), rtol=1e-9)


def test_pattern_stats_unaligned_blocks(rng):
    from ppca_rs_tpu.ops import pattern_dedup as pdd

    P, D, k = 4, 20, 4
    pats = jnp.asarray(rng.random((P, D)) > 0.3)
    pidx = jnp.asarray(rng.integers(0, P, size=N), jnp.int32)
    mask = pats[pidx]
    data = jnp.where(mask, jnp.asarray(rng.normal(size=(N, D))), 0.0)
    w = jnp.asarray(rng.random(N) + 0.5)
    C = jnp.asarray(rng.normal(size=(D, k)))
    mean = jnp.asarray(rng.normal(size=D))
    sig = jnp.asarray(0.8)

    ref = pdd.em_stats(C, mean, sig, data, mask, pidx, pats, w, block_size=ALIGNED)
    got = pdd.em_stats(C, mean, sig, data, mask, pidx, pats, w, block_size=UNALIGNED)
    for name, a, b in zip(ref._fields, got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-9,
                                   err_msg=name)
