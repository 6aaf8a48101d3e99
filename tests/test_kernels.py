"""Pallas fused SPD E-step kernel vs the XLA reference path.

Runs in interpreter mode so CI (CPU) validates the exact kernel code that
executes on TPU.  Covers full/partial/empty masks, k not a multiple of 8,
and the neutrality of padding rows.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ppca_rs_tpu.ops import kernels
from ppca_rs_tpu.ops import masked_linalg as ml


def run_both(rng, B, D, k, sigma=0.7, empty_rows=(3,)):
    C = jnp.asarray(rng.normal(size=(D, k)), jnp.float32)
    mean = jnp.asarray(rng.normal(size=D), jnp.float32)
    sig = jnp.float32(sigma)
    data = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    mask = jnp.asarray(rng.random((B, D)) > 0.4)
    for r in empty_rows:
        mask = mask.at[r].set(False)
    data = jnp.where(mask, data, 0.0)
    mf = mask.astype(jnp.float32)

    CC = ml.outer_flat(C)
    post = ml.block_posterior(C, CC, mean, sig, data, mf)
    Sigma = ml.block_covariances(post, sig)
    want = {
        "states": np.asarray(post.states),
        "SM": np.asarray(post.states[:, :, None] * post.states[:, None, :] + Sigma),
        "llk": np.asarray(ml.block_llk(post, sig, k)),
        "sq": np.asarray(jnp.sum(post.G_local.reshape(B, k, k) * Sigma, axis=(1, 2))),
    }

    G3 = jnp.transpose(post.G_local.reshape(B, k, k), (1, 2, 0))
    b_t = post.b.T
    rnorm = jnp.sum(post.R * post.R, axis=-1)[None, :]
    dob = jnp.sum(mf, axis=-1)[None, :]
    s_t, SM3, llk, sq = kernels.spd_estep(sig, G3, b_t, rnorm, dob, interpret=True)
    got = {
        "states": np.asarray(s_t).T,
        "SM": np.asarray(jnp.transpose(SM3, (2, 0, 1))),
        "llk": np.asarray(llk)[0],
        "sq": np.asarray(sq)[0],
    }
    return want, got


@pytest.mark.parametrize("k", [2, 8, 13, 32, 80])
def test_kernel_matches_xla(rng, k):
    want, got = run_both(rng, B=128, D=24, k=k)
    np.testing.assert_allclose(got["states"], want["states"], rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(got["SM"], want["SM"], rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(got["llk"], want["llk"], rtol=3e-4, atol=3e-3)
    np.testing.assert_allclose(got["sq"], want["sq"], rtol=3e-3, atol=3e-3)


def test_kernel_empty_sample_neutral(rng):
    """All-masked rows: zero llk, zero states, SM = identity (the
    ``uninferred`` posterior with Sigma = I)."""
    want, got = run_both(rng, B=128, D=16, k=4, empty_rows=(0, 5, 127))
    for r in (0, 5, 127):
        assert abs(got["llk"][r]) < 1e-5
        np.testing.assert_allclose(got["states"][r], 0.0, atol=1e-6)
        np.testing.assert_allclose(got["SM"][r], np.eye(4), rtol=1e-5, atol=1e-6)
        assert abs(got["sq"][r]) < 1e-6


@pytest.mark.parametrize("k", [4, 16])
def test_kernel_light_variants(rng, k):
    """The 'llk' and 'states' variants agree with the full kernel."""
    C = jnp.asarray(rng.normal(size=(20, k)), jnp.float32)
    mean = jnp.asarray(rng.normal(size=20), jnp.float32)
    sig = jnp.float32(0.6)
    data = jnp.asarray(rng.normal(size=(128, 20)), jnp.float32)
    mask = jnp.asarray(rng.random((128, 20)) > 0.4)
    mask = mask.at[7].set(False)
    data = jnp.where(mask, data, 0.0)
    mf = mask.astype(jnp.float32)

    CC = ml.outer_flat(C)
    post = ml.block_posterior(C, CC, mean, sig, data, mf)
    G3 = jnp.transpose(post.G_local.reshape(128, k, k), (1, 2, 0))
    b_t = post.b.T
    rnorm = jnp.sum(post.R * post.R, axis=-1)[None, :]
    dob = jnp.sum(mf, axis=-1)[None, :]

    s_full, _, llk_full, _ = kernels.spd_estep(sig, G3, b_t, rnorm, dob, interpret=True)
    (llk_only,) = kernels.spd_estep(sig, G3, b_t, rnorm, dob, want="llk", interpret=True)
    s_states, llk_states = kernels.spd_estep(
        sig, G3, b_t, rnorm, dob, want="states", interpret=True
    )
    np.testing.assert_allclose(np.asarray(llk_only), np.asarray(llk_full), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(llk_states), np.asarray(llk_full), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(s_states), np.asarray(s_full), rtol=1e-4, atol=1e-5)


def test_kernel_per_lane_sigma(rng):
    """Per-lane sigma (the fused-mixture path: lanes from different
    components carry different noise levels) matches per-sigma scalar calls."""
    B, D, k = 128, 16, 4
    C = jnp.asarray(rng.normal(size=(D, k)), jnp.float32)
    mean = jnp.zeros(D, jnp.float32)
    data = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    mask = jnp.asarray(rng.random((B, D)) > 0.3)
    data = jnp.where(mask, data, 0.0)
    mf = mask.astype(jnp.float32)
    CC = ml.outer_flat(C)

    sigmas = np.where(np.arange(B) < B // 2, 0.4, 1.3).astype(np.float32)
    post_a = ml.block_posterior(C, CC, mean, jnp.float32(0.4), data, mf)
    post_b = ml.block_posterior(C, CC, mean, jnp.float32(1.3), data, mf)
    G3 = jnp.transpose(post_a.G_local.reshape(B, k, k), (1, 2, 0))
    rnorm = jnp.sum(post_a.R * post_a.R, axis=-1)[None, :]
    dob = jnp.sum(mf, axis=-1)[None, :]

    s_t, SM3, llk, sq = kernels.spd_estep(
        jnp.asarray(sigmas)[None, :], G3, post_a.b.T, rnorm, dob, interpret=True
    )
    want_states = np.where(
        (np.arange(B) < B // 2)[:, None],
        np.asarray(post_a.states),
        np.asarray(post_b.states),
    )
    np.testing.assert_allclose(np.asarray(s_t).T, want_states, rtol=3e-4, atol=1e-5)
    want_llk = np.where(
        np.arange(B) < B // 2,
        np.asarray(ml.block_llk(post_a, jnp.float32(0.4), k)),
        np.asarray(ml.block_llk(post_b, jnp.float32(1.3), k)),
    )
    np.testing.assert_allclose(np.asarray(llk)[0], want_llk, rtol=3e-4, atol=3e-3)


@pytest.mark.parametrize("k", [4, 16])
def test_kernel_infer_variant(rng, k):
    """want="infer" returns Sigma = sigma^2 M^{-1} directly — exactly the XLA
    covariance, with no SM - s s^T cancellation."""
    B, D = 128, 24
    C = jnp.asarray(rng.normal(size=(D, k)), jnp.float32)
    mean = jnp.asarray(rng.normal(size=D), jnp.float32)
    sig = jnp.float32(0.7)
    data = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    mask = jnp.asarray(rng.random((B, D)) > 0.4)
    data = jnp.where(mask, data, 0.0)
    mf = mask.astype(jnp.float32)
    CC = ml.outer_flat(C)
    post = ml.block_posterior(C, CC, mean, sig, data, mf)
    Sigma_ref = ml.block_covariances(post, sig)
    llk_ref = ml.block_llk(post, sig, k)

    G3 = jnp.transpose(post.G_local.reshape(B, k, k), (1, 2, 0))
    rnorm = jnp.sum(post.R * post.R, axis=-1)[None, :]
    dob = jnp.sum(mf, axis=-1)[None, :]
    s_t, Sig3, llk, sq = kernels.spd_estep(
        sig, G3, post.b.T, rnorm, dob, want="infer", interpret=True
    )
    np.testing.assert_allclose(np.asarray(s_t).T, post.states, rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(Sig3, (2, 0, 1))), Sigma_ref, rtol=3e-4, atol=3e-6
    )
    np.testing.assert_allclose(np.asarray(llk)[0], llk_ref, rtol=3e-4, atol=3e-3)
    # covariances must be symmetric PSD as computed (cholesky succeeds)
    chol = jnp.linalg.cholesky(jnp.transpose(Sig3, (2, 0, 1)))
    assert bool(jnp.all(jnp.isfinite(chol)))


@pytest.mark.parametrize("k", [8, 13, 32])
def test_kernel_fullt_lower_wedge(rng, k):
    """want="fullt" matches "full" bit-for-bit on states/llk/sq and on the
    lower triangle of SM (its upper triangle is declared garbage)."""
    C = jnp.asarray(rng.normal(size=(24, k)), jnp.float32)
    mean = jnp.asarray(rng.normal(size=24), jnp.float32)
    sig = jnp.float32(0.7)
    data = jnp.asarray(rng.normal(size=(128, 24)), jnp.float32)
    mask = jnp.asarray(rng.random((128, 24)) > 0.4)
    data = jnp.where(mask, data, 0.0)
    mf = mask.astype(jnp.float32)
    CC = ml.outer_flat(C)
    post = ml.block_posterior(C, CC, mean, sig, data, mf)
    G3 = jnp.transpose(post.G_local.reshape(128, k, k), (1, 2, 0))
    rnorm = jnp.sum(post.R * post.R, axis=-1)[None, :]
    dob = jnp.sum(mf, axis=-1)[None, :]
    args = (sig, G3, post.b.T, rnorm, dob)
    sf, SMf, lf, qf = kernels.spd_estep(*args, want="full", interpret=True)
    st, SMt, lt, qt = kernels.spd_estep(*args, want="fullt", interpret=True)
    np.testing.assert_array_equal(np.asarray(sf), np.asarray(st))
    np.testing.assert_array_equal(np.asarray(lf), np.asarray(lt))
    np.testing.assert_array_equal(np.asarray(qf), np.asarray(qt))
    tril = np.tril(np.ones((k, k), np.float32))[:, :, None]
    np.testing.assert_array_equal(np.asarray(SMf) * tril, np.asarray(SMt) * tril)


@pytest.mark.parametrize("k,B", [(4, 128), (13, 100), (32, 256)])
def test_spd_chol_matches_numpy(rng, k, B):
    """spd_chol == np.linalg.cholesky, incl. k- and B-padding paths."""
    V = jnp.asarray(rng.normal(size=(B, k, 2 * k)), jnp.float32) / np.sqrt(2 * k)
    M = jnp.einsum("bij,bkj->bik", V, V) + 0.1 * jnp.eye(k, dtype=jnp.float32)
    L3 = kernels.spd_chol(jnp.transpose(M, (1, 2, 0)), interpret=True)
    got = np.transpose(np.asarray(L3), (2, 0, 1))
    want = np.linalg.cholesky(np.asarray(M, np.float64))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
    # strictly lower-triangular output
    assert np.allclose(got * (1 - np.tri(k)), 0.0, atol=1e-7)


def test_kernel_batch_alignment():
    with pytest.raises(ValueError):
        kernels.spd_estep(
            jnp.float32(1.0),
            jnp.zeros((4, 4, 100), jnp.float32),
            jnp.zeros((4, 100), jnp.float32),
            jnp.zeros((1, 100), jnp.float32),
            jnp.zeros((1, 100), jnp.float32),
            interpret=True,
        )


def test_supported_gate():
    assert kernels.supported(64, 8192, jnp.float32)
    assert kernels.supported(100, 8192, jnp.float32)   # k>72 ceiling lifted
    assert kernels.supported(128, 8192, jnp.float32)
    assert kernels.supported(kernels.MAX_K, 8192, jnp.float32)
    # round 3: the lean configuration extends past the comfortable ceiling
    assert kernels.supported(256, 8192, jnp.float32)
    assert not kernels.supported(kernels.max_k("full") + 8, 8192, jnp.float32)
    assert kernels.supported(kernels.max_k("states"), 8192, jnp.float32, "states")
    assert kernels.supported(440, 8192, jnp.float32, "llk")
    assert not kernels.supported(kernels.max_k("llk") + 8, 8192, jnp.float32, "llk")
    # lighter variants reach higher k (fewer big VMEM buffers)
    assert kernels.max_k("llk") > kernels.max_k("states") > kernels.max_k("full")
    assert not kernels.supported(0, 8192, jnp.float32)
    assert not kernels.supported(64, 100, jnp.float32)
    assert not kernels.supported(64, 8192, jnp.float64)


def _force_lean(monkeypatch, want, k, T=128):
    """Shrink the VMEM budget so (want, k) picks the lean configuration."""
    temps = 24 * (k + 4) * T * 4
    comfort = kernels._N_COMFORT.get(want, 5) * k * k * T * 4 + temps
    lean = kernels._N_LEAN.get(want, 3) * k * k * T * 4 + temps
    assert lean < comfort
    monkeypatch.setattr(kernels, "VMEM_BUDGET", (comfort + lean) // 2)
    kernels.spd_estep.clear_cache()
    kernels.spd_chol.clear_cache()


@pytest.mark.parametrize("want", ["llk", "states", "full", "fullt", "infer"])
def test_kernel_lean_config_matches(rng, monkeypatch, want):
    """The lean big-k configuration (single-buffered A; SM staged through a
    VMEM scratch and DMA'd manually) == the comfortable configuration,
    forced at small k via a shrunken VMEM budget so interpret mode stays
    fast.  Two lane tiles exercise the per-tile manual output DMA."""
    B, D, k = 256, 24, 16
    C = jnp.asarray(rng.normal(size=(D, k)), jnp.float32)
    mean = jnp.asarray(rng.normal(size=D), jnp.float32)
    sig = jnp.float32(0.7)
    data = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    mask = jnp.asarray(rng.random((B, D)) > 0.4)
    data = jnp.where(mask, data, 0.0)
    mf = mask.astype(jnp.float32)
    CC = ml.outer_flat(C)
    post = ml.block_posterior(C, CC, mean, sig, data, mf)
    G3 = jnp.transpose(post.G_local.reshape(B, k, k), (1, 2, 0))
    rnorm = jnp.sum(post.R * post.R, axis=-1)[None, :]
    dob = jnp.sum(mf, axis=-1)[None, :]
    args = (sig, G3, post.b.T, rnorm, dob)

    ref = kernels.spd_estep(*args, want=want, interpret=True)
    _force_lean(monkeypatch, want, k)
    cfg = kernels._kernel_config(want, k, kernels.LANE)
    assert cfg[0], "budget shrink must force the lean config"
    got = kernels.spd_estep(*args, want=want, interpret=True)
    for g, r in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))
    kernels.spd_estep.clear_cache()


def test_spd_chol_lean_config_matches(rng, monkeypatch):
    k, B = 16, 300
    V = jnp.asarray(rng.normal(size=(B, k, 2 * k)) / np.sqrt(2 * k), jnp.float32)
    M = jnp.einsum("bij,bkj->bik", V, V) + 0.1 * jnp.eye(k, dtype=jnp.float32)
    M3 = jnp.transpose(M, (1, 2, 0))
    ref = kernels.spd_chol(M3, interpret=True)
    _force_lean(monkeypatch, "chol", k)
    assert kernels._kernel_config("chol", k, kernels.LANE)[1]
    got = kernels.spd_chol(M3, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    kernels.spd_chol.clear_cache()


@pytest.mark.parametrize("k,B", [(13, 100), (13, 128), (16, 256), (5, 31)])
@pytest.mark.parametrize("lam", [0.0, 0.3])
def test_kernel_rows_solve(rng, k, B, lam):
    """The kernel-routed M-step row solve ((S + lam I) c = cross) matches
    jnp.linalg.solve for any (B, k), INCLUDING k % 8 != 0 with lam = 0 (the
    Prior default) — regression test for the padded-diagonal rsqrt(0) NaN
    that silently froze the transform on TPU."""
    V = jnp.asarray(rng.normal(size=(B, k, 2 * k)) / np.sqrt(2 * k), jnp.float32)
    S = jnp.einsum("bij,bkj->bik", V, V) + 0.05 * jnp.eye(k, dtype=jnp.float32)
    cross = jnp.asarray(rng.normal(size=(B, k)), jnp.float32)
    got = ml._kernel_rows_solve(S, cross, lam, interpret=True)
    A = np.asarray(S, np.float64) + lam * np.eye(k)
    want = np.linalg.solve(A, np.asarray(cross, np.float64)[..., None])[..., 0]
    assert np.all(np.isfinite(np.asarray(got)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4, atol=5e-5)


def test_em_finalize_kernel_solve_k_not_multiple_of_8(rng, monkeypatch):
    """em_finalize's kernel-routed solve == the XLA solve at k % 8 != 0 with
    transformation_precision = 0 (must NOT take the keep-old-row fallback)."""
    import functools

    D, k = 100, 13
    C_old = jnp.asarray(rng.normal(size=(D, k)), jnp.float32)
    mean = jnp.asarray(rng.normal(size=D), jnp.float32)
    sig = jnp.float32(0.7)
    V = jnp.asarray(rng.normal(size=(D, k, 2 * k)) / np.sqrt(2 * k), jnp.float32)
    S = jnp.einsum("dij,dkj->dik", V, V) + 0.05 * jnp.eye(k, dtype=jnp.float32)
    stats = ml.EMStats(
        cross=jnp.asarray(rng.normal(size=(D, k)), jnp.float32),
        S=S.reshape(D, k * k),
        square_error=jnp.float32(1.0),
        dev_sq=jnp.float32(1.0),
        total_dev=jnp.zeros(D, jnp.float32),
        totals=jnp.full(D, 7.0, jnp.float32),
        llk=jnp.float32(0.0),
    )
    ref_C, ref_mean, ref_sig = ml.em_finalize(
        C_old, mean, sig, stats, transformation_precision=0.0
    )
    monkeypatch.setattr(ml, "_use_kernel", lambda *a: True)
    monkeypatch.setattr(
        kernels, "spd_estep", functools.partial(kernels.spd_estep, interpret=True)
    )
    got_C, got_mean, got_sig = ml.em_finalize(
        C_old, mean, sig, stats, transformation_precision=0.0
    )
    # the solve must have produced finite NEW rows, not the old-C fallback
    assert float(jnp.max(jnp.abs(got_C - C_old))) > 1e-3
    np.testing.assert_allclose(np.asarray(got_C), np.asarray(ref_C),
                               rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(got_mean), np.asarray(ref_mean),
                               rtol=1e-5, atol=1e-6)


def test_mix_em_finalize_kernel_solve_k_not_multiple_of_8(rng, monkeypatch):
    """Twin regression for mix_em_finalize's flattened kernel solve."""
    import functools

    from ppca_rs_tpu.ops import mix_fused as mf

    M, D, k = 3, 20, 13
    Cs_old = jnp.asarray(rng.normal(size=(M, D, k)), jnp.float32)
    means = jnp.asarray(rng.normal(size=(M, D)), jnp.float32)
    sigs = jnp.full((M,), 0.7, jnp.float32)
    V = jnp.asarray(rng.normal(size=(M, D, k, 2 * k)) / np.sqrt(2 * k), jnp.float32)
    S = jnp.einsum("mdij,mdkj->mdik", V, V) + 0.05 * jnp.eye(k, dtype=jnp.float32)
    stats = mf.MixEMStats(
        cross=jnp.asarray(rng.normal(size=(M, D, k)), jnp.float32),
        S=S.reshape(M, D, k * k),
        square_error=jnp.ones(M, jnp.float32),
        dev_sq=jnp.ones(M, jnp.float32),
        total_dev=jnp.zeros((M, D), jnp.float32),
        totals=jnp.full((M, D), 7.0, jnp.float32),
        resp_sum=jnp.ones(M, jnp.float32),
        resp_max=jnp.full(M, 0.9, jnp.float32),
        llk=jnp.float32(0.0),
    )
    ref = mf.mix_em_finalize(Cs_old, means, sigs, stats,
                             transformation_precision=0.0)
    monkeypatch.setattr(ml, "_use_kernel", lambda *a: True)
    monkeypatch.setattr(
        kernels, "spd_estep", functools.partial(kernels.spd_estep, interpret=True)
    )
    got = mf.mix_em_finalize(Cs_old, means, sigs, stats,
                             transformation_precision=0.0)
    assert float(jnp.max(jnp.abs(got[0] - Cs_old))) > 1e-3
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               rtol=5e-4, atol=5e-5)


def test_kernel_routed_em_stats_matches_xla(rng, monkeypatch):
    """The kernel-routed em_stats body (lane-major statistics, the
    no-residual dev_sq/total_dev identities) == the XLA fallback body,
    end to end, in interpret mode."""
    import functools

    B, D, k = 256, 128, 16
    C = jnp.asarray(rng.normal(size=(D, k)), jnp.float32)
    mean = jnp.asarray(rng.normal(size=D), jnp.float32)
    sig = jnp.float32(0.7)
    data = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    mask = jnp.asarray(rng.random((B, D)) > 0.4)
    mask = mask.at[3].set(False)                      # all-masked row
    data = jnp.where(mask, data, 0.0)
    w = jnp.asarray(rng.random(B) + 0.5, jnp.float32)
    w = w.at[7].set(0.0)                              # zero-weight row

    ref = ml.em_stats(C, mean, sig, data, mask, w, block_size=128)

    monkeypatch.setattr(ml, "_use_kernel", lambda *a: True)
    monkeypatch.setattr(
        kernels, "spd_estep", functools.partial(kernels.spd_estep, interpret=True)
    )
    got = ml.em_stats(C, mean, sig, data, mask, w, block_size=128)

    def rel(a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        return np.abs(a - b).max() / (np.abs(b).max() + 1e-12)

    assert rel(got.cross, ref.cross) < 1e-4
    # S from the kernel path only fills the lower wedge of each (k, k)
    # block (want="fullt"); compare after the em_finalize symmetrization.
    tril = np.tril(np.ones((k, k)))
    S_got = np.asarray(got.S, np.float64).reshape(D, k, k) * tril
    S_got = S_got + np.triu(np.swapaxes(S_got, -1, -2), 1)
    assert rel(S_got, np.asarray(ref.S, np.float64).reshape(D, k, k)) < 1e-4
    assert rel(got.square_error, ref.square_error) < 1e-4
    assert rel(got.dev_sq, ref.dev_sq) < 1e-3
    assert rel(got.total_dev, ref.total_dev) < 1e-3
    assert rel(got.totals, ref.totals) < 1e-6
    assert rel(got.llk, ref.llk) < 1e-5


def test_kernel_em_stats_s_slab_matches(rng, monkeypatch):
    """The slab-packed S contraction (config.s_slab_stats: contract only the
    valid block-wedge of the fullt SM, unpack after the scan) == the full
    contraction, exactly where tril reads, for k below/at/above one slab and
    k not a multiple of the slab width."""
    import functools

    from ppca_rs_tpu.config import config

    monkeypatch.setattr(
        kernels, "spd_estep", functools.partial(kernels.spd_estep, interpret=True)
    )
    monkeypatch.setattr(ml, "_use_kernel", lambda *a: True)
    for k in (8, 16, 24, 37, 48):
        B, D = 256, 64
        C = jnp.asarray(rng.normal(size=(D, k)), jnp.float32)
        mean = jnp.asarray(rng.normal(size=D), jnp.float32)
        sig = jnp.float32(0.8)
        data = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
        mask = jnp.asarray(rng.random((B, D)) > 0.4)
        mask = mask.at[1].set(False)
        data = jnp.where(mask, data, 0.0)
        w = jnp.asarray(rng.random(B) + 0.5, jnp.float32)

        monkeypatch.setattr(config, "s_slab_stats", False)
        ref = ml.em_stats(C, mean, sig, data, mask, w, block_size=128)
        monkeypatch.setattr(config, "s_slab_stats", True)
        got = ml.em_stats(C, mean, sig, data, mask, w, block_size=128)

        tril = np.tril(np.ones((k, k)))
        S_ref = np.asarray(ref.S, np.float64).reshape(D, k, k) * tril
        S_got = np.asarray(got.S, np.float64).reshape(D, k, k) * tril
        np.testing.assert_allclose(S_got, S_ref, rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got.cross), np.asarray(ref.cross),
                                   rtol=1e-6)
        np.testing.assert_allclose(float(got.llk), float(ref.llk), rtol=1e-6)


def test_kernel_g_slab_inputs_match(rng):
    """spd_estep fed the Gram as wedge SLABS (kernels.g_slabs) == fed the
    full (k, k, B) Gram, for every want variant, at k aligned and
    unaligned to the slab width.  The dead lower wedge is never shipped;
    in-kernel reads must mask it away entirely."""
    for k in (24, 64):
        B, D = 256, 96
        C = jnp.asarray(rng.normal(size=(D, k)), jnp.float32)
        data = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
        mask = jnp.asarray(rng.random((B, D)) > 0.4, jnp.float32)
        mask = mask.at[2].set(0.0)
        R = mask * data
        sig = jnp.float32(0.8)
        b_t = (R @ C).T
        CC3 = (C[:, :, None] * C[:, None, :])
        G3 = jnp.einsum("dij,bd->ijb", CC3, mask)
        slabs = tuple(
            jnp.einsum("dij,bd->ijb", CC3[:, r0:r1, r0:], mask)
            for r0, r1 in kernels.g_slabs(k)
        )
        rnorm = jnp.sum(R * R, axis=-1)[None, :]
        dob = jnp.sum(mask, axis=-1)[None, :]
        for want, n_out in (("llk", 1), ("states", 2), ("fullt", 4), ("infer", 4)):
            ref = kernels.spd_estep(sig, G3, b_t, rnorm, dob, want=want,
                                    interpret=True)
            got = kernels.spd_estep(sig, slabs, b_t, rnorm, dob, want=want,
                                    interpret=True)
            assert len(ref) == len(got) == n_out
            for i, (a, b) in enumerate(zip(got, ref)):
                if want == "fullt" and i == 1:
                    # SM upper wedge is garbage by contract: compare tril
                    tril = np.tril(np.ones((k, k)))[:, :, None]
                    a = np.asarray(a) * tril
                    b = np.asarray(b) * tril
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6,
                    err_msg=f"want={want} out={i} k={k}")


def test_kernel_em_stats_g_slab_matches(rng, monkeypatch):
    """config.g_slab_inputs end-to-end through em_stats (+ combined with
    s_slab_stats) == the full-Gram path."""
    import functools

    from ppca_rs_tpu.config import config

    monkeypatch.setattr(
        kernels, "spd_estep", functools.partial(kernels.spd_estep, interpret=True)
    )
    monkeypatch.setattr(ml, "_use_kernel", lambda *a: True)
    B, D, k = 256, 64, 24
    C = jnp.asarray(rng.normal(size=(D, k)), jnp.float32)
    mean = jnp.asarray(rng.normal(size=D), jnp.float32)
    sig = jnp.float32(0.8)
    data = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    mask = jnp.asarray(rng.random((B, D)) > 0.4)
    data = jnp.where(mask, data, 0.0)
    w = jnp.asarray(rng.random(B) + 0.5, jnp.float32)

    ref = ml.em_stats(C, mean, sig, data, mask, w, block_size=128)
    monkeypatch.setattr(config, "g_slab_inputs", True)
    got = ml.em_stats(C, mean, sig, data, mask, w, block_size=128)
    monkeypatch.setattr(config, "s_slab_stats", True)
    got2 = ml.em_stats(C, mean, sig, data, mask, w, block_size=128)

    tril = np.tril(np.ones((k, k)))
    for g in (got, got2):
        S_ref = np.asarray(ref.S, np.float64).reshape(D, k, k) * tril
        S_g = np.asarray(g.S, np.float64).reshape(D, k, k) * tril
        np.testing.assert_allclose(S_g, S_ref, rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(g.cross), np.asarray(ref.cross),
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(float(g.llk), float(ref.llk), rtol=1e-6)


def test_mix_em_stats_slab_flags_match(rng, monkeypatch):
    """The fused-mixture twins of the slab flags: g_slab_inputs ships the
    M*B-lane Gram as kernels.g_slabs wedges; s_slab_stats carries S packed
    (ml._sm_slabs) through the scan and unpacks after.  Both must equal the
    full path exactly where mix_em_finalize reads (tril of S; everything
    else verbatim).  k=16 exercises s_slab with g_slab self-gated off."""
    import functools

    from ppca_rs_tpu.config import config
    from ppca_rs_tpu.ops import mix_fused as mf

    monkeypatch.setattr(
        kernels, "spd_estep", functools.partial(kernels.spd_estep, interpret=True)
    )
    monkeypatch.setattr(ml, "_use_kernel", lambda *a: True)
    for k in (16, 24):
        M, B, D = 3, 192, 48
        Cs = jnp.asarray(rng.normal(size=(M, D, k)), jnp.float32)
        means = jnp.asarray(rng.normal(size=(M, D)), jnp.float32)
        sigs = jnp.asarray(rng.random(M) + 0.5, jnp.float32)
        lw = jnp.log(jnp.full((M,), 1.0 / M, jnp.float32))
        data = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
        mask = jnp.asarray(rng.random((B, D)) > 0.4)
        mask = mask.at[1].set(False)
        data = jnp.where(mask, data, 0.0)
        w = jnp.asarray(rng.random(B) + 0.5, jnp.float32)

        def stats():
            return mf.mix_em_stats(Cs, means, sigs, lw, data, mask, w,
                                   block_size=128)

        monkeypatch.setattr(config, "g_slab_inputs", False)
        monkeypatch.setattr(config, "s_slab_stats", False)
        ref = stats()
        monkeypatch.setattr(config, "g_slab_inputs", True)
        got_g = stats()
        monkeypatch.setattr(config, "s_slab_stats", True)
        got_gs = stats()
        monkeypatch.setattr(config, "g_slab_inputs", False)
        got_s = stats()

        tril = np.tril(np.ones((k, k)))
        S_ref = np.asarray(ref.S, np.float64).reshape(M, D, k, k) * tril
        for got in (got_g, got_gs, got_s):
            S_got = np.asarray(got.S, np.float64).reshape(M, D, k, k) * tril
            np.testing.assert_allclose(S_got, S_ref, rtol=1e-6, atol=1e-6)
            np.testing.assert_allclose(np.asarray(got.cross),
                                       np.asarray(ref.cross),
                                       rtol=1e-6, atol=1e-7)
            np.testing.assert_allclose(float(got.llk), float(ref.llk),
                                       rtol=1e-6)
            np.testing.assert_allclose(np.asarray(got.square_error),
                                       np.asarray(ref.square_error),
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(np.asarray(got.dev_sq),
                                       np.asarray(ref.dev_sq),
                                       rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("want", ["full", "fullt", "infer", "states", "llk"])
def test_kernel_lean_config_with_g_slabs_matches(rng, monkeypatch, want):
    """Slab-mode G inputs composed with the LEAN big-k configuration
    (single-buffered A, manual SM DMA) — the combination a k>192 TPU run
    hits when g_slab_inputs is on — == the full-G lean run, forced at
    small k via the shrunken VMEM budget."""
    B, D, k = 256, 24, 24
    C = jnp.asarray(rng.normal(size=(D, k)), jnp.float32)
    mean = jnp.asarray(rng.normal(size=D), jnp.float32)
    sig = jnp.float32(0.7)
    data = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    mask = jnp.asarray(rng.random((B, D)) > 0.4)
    data = jnp.where(mask, data, 0.0)
    mf = mask.astype(jnp.float32)
    CC3 = C[:, :, None] * C[:, None, :]
    R = mf * (data - mean)
    b_t = (R @ C).T
    G3 = jnp.einsum("dij,bd->ijb", CC3, mf)
    slabs = tuple(
        jnp.einsum("dij,bd->ijb", CC3[:, r0:r1, r0:], mf)
        for r0, r1 in kernels.g_slabs(k)
    )
    rnorm = jnp.sum(R * R, axis=-1)[None, :]
    dob = jnp.sum(mf, axis=-1)[None, :]

    _force_lean(monkeypatch, want, k)
    assert kernels._kernel_config(want, k, kernels.LANE)[0]
    ref = kernels.spd_estep(sig, G3, b_t, rnorm, dob, want=want, interpret=True)
    got = kernels.spd_estep(sig, slabs, b_t, rnorm, dob, want=want,
                            interpret=True)
    tril = np.tril(np.ones((k, k)))[:, :, None]
    for i, (g, r) in enumerate(zip(got, ref)):
        g, r = np.asarray(g), np.asarray(r)
        if want == "fullt" and i == 1:
            g, r = g * tril, r * tril
        np.testing.assert_array_equal(g, r, err_msg=f"want={want} out={i}")
    kernels.spd_estep.clear_cache()
