"""Hardware parity check for the slab G/S paths (interpret mode zero-fills
scratch, so the dead-wedge-garbage hazard only shows on a real chip), then
quick marginal A/Bs.  Run on TPU."""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from ppca_rs_tpu.config import config
from ppca_rs_tpu.ops import masked_linalg as ml

assert jax.default_backend() == "tpu", jax.devices()

rng = np.random.default_rng(0)
B, D, k = 1024, 256, 64
C = jnp.asarray(rng.normal(size=(D, k)), jnp.float32)
mean = jnp.asarray(rng.normal(size=D), jnp.float32)
sig = jnp.float32(0.8)
data = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
mask = jnp.asarray(rng.random((B, D)) > 0.5)
data = jnp.where(mask, data, 0.0)
w = jnp.asarray(rng.random(B) + 0.5, jnp.float32)


def stats():
    return jax.jit(lambda *a: ml.em_stats(*a, block_size=128))(
        C, mean, sig, data, mask, w
    )


ref = stats()
results = {}
for gs, ss in ((True, False), (False, True), (True, True)):
    config.g_slab_inputs, config.s_slab_stats = gs, ss
    got = stats()
    tril = np.tril(np.ones((k, k)))
    S_r = np.asarray(ref.S, np.float64).reshape(D, k, k) * tril
    S_g = np.asarray(got.S, np.float64).reshape(D, k, k) * tril
    err = dict(
        S=float(np.abs(S_g - S_r).max() / np.abs(S_r).max()),
        cross=float(np.abs(np.asarray(got.cross) - np.asarray(ref.cross)).max()
                    / np.abs(np.asarray(ref.cross)).max()),
        llk=abs(float(got.llk) - float(ref.llk)) / abs(float(ref.llk)),
        finite=bool(all(np.isfinite(np.asarray(x)).all() for x in got)),
    )
    print(f"g_slab={gs} s_slab={ss}: {err}", flush=True)
    assert err["finite"] and err["S"] < 1e-5 and err["llk"] < 1e-5, err
config.g_slab_inputs = config.s_slab_stats = False
print("HW PARITY OK (single-model em_stats)", flush=True)

# --- mixture EM + readout twins (M*B lane batch through the same kernel) ---
from ppca_rs_tpu.ops import mix_fused as mf  # noqa: E402

M = 4
Cs = jnp.asarray(rng.normal(size=(M, D, k)), jnp.float32) * 0.5
means = jnp.asarray(rng.normal(size=(M, D)), jnp.float32)
sigs = jnp.asarray(0.5 + rng.random(M), jnp.float32)
lw = jnp.log(jnp.full((M,), 1.0 / M, jnp.float32))


def mix_stats():
    return jax.jit(lambda *a: mf.mix_em_stats(*a, block_size=128))(
        Cs, means, sigs, lw, data, mask, w
    )


def mix_readout():
    lp, s, cov = jax.jit(lambda *a: mf.mix_infer(*a, block_size=128))(
        Cs, means, sigs, lw, data, mask
    )
    return lp, s, cov


ref_m = mix_stats()
ref_r = mix_readout()
tril = np.tril(np.ones((k, k)))
for gs, ss in ((True, False), (False, True), (True, True)):
    config.g_slab_inputs, config.s_slab_stats = gs, ss
    got_m = mix_stats()
    got_r = mix_readout()
    S_r = np.asarray(ref_m.S, np.float64).reshape(M, D, k, k) * tril
    S_g = np.asarray(got_m.S, np.float64).reshape(M, D, k, k) * tril
    err = dict(
        S=float(np.abs(S_g - S_r).max() / np.abs(S_r).max()),
        cross=float(np.abs(np.asarray(got_m.cross) - np.asarray(ref_m.cross)).max()
                    / np.abs(np.asarray(ref_m.cross)).max()),
        llk=abs(float(got_m.llk) - float(ref_m.llk)) / abs(float(ref_m.llk)),
        infer=max(
            float(np.abs(np.asarray(a) - np.asarray(b)).max())
            for a, b in zip(got_r, ref_r)
        ),
        finite=bool(all(np.isfinite(np.asarray(x)).all() for x in got_m)),
    )
    print(f"mix g_slab={gs} s_slab={ss}: {err}", flush=True)
    assert err["finite"] and err["S"] < 1e-5 and err["llk"] < 1e-5, err
    assert err["infer"] < 1e-3, err
config.g_slab_inputs = config.s_slab_stats = False
print("HW PARITY OK (mixture)", flush=True)

# --- pattern-path Souter slab (pure XLA, but stamp it on hardware too) ---
from ppca_rs_tpu.ops import pattern_dedup as pd  # noqa: E402

P = 8
pats = jnp.asarray(rng.random((P, D)) > 0.5)
pidx = jnp.asarray(rng.integers(0, P, size=B), jnp.int32)
pdata = jnp.where(pats[pidx], data, 0.0)


def pat_stats():
    return jax.jit(lambda *a: pd.em_stats(*a, block_size=128))(
        C, mean, sig, pdata, pats[pidx], pidx, pats, w
    )


def patmix_stats():
    return jax.jit(lambda *a: mf.mix_em_stats_pat(*a, block_size=128))(
        Cs, means, sigs, lw, pdata, pats[pidx], pidx, pats, w
    )


ref_p = pat_stats()
ref_pm = patmix_stats()
config.s_slab_stats = True
got_p = pat_stats()
got_pm = patmix_stats()
config.s_slab_stats = False
for name, got, refv, MM in (("pat", got_p, ref_p, 1), ("patmix", got_pm, ref_pm, M)):
    S_r = np.asarray(refv.S, np.float64).reshape(MM, D, k, k) * tril
    S_g = np.asarray(got.S, np.float64).reshape(MM, D, k, k) * tril
    errS = float(np.abs(S_g - S_r).max() / np.abs(S_r).max())
    errllk = abs(float(got.llk) - float(refv.llk)) / abs(float(refv.llk))
    print(f"{name} s_slab: S={errS:.2e} llk={errllk:.2e}", flush=True)
    assert errS < 1e-5 and errllk < 1e-5
print("HW PARITY OK (pattern paths)", flush=True)
