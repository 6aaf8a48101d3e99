"""Triage the tpu_check em-step A/B failure: which side is wrong?

Computes the k=64 em_finalize outputs three ways:
  * TPU kernel path   (use_pallas=True)
  * TPU XLA fallback  (use_pallas=False)
  * CPU f64 oracle    (separate process not needed: f64 on CPU via explicit
    casts — jax x64 must be on, so we spawn with JAX_PLATFORMS=cpu when
    asked)
and prints per-leaf max rel errors kernel-vs-oracle and xla-vs-oracle.

Run twice:
  python tools/emstep_triage.py          # TPU: dumps both f32 paths to npz
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python tools/emstep_triage.py
                                         # CPU: f64 oracle + comparison
"""
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from ppca_rs_tpu.config import config
from ppca_rs_tpu.ops import masked_linalg as ml

rng = np.random.default_rng(3)
B, D, k = 1024, 256, 64

C = rng.normal(size=(D, k)) * 0.5
mean = rng.normal(size=D)
sig = 0.7
data = rng.normal(size=(B, D))
mask = rng.random((B, D)) > 0.5
data = np.where(mask, data, 0.0)
w = rng.random(B) + 0.5


def run(dtype):
    Cx = jnp.asarray(C, dtype)
    mx = jnp.asarray(mean, dtype)
    sx = jnp.asarray(sig, dtype)
    dx = jnp.asarray(data, dtype)
    kx = jnp.asarray(mask)
    wx = jnp.asarray(w, dtype)

    def f(C_, mean_, sig_, data_, mask_, w_):
        return ml.em_finalize(
            C_, mean_, sig_,
            ml.em_stats(C_, mean_, sig_, data_, mask_, w_, block_size=256),
            transformation_precision=jnp.asarray(0.0, dtype),
        )

    return jax.tree.map(np.asarray, jax.jit(f)(Cx, mx, sx, dx, kx, wx))


def rel(a, b):
    out = []
    for g, r in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        g64, r64 = np.asarray(g, np.float64), np.asarray(r, np.float64)
        scale = max(np.abs(r64).max(), 1.0)
        out.append(float(np.abs(g64 - r64).max() / scale))
    return out


if jax.default_backend() == "tpu":
    config.use_pallas = True
    kern = run(jnp.float32)
    config.use_pallas = False
    xla = run(jnp.float32)
    np.savez("/tmp/emstep_triage.npz",
             **{f"kern{i}": x for i, x in enumerate(jax.tree.leaves(kern))},
             **{f"xla{i}": x for i, x in enumerate(jax.tree.leaves(xla))})
    print("kernel vs xla (f32/f32):", rel(kern, xla))
else:
    jax.config.update("jax_enable_x64", True)
    config.use_pallas = False
    oracle = run(jnp.float64)
    z = np.load("/tmp/emstep_triage.npz")
    nleaf = len(jax.tree.leaves(oracle))
    kern = [z[f"kern{i}"] for i in range(nleaf)]
    xla = [z[f"xla{i}"] for i in range(nleaf)]
    print("leaf shapes:", [np.shape(x) for x in jax.tree.leaves(oracle)])
    print("kernel vs f64 oracle:", rel(kern, oracle))
    print("xla    vs f64 oracle:", rel(xla, oracle))
