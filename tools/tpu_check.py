"""Real-hardware Pallas kernel parity: every fused-kernel verb family A/B'd
against its pure-XLA fallback on the actual TPU.

Interpret-mode tests (tests/test_kernels.py) cannot catch stale-VMEM-class
bugs by construction (interpret zero-fills scratch; hardware leaves garbage),
so every TPU session should run `make tpu-check` before trusting bench
numbers — this script plus tools/slab_hw_check.py (the slab-flag twin) is
that gate (VERDICT r3 next-step #8).
"""
import os
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from ppca_rs_tpu.config import config
from ppca_rs_tpu.ops import kernels, masked_linalg as ml, mix_fused as mf

# TPU_CHECK_ALLOW_CPU=1 smoke-runs the harness logic on CPU (the kernel
# dispatch gates on the backend there, so it only checks the A/B plumbing).
ALLOW_CPU = os.environ.get("TPU_CHECK_ALLOW_CPU") == "1"
if not ALLOW_CPU:
    assert jax.default_backend() == "tpu", jax.devices()
assert config.use_pallas, "tpu-check needs the Pallas paths enabled"

rng = np.random.default_rng(3)
B, D = 1024, 256


def problem(k):
    C = jnp.asarray(rng.normal(size=(D, k)), jnp.float32) * 0.5
    mean = jnp.asarray(rng.normal(size=D), jnp.float32)
    sig = jnp.float32(0.7)
    data = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    mask = jnp.asarray(rng.random((B, D)) > 0.5)
    w = jnp.asarray(rng.random(B) + 0.5, jnp.float32)
    return C, mean, sig, jnp.where(mask, data, 0.0), mask, w


def ab(name, fn, *args, tol=2e-4):
    """Run fn with the kernel on and off; compare at f64 on host."""
    config.use_pallas = True
    got = jax.tree.map(np.asarray, fn(*args))
    config.use_pallas = False
    ref = jax.tree.map(np.asarray, fn(*args))
    config.use_pallas = True
    leaves_g, leaves_r = jax.tree.leaves(got), jax.tree.leaves(ref)
    worst = 0.0
    for g, r in zip(leaves_g, leaves_r):
        g64, r64 = np.asarray(g, np.float64), np.asarray(r, np.float64)
        assert np.isfinite(g64).all(), f"{name}: non-finite kernel output"
        scale = max(np.abs(r64).max(), 1.0)
        worst = max(worst, float(np.abs(g64 - r64).max() / scale))
    print(f"{name}: max rel err {worst:.2e}", flush=True)
    assert worst < tol, f"{name}: {worst} >= {tol}"


# k=64 is the headline config; k=160 exercises the lean big-k kernel config
# (single-buffered A + staged SM, ops/kernels._kernel_config).
for k in (64, 160):
    C, mean, sig, data, mask, w = problem(k)
    ab(f"llks k={k}",
       lambda *a: jax.jit(lambda *b: ml.llks(*b, block_size=256))(*a),
       C, mean, sig, data, mask)
    ab(f"infer k={k}",
       lambda *a: jax.jit(lambda *b: ml.infer(*b, block_size=256))(*a),
       C, mean, sig, data, mask)
    # em_stats' S statistic is only defined on the tril wedge under the
    # fullt kernel; compare the symmetrized finalize outputs instead.
    # Tolerance: the M-step's per-row solves amplify f32 rounding at this
    # problem size — triaged on v5e (tools/emstep_triage.py): kernel path
    # 3.7e-3 and XLA fallback 4.9e-3 from the f64 oracle (the kernel is the
    # MORE accurate side), so the f32-vs-f32 A/B lands ~5.6e-3.  The bug
    # class this check exists for (stale VMEM read on real hardware) shows
    # up as >>1e-1 or non-finite, so 2e-2 keeps full detection power.
    ab(f"em step k={k}",
       lambda *a: jax.jit(
           lambda *b: ml.em_finalize(
               b[0], b[1], b[2],
               ml.em_stats(*b, block_size=256),
               transformation_precision=jnp.float32(0.0),
           )
       )(*a),
       C, mean, sig, data, mask, w, tol=2e-2)

# The sampler backend: batched Cholesky, batch on lanes.
k = 64
spd = jnp.asarray(rng.normal(size=(k, k, 512)), jnp.float32)
spd = jnp.einsum("kjb,ljb->klb", spd, spd) / k + 2.0 * jnp.eye(k)[:, :, None]
L = np.asarray(kernels.spd_chol(spd, interpret=ALLOW_CPU))
L_ref = np.asarray(
    jnp.transpose(jnp.linalg.cholesky(jnp.transpose(spd, (2, 0, 1))), (1, 2, 0))
)
err = float(np.abs(L - L_ref).max() / np.abs(L_ref).max())
print(f"spd_chol k={k}: max rel err {err:.2e}", flush=True)
assert err < 2e-4

# Fused mixture inference (M*B lane batch through the same kernel).
M, k = 4, 64
C, mean, sig, data, mask, w = problem(k)
Cs = jnp.asarray(rng.normal(size=(M, D, k)), jnp.float32) * 0.5
means = jnp.asarray(rng.normal(size=(M, D)), jnp.float32)
sigs = jnp.asarray(0.5 + rng.random(M), jnp.float32)
lw = jnp.log(jnp.full((M,), 1.0 / M, jnp.float32))
# Tolerance: responsibilities exponentiate the per-component llks, so a
# ~1e-5 RELATIVE llk error (see "llks" above) at |llk| ~ O(D) becomes a
# ~3e-3 ABSOLUTE log-posterior difference between any two f32 paths —
# measured 3.6e-3 kernel-vs-XLA on v5e.  Stale-VMEM bugs show as >>1e-1
# or non-finite, so 2e-2 keeps detection power.
ab("mix_infer M=4 k=64",
   lambda *a: jax.jit(lambda *b: mf.mix_infer(*b, block_size=256))(*a),
   Cs, means, sigs, lw, data, mask, tol=2e-2)

print("TPU KERNEL PARITY OK", flush=True)
