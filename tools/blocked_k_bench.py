"""Measure the blocked Schur-inverse large-k E-step vs the XLA fallback.

Marginal-cost method (see CLAUDE.md "Environment gotchas"): the remote
tunnel caches results per (program, operands) and dispatch costs ~35 ms,
so we time em_stats at two chained lengths inside the same jitted
program family and subtract — the difference is the pure per-block cost.

Run on the TPU:  PYTHONPATH=/root/repo python tools/blocked_k_bench.py [k ...]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from ppca_rs_tpu.config import block_size_for, config
from ppca_rs_tpu.ops import masked_linalg as ml


def marginal_em_stats(C, mean, sigma, data, mask, w, block, n_small, n_big, tag):
    """Time em_stats at n_small and n_big rows; return s per extra block."""
    import functools

    f = jax.jit(functools.partial(ml.em_stats, block_size=block))

    def run(n, reps=3):
        d, m, ww = data[:n], mask[:n], w[:n]
        # warm with different operands (result-cache dodge), then time
        float(f(C + 1e-6, mean, sigma, d, m, ww).llk)
        t0 = time.perf_counter()
        for _ in range(reps):
            float(f(C, mean, sigma, d, m, ww).llk)
        return (time.perf_counter() - t0) / reps

    t_small = run(n_small)
    t_big = run(n_big)
    per_block = (t_big - t_small) / ((n_big - n_small) / block)
    per_sample = per_block / block
    print(
        f"{tag}: small={t_small:.3f}s big={t_big:.3f}s -> "
        f"{per_block * 1e3:.1f} ms/block({block}) = {per_sample * 1e6:.1f} us/sample "
        f"= {1.0 / per_sample:,.0f} samples/s"
    )
    return per_sample


def main():
    ks = [int(a) for a in sys.argv[1:]] or [384, 512]
    D = 1024
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}")
    for k in ks:
        block = block_size_for(1 << 20, k)
        n_small, n_big = 4 * block, 8 * block
        print(f"\n=== k={k} D={D} block={block} (marginal over {n_small}->{n_big} rows)")
        C = jnp.asarray(rng.normal(size=(D, k)) / np.sqrt(D), jnp.float32)
        mean = jnp.zeros(D, jnp.float32)
        sigma = jnp.float32(0.5)
        data = jnp.asarray(rng.normal(size=(n_big, D)), jnp.float32)
        mask = jnp.asarray(rng.random((n_big, D)) > 0.5)
        data = jnp.where(mask, data, 0.0)
        w = jnp.ones(n_big, jnp.float32)

        config.use_blocked_large_k = True
        blocked = marginal_em_stats(
            C, mean, sigma, data, mask, w, block, n_small, n_big, "blocked-schur"
        )
        config.use_blocked_large_k = False
        try:
            xla = marginal_em_stats(
                C, mean, sigma, data, mask, w, block, n_small, n_big, "xla-cholesky"
            )
            print(f"speedup: {xla / blocked:.1f}x")
        finally:
            config.use_blocked_large_k = True


if __name__ == "__main__":
    main()
