"""Marginal-cost micro-benchmark for the fused SPD E-step kernel.

The remote-tunnel dispatch costs ~35 ms per call and caches results per
(fn, args), so naive timing lies (CLAUDE.md "Environment gotchas").  This
script times TWO chained-length variants of the same jitted program — r and
2r kernel invocations inside one lax.scan, each step's input perturbed by
the step index so no two calls are identical — and reports the difference
divided by r: the marginal cost of one kernel call, free of dispatch and
cache effects.

Usage:  python tools/kernel_microbench.py [--k 64] [--b 8192] [--want full]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--b", type=int, default=8192)
    ap.add_argument("--want", default="full",
                    choices=["llk", "states", "full", "infer", "fullt"])
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--tile", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from ppca_rs_tpu.ops import kernels

    k, B = args.k, args.b
    key = jax.random.PRNGKey(0)
    kc, kb = jax.random.split(key)
    # Well-conditioned SPD Grams: G = V V^T with V (k, 2k)
    V = jax.random.normal(kc, (k, 2 * k), jnp.float32) / jnp.sqrt(2.0 * k)
    G = V @ V.T
    G3 = jnp.broadcast_to(G[:, :, None], (k, k, B)).copy()
    b_t = jax.random.normal(kb, (k, B), jnp.float32)
    rnorm = jnp.sum(b_t * b_t, axis=0)[None, :] * 3.0
    dob = jnp.full((1, B), 100.0, jnp.float32)
    sigma = jnp.float32(0.7)

    def chain(n):
        @jax.jit
        def run(G3, b_t):
            def step(carry, i):
                G_i = G3 + (1e-6 * i.astype(jnp.float32))  # defeat CSE
                out = kernels.spd_estep(sigma, G_i, b_t, rnorm, dob,
                                        want=args.want, tile=args.tile)
                # fold every output into a scalar so nothing is dead
                tot = sum(jnp.sum(o) * 1e-30 for o in out)
                return carry + tot, None
            tot, _ = jax.lax.scan(step, jnp.float32(0.0), jnp.arange(n))
            return tot
        return run

    r = args.reps
    run1, run2 = chain(r), chain(2 * r)
    # compile both
    t0 = time.perf_counter()
    float(run1(G3, b_t)); float(run2(G3, b_t))
    print(f"compile: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    def best(fn, n=5):
        b = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            float(fn(G3, b_t))
            b = min(b, time.perf_counter() - t0)
        return b

    t1, t2 = best(run1), best(run2)
    per_call = (t2 - t1) / r
    print(f"k={k} B={B} want={args.want} tile={args.tile or 128}: chained {r}x={t1*1e3:.1f}ms "
          f"{2*r}x={t2*1e3:.1f}ms -> {per_call*1e3:.3f} ms/call "
          f"({B/per_call/1e6:.2f}M samples/s kernel-only)")


if __name__ == "__main__":
    main()
