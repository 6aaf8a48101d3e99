"""Schur-complement spike: can big-k factorizations use the MXU?

VERDICT round 2 asked for a measured verdict on a block-Gram Schur
formulation of the per-sample SPD factorization at k > 192: partition
M = [[A, B^T], [B, C]] into p-sized blocks, factor the (p, p) diagonal
blocks with the VPU lane kernel, and push the trailing/Schur updates
(B A^{-1} B^T etc.) onto the MXU as *per-sample batched matmuls*.

The whole question reduces to one number: the throughput of XLA:TPU
batched matmul at (B, p, p) operand shapes.  Each sample carries its own
matrices, so there is no shared operand and no way to express the update
as one big dense matmul (block-diagonal packing wastes 1 - 1/p^2 of the
MXU flops — analyzed dead in round 2b).  If batched matmul runs at
~GFLOP/s like batched Cholesky does, Schur panels buy nothing over the
VPU staircase kernel; if it ran near MXU speed they would win at k>=192.

Also times XLA's batched cholesky at k=256 (the silent-fallback cliff the
lean kernel config now avoids) and the lean-config fused kernel itself,
so the three alternatives are on one scale.

Usage: python tools/schur_spike.py [--b 8192]  (on TPU)
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def marginal(run_factory, *args, reps=8):
    """Chained-2r marginal timing (see kernel_microbench.py)."""
    run1, run2 = run_factory(reps), run_factory(2 * reps)
    float(run1(*args)); float(run2(*args))       # compile both
    best = [float("inf"), float("inf")]
    for _ in range(4):
        t0 = time.perf_counter(); float(run1(*args))
        best[0] = min(best[0], time.perf_counter() - t0)
        t0 = time.perf_counter(); float(run2(*args))
        best[1] = min(best[1], time.perf_counter() - t0)
    return (best[1] - best[0]) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=8192)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    B = args.b
    key = jax.random.PRNGKey(0)

    # --- 1. batched matmul throughput at Schur panel shapes ----------------
    # default precision is one bf16 pass on the MXU; trailing Cholesky
    # updates need at least f32-faithful products, so "highest" (and the
    # middle "high"/bf16x3 tier) is the number that decides the Schur
    # formulation.
    import itertools
    pairs = [("default", 128), ("high", 128), ("highest", 128),
             ("highest", 64), ("highest", 256)]
    for prec, p in pairs:
        if True:
            X = jax.random.normal(key, (B, p, p), jnp.float32)

            def factory(n):
                @jax.jit
                def run(X):
                    def step(c, i):
                        Y = X + 1e-6 * i.astype(jnp.float32)
                        Z = jnp.matmul(Y, Y, precision=prec)
                        return c + jnp.sum(Z) * 1e-30, None
                    tot, _ = lax.scan(step, jnp.float32(0.0), jnp.arange(n))
                    return tot
                return run

            dt = marginal(factory, X)
            flops = 2.0 * B * p ** 3
            print(f"batched matmul ({B},{p},{p}) prec={prec}: {dt*1e3:.2f} ms/call "
                  f"-> {flops/dt/1e12:.3f} TFLOP/s", flush=True)

    # --- 2. XLA batched cholesky at k=256 (the old silent cliff) -----------
    k = 256
    V = jax.random.normal(key, (B, k, 2 * k), jnp.float32) / jnp.sqrt(2.0 * k)
    M = jnp.einsum("bij,bkj->bik", V, V) + 0.1 * jnp.eye(k, dtype=jnp.float32)

    def chol_factory(n):
        @jax.jit
        def run(M):
            def step(c, i):
                L = jnp.linalg.cholesky(M + 1e-6 * i.astype(jnp.float32)
                                        * jnp.eye(k, dtype=jnp.float32))
                return c + jnp.sum(L) * 1e-30, None
            tot, _ = lax.scan(step, jnp.float32(0.0), jnp.arange(n))
            return tot
        return run

    dt = marginal(chol_factory, M, reps=2)
    print(f"XLA batched cholesky ({B},{k},{k}): {dt*1e3:.1f} ms/call "
          f"({B/dt/1e6:.3f}M samples/s)", flush=True)

    # --- 3. lean-config fused kernel at k=256 ------------------------------
    from ppca_rs_tpu.ops import kernels

    cfg = kernels._kernel_config("fullt", 256, kernels.LANE)
    print(f"fused kernel config at k=256: single_buf={cfg[0]} sm_manual={cfg[1]}")
    G3 = jnp.transpose(M, (1, 2, 0)).copy()
    b_t = jax.random.normal(key, (k, B), jnp.float32)
    rnorm = jnp.sum(b_t * b_t, axis=0)[None, :] * 3.0
    dob = jnp.full((1, B), 512.0, jnp.float32)

    def kern_factory(n):
        @jax.jit
        def run(G3, b_t):
            def step(c, i):
                out = kernels.spd_estep(jnp.float32(0.7),
                                        G3 + 1e-6 * i.astype(jnp.float32),
                                        b_t, rnorm, dob, want="fullt")
                return c + sum(jnp.sum(o) * 1e-30 for o in out), None
            tot, _ = lax.scan(step, jnp.float32(0.0), jnp.arange(n))
            return tot
        return run

    dt = marginal(kern_factory, G3, b_t, reps=2)
    print(f"fused lean kernel k=256 fullt ({B} lanes): {dt*1e3:.1f} ms/call "
          f"({B/dt/1e6:.3f}M samples/s)", flush=True)


if __name__ == "__main__":
    main()
