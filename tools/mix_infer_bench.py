"""A/B the two mix_infer block implementations on TPU.

Round 3 routed the non-pattern kernel path of mix_infer through the
lane-major `_block_llks_kernel(want="infer")` (no (M, B, D) centered-data
temporary); the round-2 path materialized R per component via `_block_post`.
This measures both bodies through identical scans with the marginal-cost
method (chained r vs 2r), so the verdict on VERDICT round-2 weak #5(b)
rests on a number.

Usage: python tools/mix_infer_bench.py [--n 131072] [--d 512] [--k 32] [--m 8]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=131_072)
    ap.add_argument("--d", type=int, default=512)
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--block", type=int, default=8192)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from ppca_rs_tpu.ops import mix_fused as mf

    N, D, k, M, B = args.n, args.d, args.k, args.m, args.block
    keys = jax.random.split(jax.random.PRNGKey(0), 6)
    Cs = jax.random.normal(keys[0], (M, D, k), jnp.float32) * 0.3
    means = jax.random.normal(keys[1], (M, D), jnp.float32)
    sigmas = 0.5 + jax.random.uniform(keys[2], (M,), jnp.float32)
    lw = jnp.log(jnp.full((M,), 1.0 / M, jnp.float32))
    data = jax.random.normal(keys[3], (N, D), jnp.float32)
    mask = jax.random.bernoulli(keys[4], 0.8, (N, D))
    data = jnp.where(mask, data, 0.0)

    def make(run_block):
        def factory(r):
            @jax.jit
            def run(data, mask):
                def rep(c, i):
                    out = run_block(data + 1e-6 * i.astype(jnp.float32), mask)
                    return c + sum(jnp.sum(o) * 1e-30 for o in out), None
                tot, _ = lax.scan(rep, jnp.float32(0.0), jnp.arange(r))
                return tot
            return run
        return factory

    def new_block(data, mask):
        return mf.mix_infer(Cs, means, sigmas, lw, data, mask, block_size=B)

    def old_block(data, mask):
        """Round-2 body: _block_post(use_kernel=True) materializes the
        (M, B, D) per-component residual before the kernel call."""
        from ppca_rs_tpu.ops import masked_linalg as ml

        dtype, CCs, use_kernel = mf._mix_prep(Cs, data, B, None)

        def body(_, fresh, db, mb):
            mb_f = mb.astype(dtype) * fresh.astype(dtype)[:, None]
            _, llks, s, Sig, _ = mf._block_post(
                Cs, CCs, means, sigmas, db.astype(dtype), mb_f,
                use_kernel, None, "infer",
            )
            return None, (llks, s, Sig)

        _, outs, _ = ml._scan_blocks(N, B, (data, mask), body, None)
        return outs

    for name, blk in (("old _block_post", old_block), ("new lane-major", new_block)):
        fac = make(blk)
        r = args.reps
        run1, run2 = fac(r), fac(2 * r)
        t0 = time.perf_counter()
        float(run1(data, mask)); float(run2(data, mask))
        print(f"{name}: compile {time.perf_counter() - t0:.0f}s",
              file=sys.stderr, flush=True)
        best = [float("inf")] * 2
        for _ in range(3):
            t0 = time.perf_counter(); float(run1(data, mask))
            best[0] = min(best[0], time.perf_counter() - t0)
            t0 = time.perf_counter(); float(run2(data, mask))
            best[1] = min(best[1], time.perf_counter() - t0)
        per = (best[1] - best[0]) / r
        print(f"{name}: {per*1e3:.1f} ms/pass over {N} rows "
              f"({N/per/1e6:.2f}M samples/s)", flush=True)


if __name__ == "__main__":
    main()
