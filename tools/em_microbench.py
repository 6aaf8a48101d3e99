"""Marginal-cost micro-benchmark for one full EM iteration, per path.

Same methodology as kernel_microbench.py (remote-tunnel dispatch ~35 ms and
per-(fn, args) result caching make naive timing lie): run r and 2r EM
iterations chained inside ONE jitted lax.scan — the model parameters are the
carry, so every iteration's inputs differ and nothing can be CSE'd or
cached — and report (t_2r - t_r) / r, the marginal wall time of one
iteration.

Paths:
  masked   masked_linalg.em_stats/em_finalize     (D=1024, k=64, 50% missing)
  dense    dense_fast.em_stats/em_finalize        (D=1024, k=64)
  mix      mix_fused.mix_em_stats/mix_em_finalize (D=512, k=32, M=8)

Usage:  python tools/em_microbench.py [--path masked|dense|mix] [--n 262144]
            [--reps 4] [--d D] [--k K] [--m M] [--miss 0.5] [--mix-want full]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--path", default="masked",
                    choices=["masked", "dense", "mix", "pat", "patmix",
                             "pat_sorted", "patmix_sorted"])
    ap.add_argument("--p", type=int, default=32)
    ap.add_argument("--n", type=int, default=262144)
    ap.add_argument("--d", type=int, default=None)
    ap.add_argument("--k", type=int, default=None)
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--miss", type=float, default=None)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--mix-want", default=None, choices=["full", "fullt"])
    ap.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"],
                    help="value-STORAGE dtype for data (math always >= f32)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from ppca_rs_tpu.ops import masked_linalg as ml
    from ppca_rs_tpu.ops import dense_fast as df
    from ppca_rs_tpu.ops import mix_fused as mf

    D = args.d or (512 if args.path == "mix" else 1024)
    k = args.k or (32 if args.path == "mix" else 64)
    miss = args.miss if args.miss is not None else (0.5 if args.path != "dense" else 0.0)
    N, M = args.n, args.m
    if args.mix_want:
        mf.EM_WANT = args.mix_want

    key = jax.random.PRNGKey(0)
    kd, kmask, kc = jax.random.split(key, 3)
    data = jax.random.normal(kd, (N, D), jnp.float32)
    if args.path in ("pat", "patmix", "pat_sorted", "patmix_sorted"):
        P = args.p
        patterns = jax.random.uniform(kmask, (P, D)) >= miss
        pidx = jax.random.randint(jax.random.PRNGKey(7), (N,), 0, P)
        mask = jnp.take(patterns, pidx, axis=0)
    else:
        mask = jax.random.uniform(kmask, (N, D)) >= miss
    data = jnp.where(mask, data, 0.0)
    if args.dtype == "bfloat16":
        data = data.astype(jnp.bfloat16)
    w = jnp.ones((N,), jnp.float32)
    BS = 8192

    if args.path in ("pat_sorted", "patmix_sorted"):
        # sorted-segment layout: host argsort + static per-pattern counts
        import numpy as np

        pidx_h = np.asarray(pidx)
        perm = np.argsort(pidx_h, kind="stable")
        counts = tuple(int(c) for c in np.bincount(pidx_h, minlength=P))
        data = jnp.take(data, jnp.asarray(perm.astype(np.int32)), axis=0)

    if args.path == "pat_sorted":
        from ppca_rs_tpu.ops import pattern_dedup as pdd

        C = jax.random.normal(kc, (D, k), jnp.float32) * 0.3
        mean = jnp.zeros((D,), jnp.float32)
        sigma = jnp.float32(1.0)

        def chain(n):
            @jax.jit
            def run(C, mean, sigma, data, patterns, w):
                def step(carry, _):
                    C, mean, sigma = carry
                    st = pdd.em_stats_sorted(C, mean, sigma, data, w,
                                             patterns, counts, block_size=BS)
                    out = ml.em_finalize(
                        C, mean, sigma, st, transformation_precision=0.0)
                    return out, st.llk
                carry, llks = jax.lax.scan(step, (C, mean, sigma), None, length=n)
                return llks[-1]
            return run
        opn = (C, mean, sigma, data, patterns, w)
    elif args.path == "patmix_sorted":
        Cs = jax.random.normal(kc, (M, D, k), jnp.float32) * 0.3
        means = jnp.zeros((M, D), jnp.float32)
        sigmas = jnp.full((M,), 1.0, jnp.float32)
        lw = jnp.zeros((M,), jnp.float32) - jnp.log(float(M))

        def chain(n):
            @jax.jit
            def run(Cs, means, sigmas, lw, data, patterns, w):
                def step(carry, _):
                    Cs, means, sigmas, lw = carry
                    st = mf.mix_em_stats_pat_sorted(
                        Cs, means, sigmas, lw, data, w, patterns, counts,
                        block_size=BS)
                    out = mf.mix_em_finalize(
                        Cs, means, sigmas, st, transformation_precision=0.0)
                    return out, st.llk
                carry, llks = jax.lax.scan(
                    step, (Cs, means, sigmas, lw), None, length=n)
                return llks[-1]
            return run
        opn = (Cs, means, sigmas, lw, data, patterns, w)
    elif args.path == "pat":
        from ppca_rs_tpu.ops import pattern_dedup as pdd

        C = jax.random.normal(kc, (D, k), jnp.float32) * 0.3
        mean = jnp.zeros((D,), jnp.float32)
        sigma = jnp.float32(1.0)

        def chain(n):
            @jax.jit
            def run(C, mean, sigma, data, mask, pidx, patterns, w):
                def step(carry, _):
                    C, mean, sigma = carry
                    st = pdd.em_stats(C, mean, sigma, data, mask, pidx,
                                      patterns, w, block_size=BS)
                    out = ml.em_finalize(
                        C, mean, sigma, st, transformation_precision=0.0)
                    return out, st.llk
                carry, llks = jax.lax.scan(step, (C, mean, sigma), None, length=n)
                return llks[-1]
            return run
        opn = (C, mean, sigma, data, mask, pidx, patterns, w)
    elif args.path == "patmix":
        Cs = jax.random.normal(kc, (M, D, k), jnp.float32) * 0.3
        means = jnp.zeros((M, D), jnp.float32)
        sigmas = jnp.full((M,), 1.0, jnp.float32)
        lw = jnp.zeros((M,), jnp.float32) - jnp.log(float(M))

        def chain(n):
            @jax.jit
            def run(Cs, means, sigmas, lw, data, mask, pidx, patterns, w):
                def step(carry, _):
                    Cs, means, sigmas, lw = carry
                    st = mf.mix_em_stats_pat(Cs, means, sigmas, lw, data, mask,
                                             pidx, patterns, w, block_size=BS)
                    out = mf.mix_em_finalize(
                        Cs, means, sigmas, st, transformation_precision=0.0)
                    return out, st.llk
                carry, llks = jax.lax.scan(
                    step, (Cs, means, sigmas, lw), None, length=n)
                return llks[-1]
            return run
        opn = (Cs, means, sigmas, lw, data, mask, pidx, patterns, w)
    elif args.path == "mix":
        Cs = jax.random.normal(kc, (M, D, k), jnp.float32) * 0.3
        means = jnp.zeros((M, D), jnp.float32)
        sigmas = jnp.full((M,), 1.0, jnp.float32)
        lw = jnp.zeros((M,), jnp.float32) - jnp.log(float(M))

        def chain(n):
            @jax.jit
            def run(Cs, means, sigmas, lw, data, mask, w):
                def step(carry, _):
                    Cs, means, sigmas, lw = carry
                    st = mf.mix_em_stats(Cs, means, sigmas, lw, data, mask, w,
                                         block_size=BS)
                    out = mf.mix_em_finalize(
                        Cs, means, sigmas, st, transformation_precision=0.0)
                    return out, st.llk
                carry, llks = jax.lax.scan(
                    step, (Cs, means, sigmas, lw), None, length=n)
                return llks[-1]
            return run
        opn = (Cs, means, sigmas, lw, data, mask, w)
    elif args.path == "dense":
        C = jax.random.normal(kc, (D, k), jnp.float32) * 0.3
        mean = jnp.zeros((D,), jnp.float32)
        sigma = jnp.float32(1.0)

        def chain(n):
            @jax.jit
            def run(C, mean, sigma, data, w):
                def step(carry, _):
                    C, mean, sigma = carry
                    st = df.em_stats(C, mean, sigma, data, w, block_size=BS)
                    out = df.em_finalize(
                        C, mean, sigma, st, transformation_precision=0.0)
                    return out, st.llk
                carry, llks = jax.lax.scan(step, (C, mean, sigma), None, length=n)
                return llks[-1]
            return run
        opn = (C, mean, sigma, data, w)
    else:
        C = jax.random.normal(kc, (D, k), jnp.float32) * 0.3
        mean = jnp.zeros((D,), jnp.float32)
        sigma = jnp.float32(1.0)

        def chain(n):
            @jax.jit
            def run(C, mean, sigma, data, mask, w):
                def step(carry, _):
                    C, mean, sigma = carry
                    st = ml.em_stats(C, mean, sigma, data, mask, w,
                                     block_size=BS)
                    out = ml.em_finalize(
                        C, mean, sigma, st, transformation_precision=0.0)
                    return out, st.llk
                carry, llks = jax.lax.scan(step, (C, mean, sigma), None, length=n)
                return llks[-1]
            return run
        opn = (C, mean, sigma, data, mask, w)

    r = args.reps
    run1, run2 = chain(r), chain(2 * r)
    t0 = time.perf_counter()
    v1 = float(run1(*opn)); v2 = float(run2(*opn))
    print(f"compile: {time.perf_counter() - t0:.1f}s  llk[r]={v1:.3f} llk[2r]={v2:.3f}",
          file=sys.stderr)

    def best(fn, n=5):
        b = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            float(fn(*opn))
            b = min(b, time.perf_counter() - t0)
        return b

    t1, t2 = best(run1), best(run2)
    per_iter = (t2 - t1) / r
    extra = f" mix_want={mf.EM_WANT}" if args.path == "mix" else ""
    extra += f" dtype={args.dtype}" if args.dtype != "float32" else ""
    print(f"path={args.path} D={D} k={k} N={N} miss={miss}{extra}: "
          f"{per_iter*1e3:.2f} ms/iter -> {N/per_iter/1e6:.3f}M samples/s")


if __name__ == "__main__":
    main()
