"""The north star, demonstrated at its stated scale (VERDICT r3 next-step #2).

BASELINE.md targets 10 EM iterations at N=10M, D=1024, k=64, 50% missing on
a v5e-8; the arithmetic there ("64x over the 64-core CPU proxy needs only
0.2M samples/s/chip") was previously anchored only by extrapolation from
N<=4M runs. This script runs the thing honestly on ONE chip: 10M samples do
not fit HBM resident (10M x 1024 f32 is 40 GB), so they stream through
StreamingPPCATrainer as ten lazily-generated 1M-row device chunks — the
exact out-of-core workflow the trainer exists for (streaming.py).

Chunks are generated on device from a fixed ground-truth model (seeded per
chunk, deterministic across iterations — the stream re-yields the same data
every epoch like re-reading files would).

Usage:  python tools/northstar_10m.py [--n-chunks 10] [--chunk 1048576]
            [--iters 10] [--dtype float32|bfloat16]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-chunks", type=int, default=10)
    ap.add_argument("--chunk", type=int, default=1048576)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--d", type=int, default=1024)
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--miss", type=float, default=0.5)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="value-STORAGE dtype of the chunks (math >= f32)")
    ap.add_argument("--prefetch", type=int, default=1,
                    help="lazy chunks in flight beyond the one computing "
                         "(streaming.py _accumulate; 0 = strict "
                         "one-chunk-resident, the round-4 measured mode)")
    ap.add_argument("--host-fed", action="store_true",
                    help="pre-generate every chunk ONCE to host RAM and feed "
                         "the trainer via device_put — the timed run then "
                         "contains ZERO on-device synthetic regen (the "
                         "honest trainer-only measurement; needs "
                         "~3 GB x n_chunks host RAM, and pays the "
                         "host->device transfer instead, which through the "
                         "remote tunnel may dominate)")
    args = ap.parse_args()

    import functools

    import jax
    import jax.numpy as jnp

    from ppca_rs_tpu import Dataset, PPCAModel, StreamingPPCATrainer

    D, k, miss = args.d, args.k, args.miss
    B = args.chunk
    store = jnp.dtype(args.dtype)
    N = args.n_chunks * B

    key = jax.random.PRNGKey(7)
    kc, km = jax.random.split(key)
    C_true = jax.random.normal(kc, (D, k), jnp.float32) * 0.7
    mean_true = jax.random.normal(km, (D,), jnp.float32)

    @functools.partial(jax.jit, static_argnames=("n",))
    def gen_chunk(i, n):
        kz, ke, kmask = jax.random.split(jax.random.fold_in(key, i), 3)
        z = jax.random.normal(kz, (n, k), jnp.float32)
        eps = jax.random.normal(ke, (n, D), jnp.float32)
        vals = (z @ C_true.T + mean_true + 0.5 * eps).astype(store)
        mask = jax.random.uniform(kmask, (n, D)) >= miss
        return jnp.where(mask, vals, jnp.zeros((), store)), mask

    def chunk(i):
        return Dataset.from_parts(*gen_chunk(i, B))

    if args.host_fed:
        import numpy as np

        print(f"pre-generating {args.n_chunks} chunks to host RAM "
              f"(~{args.n_chunks * B * D * (store.itemsize + 1) / 2**30:.0f} "
              f"GB)...", flush=True)
        t0 = time.perf_counter()
        host_chunks = []
        for i in range(args.n_chunks):
            vals, mask = gen_chunk(i, B)
            host_chunks.append((np.asarray(vals), np.asarray(mask)))
        print(f"host buffers ready in {time.perf_counter() - t0:.1f}s",
              flush=True)

        def chunk(i):
            vals, mask = host_chunks[i]
            return Dataset.from_parts(jnp.asarray(vals), jnp.asarray(mask))

    chunks = [functools.partial(chunk, i) for i in range(args.n_chunks)]

    # generation cost, measured separately so the EM number is honest
    t0 = time.perf_counter()
    jax.block_until_ready(gen_chunk(0, B))
    t_gen_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(gen_chunk(1, B))
    t_gen = time.perf_counter() - t0
    # One full WARM regen epoch, serially blocked: the device time an epoch
    # of synthetic regeneration costs, i.e. what a host-fed stream would NOT
    # pay on the device (VERDICT r4 next-step #7).  Fresh fold_in seeds per
    # call dodge the tunnel's (program, operands) result cache.
    t0 = time.perf_counter()
    for i in range(args.n_chunks):
        jax.block_until_ready(gen_chunk(1000 + i, B))
    t_regen_epoch = time.perf_counter() - t0
    print(f"chunk generation: cold {t_gen_cold:.2f}s, warm {t_gen:.3f}s; "
          f"full warm epoch ({args.n_chunks} chunks) {t_regen_epoch:.2f}s",
          flush=True)

    start = PPCAModel.init(k, chunk(0), key=jax.random.PRNGKey(1))
    trainer = StreamingPPCATrainer(chunks)

    # One warmup iteration pays every compile.  It MUST use a different
    # start than the timed run: the tunnel caches results per (program,
    # operands), and chunks regenerate bit-identically, so warming up with
    # `start` itself would make the timed run's first iteration free
    # (~1/iters optimistic).  See CLAUDE.md "Remote result caching gotcha".
    warm_start = PPCAModel.init(k, chunk(0), key=jax.random.PRNGKey(2))
    t0 = time.perf_counter()
    trainer.train(start=warm_start, state_size=k, n_iters=1, quiet=True,
                  prefetch=args.prefetch)
    print(f"warmup iteration (incl. compiles): "
          f"{time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    llks = []
    model = trainer.train(
        start=start, state_size=k, n_iters=args.iters, quiet=True,
        callback=lambda i, m: llks.append(m.llk),
        prefetch=args.prefetch,
    )
    elapsed = time.perf_counter() - t0
    sps = N * args.iters / elapsed
    print(f"{args.iters} EM iters at N={N} D={D} k={k} "
          f"{int(miss * 100)}% missing ({args.dtype} storage): "
          f"{elapsed:.1f}s -> {sps / 1e6:.3f}M samples/s/chip "
          f"({elapsed / args.iters:.2f} s/iter)", flush=True)
    if args.host_fed:
        print("host-fed: the timed run contains zero on-device synthetic "
              "regen — this IS the trainer-only number", flush=True)
    else:
        # Every timed iteration regenerates all chunks on device; subtract
        # the measured regen-epoch device time for the trainer-only rate a
        # host-fed stream would see (transfers overlapping compute).
        adj = elapsed - args.iters * t_regen_epoch
        print(f"trainer-only (regen separated): {elapsed:.1f}s - "
              f"{args.iters} x {t_regen_epoch:.2f}s regen = {adj:.1f}s -> "
              f"{N * args.iters / adj / 1e6:.3f}M samples/s/chip", flush=True)
    print(f"llk/N first->last: {llks[0]:.4f} -> {llks[-1]:.4f} "
          f"(sigma {float(model.isotropic_noise):.4f}, true 0.5)", flush=True)
    print(json.dumps({
        "metric": "northstar_streaming_samples_per_sec_per_chip",
        "value": round(sps, 1),
        "unit": f"samples/s/chip (N={N}, D={D}, k={k}, "
                f"{int(miss * 100)}% missing, {args.dtype} storage, "
                f"streamed {args.n_chunks}x{B}-row chunks, "
                f"prefetch={args.prefetch}, "
                f"{'host-fed' if args.host_fed else 'device-regen'}, "
                f"{args.iters} EM iters)",
        "elapsed_s": round(elapsed, 1),
        "regen_epoch_s": round(t_regen_epoch, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
