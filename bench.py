"""Benchmark: fused EM iteration throughput on the BASELINE workload.

Workload (BASELINE.json): D=1024, state_size=64, 50% missing entries, f32.
N defaults to 1M samples (fits a single v5e chip's HBM; the 10M north-star
config is the same program sample-sharded over a v5e-8 mesh).

Prints ONE JSON line:
  {"metric": "em_estep_samples_per_sec_per_chip", "value": ..., "unit": ...,
   "vs_baseline": ...}

vs_baseline: the reference publishes no numbers (BASELINE.md), so the
baseline is an estimated 64-core CPU throughput of the reference's EM:
a single-core vectorized NumPy implementation of the identical blocked
E+M step is timed on a small slab and scaled by 64 (the north-star CPU).
"""

import argparse
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def numpy_em_throughput(D, k, n=2048, block=512):
    """Single-core NumPy twin of the fused EM pass; returns samples/sec."""
    rng = np.random.default_rng(0)
    C = rng.normal(size=(D, k)).astype(np.float32)
    mean = np.zeros(D, dtype=np.float32)
    sigma2 = 1.0
    data = rng.normal(size=(n, D)).astype(np.float32)
    mask = (rng.random((n, D)) < 0.5).astype(np.float32)
    w = np.ones(n, dtype=np.float32)

    CC = (C[:, :, None] * C[:, None, :]).reshape(D, k * k)
    start = time.perf_counter()
    cross = np.zeros((D, k), dtype=np.float32)
    S = np.zeros((D, k * k), dtype=np.float32)
    for i in range(0, n, block):
        d, m, wb = data[i : i + block], mask[i : i + block], w[i : i + block]
        R = m * (d - mean)
        b = R @ C
        M = (m @ CC).reshape(-1, k, k) + sigma2 * np.eye(k, dtype=np.float32)
        L = np.linalg.cholesky(M)
        s = np.linalg.solve(M, b[..., None])[..., 0]
        Sigma = sigma2 * np.linalg.inv(M)
        SM = (s[:, :, None] * s[:, None, :] + Sigma).reshape(-1, k * k)
        cross += (R * wb[:, None]).T @ s
        S += (m * wb[:, None]).T @ SM
        _ = m * (d - s @ C.T - mean)
        _ = np.log(np.diagonal(L, axis1=-2, axis2=-1)).sum()
    np.linalg.solve(S.reshape(D, k, k) + 1e-6 * np.eye(k), cross[..., None])
    elapsed = time.perf_counter() - start
    return n / elapsed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=1024)
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--missing", type=float, default=0.5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from ppca_rs_tpu.ops import masked_linalg as ml

    n_chips = len(jax.devices())
    log(f"devices: {jax.devices()}")

    D, k, N = args.d, args.k, args.n
    block = 8192

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    C = jax.random.normal(k1, (D, k), dtype=jnp.float32)
    mean = jnp.zeros((D,), dtype=jnp.float32)
    sigma = jnp.asarray(1.0, dtype=jnp.float32)

    @jax.jit
    def gen(k2, k3, C):
        kz, ke = jax.random.split(k2)
        z = jax.random.normal(kz, (N, k), dtype=jnp.float32)
        eps = jax.random.normal(ke, (N, D), dtype=jnp.float32)
        data = z @ C.T + 0.5 * eps
        mask = jax.random.bernoulli(k3, 1.0 - args.missing, (N, D))
        return jnp.where(mask, data, 0.0), mask

    data, mask = gen(k2, k3, C)
    weights = jnp.ones((N,), dtype=jnp.float32)
    jax.block_until_ready(data)
    log(f"data ready: {data.shape} {data.dtype}")

    @jax.jit
    def em_step(C, mean, sigma, data, mask, weights):
        stats = ml.em_stats(C, mean, sigma, data, mask, weights, block_size=block)
        new_C, new_mean, new_sigma = ml.em_finalize(
            C, mean, sigma, stats, transformation_precision=jnp.asarray(0.0, jnp.float32)
        )
        return new_C, new_mean, new_sigma, stats.llk

    # warmup / compile
    t0 = time.perf_counter()
    out = em_step(C, mean, sigma, data, mask, weights)
    jax.block_until_ready(out)
    log(f"compile+first iter: {time.perf_counter() - t0:.2f}s, llk={float(out[3]):.4g}")

    C_, mean_, sigma_ = out[0], out[1], out[2]
    t0 = time.perf_counter()
    for _ in range(args.iters):
        C_, mean_, sigma_, llk = em_step(C_, mean_, sigma_, data, mask, weights)
    jax.block_until_ready((C_, mean_, sigma_))
    elapsed = time.perf_counter() - t0
    iters_per_sec = args.iters / elapsed
    samples_per_sec = N * args.iters / elapsed / n_chips
    log(
        f"{args.iters} EM iters in {elapsed:.3f}s -> {iters_per_sec:.3f} iters/s, "
        f"{samples_per_sec:.3e} samples/s/chip, final llk={float(llk):.6g}"
    )

    # baseline estimate: single-core numpy x 64 cores
    np_sps = numpy_em_throughput(D, k)
    baseline = np_sps * 64.0
    log(f"numpy single-core: {np_sps:.3e} samples/s -> 64-core baseline {baseline:.3e}")

    print(
        json.dumps(
            {
                "metric": "em_estep_samples_per_sec_per_chip",
                "value": round(samples_per_sec, 1),
                "unit": f"samples/s/chip (fused EM iter, D={D}, k={k}, N={N}, {int(args.missing*100)}% missing, f32)",
                "vs_baseline": round(samples_per_sec * n_chips / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
