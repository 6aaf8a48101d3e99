"""Fused EM megakernel (ops/estep_fused.py) vs the XLA em_stats path.

Interpret mode, so CI validates the exact kernel that runs on TPU.  The
kernel's matmuls use bfloat16 operands (the same precision class the XLA
path picks on TPU for D >= 512), so tolerances against the f32 XLA
reference are bf16-level (~2e-3 relative); mask-only quantities (totals,
d_obs) are exact because 0/1 masks round-trip bf16 exactly.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from ppca_rs_tpu.ops import estep_fused
from ppca_rs_tpu.ops import masked_linalg as ml


def rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.abs(a - b).max() / (np.abs(b).max() + 1e-12)


def run_both(rng, B, D, k, block_size, weights=None, empty_rows=(3,)):
    C = jnp.asarray(rng.normal(size=(D, k)), jnp.float32)
    mean = jnp.asarray(rng.normal(size=D), jnp.float32)
    sig = jnp.float32(0.7)
    data = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    mask = jnp.asarray(rng.random((B, D)) > 0.4)
    for r in empty_rows:
        mask = mask.at[r].set(False)
    data = jnp.where(mask, data, 0.0)
    mf = mask.astype(jnp.float32)
    if weights is None:
        w = jnp.ones(B, jnp.float32)
    else:
        w = jnp.asarray(weights, jnp.float32)

    stats = ml.em_stats(C, mean, sig, data, mask, w, block_size=block_size)
    CC = ml.outer_flat(C)
    out = estep_fused.em_block(
        C, C.T, CC.T, mean[None, :], sig, w, data, mf, interpret=True
    )
    return stats, out


@pytest.mark.parametrize("k", [8, 13, 32])
def test_fused_matches_xla(rng, k):
    stats, out = run_both(rng, B=256, D=128, k=k, block_size=128)
    cross, S, totals, tdev, llk, sq_err, dev_sq = out
    assert rel(cross.T, stats.cross) < 1e-2
    assert rel(S.T, stats.S) < 1e-2
    assert rel(totals, stats.totals) < 1e-6
    assert rel(tdev, stats.total_dev) < 1e-2
    assert abs(float(llk) - float(stats.llk)) / abs(float(stats.llk)) < 1e-4
    assert rel(sq_err, stats.square_error) < 1e-4
    assert rel(dev_sq, stats.dev_sq) < 1e-3


def test_fused_weighted_and_empty_rows(rng):
    """Zero-weight rows and all-masked rows are exactly neutral."""
    B = 256
    w = np.asarray(rng.random(B) + 0.25, np.float32)
    w[3] = 0.0   # zero weight on the empty row: the padding invariant
    w[100] = 0.0
    stats, out = run_both(
        rng, B=B, D=128, k=16, block_size=128, weights=w, empty_rows=(3, 7)
    )
    cross, S, totals, tdev, llk, sq_err, dev_sq = out
    assert rel(cross.T, stats.cross) < 1e-2
    assert rel(S.T, stats.S) < 1e-2
    assert rel(totals, stats.totals) < 1e-6
    assert abs(float(llk) - float(stats.llk)) / abs(float(stats.llk)) < 1e-4


def test_fused_per_lane_sigma(rng):
    """(1, B) per-lane sigma matches two scalar-sigma calls spliced."""
    B, D, k = 256, 64, 8
    C = jnp.asarray(rng.normal(size=(D, k)), jnp.float32)
    mean = jnp.zeros(D, jnp.float32)
    data = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    mask = jnp.asarray(rng.random((B, D)) > 0.3)
    data = jnp.where(mask, data, 0.0)
    mf = mask.astype(jnp.float32)
    w = jnp.ones(B, jnp.float32)
    CC = ml.outer_flat(C)

    sig_lanes = jnp.where(jnp.arange(B) < B // 2, 0.4, 1.3).astype(jnp.float32)
    out = estep_fused.em_block(
        C, C.T, CC.T, mean[None, :], sig_lanes[None, :], w, data, mf,
        interpret=True,
    )
    # reference: run each half with its scalar sigma
    outs = []
    for lo, hi, s in ((0, B // 2, 0.4), (B // 2, B, 1.3)):
        outs.append(estep_fused.em_block(
            C, C.T, CC.T, mean[None, :], jnp.float32(s), w[lo:hi],
            data[lo:hi], mf[lo:hi], interpret=True,
        ))
    for i, name in [(0, "cross"), (1, "S"), (2, "totals"), (3, "tdev")]:
        want = np.asarray(outs[0][i]) + np.asarray(outs[1][i])
        assert rel(out[i], want) < 1e-5, name
    for i in (4, 5, 6):   # llk, sq_err, dev_sq scalars
        want = float(outs[0][i]) + float(outs[1][i])
        assert abs(float(out[i]) - want) <= 1e-4 * max(1.0, abs(want))


def test_supported_gate():
    assert estep_fused.supported(1024, 64, 8192, jnp.float32)
    assert estep_fused.supported(512, 32, 8192, jnp.float32)
    assert not estep_fused.supported(1000, 64, 8192, jnp.float32)  # D not lane-aligned
    assert not estep_fused.supported(1024, 64, 8000, jnp.float32)  # block not aligned
    assert not estep_fused.supported(1024, 0, 8192, jnp.float32)   # k=0
    assert not estep_fused.supported(1024, 64, 8192, jnp.float64)
    assert not estep_fused.supported(1024, 192, 8192, jnp.float32)  # VMEM budget
