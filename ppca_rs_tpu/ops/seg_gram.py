"""Segment-Gram Pallas kernel: pattern-grouped weighted outer-product sums.

DEAD END — measured neutral, kept one commit for history (see
docs/DESIGN.md "The segment-Gram kernel dead end").

The pattern-deduplicated EM paths need, per component,

    Souter[p, (i, j)] = sum_{n : pidx_n = p}  w_n  s_n[i]  s_n[j]

— an order-3 contraction (one-hot x s_i x s_j) with no two-matmul
factoring.  The hypothesis: the XLA formulation must materialize the
per-sample outer products ``outer_s`` as an HBM temporary that the
one-hot matmul re-reads (~2 * 4 * q bytes/sample, q = the
``ml._sm_slabs`` packed wedge width).  This kernel removes the
temporary: per 128-lane tile of samples it builds the wedge outer
products in VMEM (VPU broadcast-multiplies on the lane-major (k, T)
states) and immediately contracts them against the weighted one-hot with
one MXU matmul per slab, accumulating the (q, P) result in a
VMEM-resident output block across the whole batch.

MEASURED (v5e, 262k-row marginals, P=32, D=1024, k=64): pat 17.37 ->
17.79 ms/iter, patmix 137.98 -> 139.64 — neutral.  XLA already fuses the
elementwise outer-product producer into the dot's operand stream; both
pattern paths are MXU-flop-bound, not HBM-bound.  Numerics were exact
(bit-identical to XLA's dot on the single-model path).

Layout notes (all chosen for the MXU's natural NN form):
  * states come in LANE-MAJOR ``(M, k, B)`` (samples on lanes);
  * weights/pattern indices come in SUBLANE-MAJOR ``(M, B, 1)`` / ``(B, 1)``
    so the in-kernel one-hot ``(T, P)`` builds by a lane-iota compare;
  * each slab's matmul is ``(rb*cw, T) x (T, P)`` and its result lands at
    a sublane offset that is a multiple of 8 by construction, so the
    accumulation into the output block is an aligned static slice;
  * the OUTPUT is therefore the TRANSPOSE of the XLA path's Souter:
    ``(M, q, P_pad)``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128

#: Mosaic VMEM allowance ceiling for this kernel (the v5e has 128 MB; keep
#: headroom for Mosaic's own temporaries, same policy as ops/kernels.py).
VMEM_BUDGET = 100 * 1024 * 1024

#: Tests monkeypatch this to engage the kernel on CPU in interpreter mode
#: (jax.default_backend() != "tpu" otherwise gates it off).
_FORCE_INTERPRET = False


def _offsets(ranges):
    offs, q = [], 0
    for r0, r1, cw in ranges:
        offs.append(q)
        q += (r1 - r0) * cw
    return tuple(offs), q


def _vmem_bytes(k: int, ranges, p_pad: int, T: int) -> int:
    _, q = _offsets(ranges)
    lane_pad = -(-p_pad // LANE) * LANE
    part_max = max((r1 - r0) * cw for r0, r1, cw in ranges)
    out_blk = q * lane_pad          # output block, lane-padded in VMEM
    s_blk = 2 * k * T               # double-buffered states
    onehot = T * lane_pad
    temps = 2 * part_max * T + part_max * lane_pad  # outer pieces + matmul out
    return (out_blk + s_blk + onehot + temps) * 4


def supported(k: int, P: int, block_size: int, dtype, ranges) -> bool:
    """Whether this (shape, dtype) fits the kernel: f32, sublane-aligned k,
    lane-aligned batch blocks, and the accumulator within the VMEM budget."""
    if dtype != jnp.float32 and not _FORCE_INTERPRET:
        return False
    if k < 8 or k % 8 != 0 or P < 1:
        return False
    if block_size % LANE != 0:
        return False
    if any((r1 - r0) * cw % 8 != 0 for r0, r1, cw in ranges):
        return False
    p_pad = -(-P // 8) * 8
    return _vmem_bytes(k, tuple(ranges), p_pad, LANE) <= VMEM_BUDGET


def use(k: int, P: int, block_size: int, dtype, ranges) -> bool:
    """Config + backend gate (mirrors masked_linalg._use_kernel's policy)."""
    from ..config import config

    if not (config.use_pallas and config.seg_gram_souter):
        return False
    if not supported(k, P, block_size, dtype, ranges):
        return False
    return _FORCE_INTERPRET or jax.default_backend() == "tpu"


def _kernel_fn(ranges, offs, p_pad, T):
    def body(s_ref, w_ref, p_ref, out_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            out_ref[...] = jnp.zeros_like(out_ref)

        pid = p_ref[:, :]                                       # (T, 1) i32
        lanes = jax.lax.broadcasted_iota(jnp.int32, (T, p_pad), 1)
        zero = jnp.zeros((), w_ref.dtype)
        oh = jnp.where(lanes == pid, w_ref[0], zero)            # (T, p_pad)
        s = s_ref[0]                                            # (k, T)
        for (r0, r1, cw), q0 in zip(ranges, offs):
            # slice first, THEN expand_dims (expand-on-a-sliced-value is the
            # Mosaic-supported order; see ops/kernels.py staircase notes)
            rows = jnp.expand_dims(s[r0:r1], 1)                 # (rb, 1, T)
            cols = jnp.expand_dims(s[:cw], 0)                   # (1, cw, T)
            part = (rows * cols).reshape((r1 - r0) * cw, T)
            acc = jax.lax.dot_general(
                part, oh, (((1,), (0,)), ((), ())),
                preferred_element_type=part.dtype,
            )                                                   # (rb*cw, p_pad)
            out_ref[0, q0:q0 + (r1 - r0) * cw, :] += acc

    return body


@functools.partial(jax.jit, static_argnames=("ranges", "p_pad", "interpret"))
def seg_gram(s_t: jax.Array, w: jax.Array, pidx: jax.Array, *,
             ranges, p_pad: int, interpret: bool = False) -> jax.Array:
    """Pattern-grouped weighted outer-product sums, batch on lanes.

    Args:
      s_t: (M, k, B) posterior states, lane-major (M = 1 for the single
        model; the mixture passes all components in one call).
      w: (M, B) per-sample weights (w * fresh for the single model;
        responsibilities for the mixture — zero weight makes a row inert,
        which is what retires _scan_blocks' stale final-window rows).
      pidx: (B,) integer pattern index in [0, P).
      ranges: static tuple of (r0, r1, cw) row-block slabs of the (k, k)
        outer product to accumulate (ml._sm_slabs(k) wedge, or
        ((0, k, k),) for the full square).
      p_pad: static pattern-axis size (>= max(pidx) + 1, multiple of 8).

    Returns:
      (M, q, p_pad) with q = sum (r1-r0)*cw: the TRANSPOSED Souter —
      out[m, off + (i-r0)*cw + (j-0), p] = sum_{n: pidx_n = p} w[m,n] *
      s_t[m,i,n] * s_t[m,j,n].  Columns [P:p_pad] are exactly zero.
    """
    M, k, B = s_t.shape
    ranges = tuple(tuple(r) for r in ranges)
    offs, q = _offsets(ranges)
    T = LANE
    if B % T != 0:
        raise ValueError(f"batch {B} must be a multiple of {T}")
    if p_pad % 8 != 0:
        raise ValueError(f"p_pad {p_pad} must be a multiple of 8")
    dtype = s_t.dtype
    grid = (M, B // T)

    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=min(
                int(_vmem_bytes(k, ranges, p_pad, T) * 1.3) + (4 << 20),
                128 * 1024 * 1024,
            )
        )
    return pl.pallas_call(
        _kernel_fn(ranges, offs, p_pad, T),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, k, T), lambda m, j: (m, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, 1), lambda m, j: (m, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 1), lambda m, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q, p_pad), lambda m, j: (m, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, q, p_pad), dtype),
        interpret=interpret,
        **kwargs,
    )(s_t, w[:, :, None], pidx.astype(jnp.int32)[:, None])
