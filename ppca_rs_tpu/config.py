"""Global configuration knobs for ppca_rs_tpu.

The reference library (viodotcom/ppca_rs) has no config system — everything is
plain function arguments (see SURVEY.md §5).  We keep that philosophy: the only
things configured here are TPU-performance knobs that have no counterpart in the
reference API and sensible defaults everywhere.
"""

from __future__ import annotations

import dataclasses
import os


@dataclasses.dataclass
class Config:
    #: Number of samples processed per scan step inside the blocked EM/llk
    #: reductions.  Bounds peak memory of the (block, D) and (block, k*k)
    #: temporaries.  Must be a power of two.
    block_size: int = 8192

    #: jax.lax matmul precision for the hot contractions.  "auto" (default)
    #: picks bf16-pass "default" matmuls (~1.5x faster end-to-end) when the
    #: output dimension is >= 512 and full-f32 "highest" below.  The error is
    #: dominated by cancellation in the llk quadratic form near convergence
    #: (quad = |r|^2 - b^T M^-1 b with a small difference of large terms):
    #: measured same-model llk deviation vs "highest" is ~1e-2 at D<=200,
    #: ~2.5e-3 at D=1024 with small noise, ~1e-4 at D=1024 with sigma~1.
    #: EM *convergence* is unaffected either way (the M-step is a fixed-point
    #: ratio of weighted sums) — only reported llk/posterior values degrade.
    #: Set "default"/"high"/"highest" to force; CPU f64 runs are unaffected.
    matmul_precision: str = "auto"

    #: Use the fused Pallas E-step kernel when running on TPU (falls back to
    #: the pure-XLA path automatically elsewhere or when False).
    use_pallas: bool = True

    #: Use the native C++ host-side packing extension when available.
    use_native: bool = True

    #: Compute the fused mixture EM's per-component residual norms from a
    #: materialized (M, block, D) residual instead of the lane-major expanded
    #: quadratic |md0|^2 - 2 md0.dm + mask.dm^2.  The expanded form's f32
    #: cancellation error grows ~O(mean_separation^2 / sigma^2) relative
    #: (measured dev_sq ~7e-4 and llk ~1.6e-4 rel vs f64 at separation 300
    #: with residual 0.5); the materialized form is immune but costs the
    #: (M, block, D) temporary the fast path exists to avoid.  Leave False
    #: unless component means are separated by >> 100x the noise scale and
    #: exact llk/noise values matter more than EM speed (EM *convergence* is
    #: unaffected either way).
    mix_exact_rnorm: bool = False

    #: Contract the M-step S statistic against only the VALID block-wedge of
    #: the kernel's want="fullt" second moments (row-blocks [r0:r1) of SM
    #: hold valid entries in cols [:r1] only — the strict upper wedge beyond
    #: the diagonal block is garbage em_finalize discards anyway).  Slab
    #: dot_generals cut that contraction's flops and the SM HBM re-read to
    #: ~0.6x at k=64.  Only affects the kernel-routed masked em_stats path;
    #: numerics are exactly the tril+tril^T semantics either way.
    #: Default ON since the round-4 v5e A/B (logs/round4_tpu_batch.log):
    #: masked D=1024/k=64/N=1M marginal 3.54 -> 3.81M samples/s alone,
    #: 4.09M combined with g_slab_inputs (+15.5%); patmix +13.9%; pat +1.2%;
    #: the one soft spot is fused-mix k=32 (-2% alone, still +5% combined).
    s_slab_stats: bool = True

    #: Feed the fused kernel's Gram input as wedge SLABS (kernels.g_slabs):
    #: the kernel only reads the dim1 >= dim0 wedge of G, so the Gram
    #: matmul computes and writes only that wedge (~0.6x flops + HBM write
    #: at k=64) and the kernel DMAs each slab to its static A region.
    #: Requires k % 8 == 0; only affects kernel-routed masked paths.
    #: Default ON since the round-4 v5e A/B: masked marginal +6.6% alone,
    #: +15.5% with s_slab_stats; fused mix k=32 +6.9%, k=64 +7.4% combined.
    g_slab_inputs: bool = True

    #: Route state sizes past the fused kernel's VMEM ceiling through the
    #: blocked Schur-complement inverse (ops/block_spd.py): batched MXU
    #: matmuls + Pallas base blocks, size-generic in k.  When False those
    #: sizes fall back to XLA batched Cholesky (~15-50x slower on TPU).
    use_blocked_large_k: bool = True

    #: Mask-pattern deduplication: when a dataset has P distinct mask
    #: patterns with P << N (structured missingness), per-sample
    #: factorizations collapse to a P-sized table (ops/pattern_dedup.py).
    use_pattern_dedup: bool = True

    #: Pattern-path E-step restructure (ops/pattern_dedup.py): (a) compute
    #: the posterior states via ONE (B, k) x (k, P*k) MXU matmul against the
    #: whole Sigma table + a per-row gather instead of gathering a (B, k^2)
    #: per-sample Sigma (the gather materializes 16 KB/sample of HBM
    #: traffic each way at k=64 — the dominant cost of the path); engages
    #: when P * k is small enough that the (B, P, k) candidate temporary
    #: beats the gather.  (b) accumulate the mean-update correction
    #: pattern-grouped: mask^T (s w) == patterns^T (onehot^T (s w)), an
    #: exact sum reordering that removes a (D, B) x (B, k) matmul and a
    #: full mask re-read per block.  Both are algebraically exact.
    #: Default ON from the round-4h v5e A/B (logs/r4h_arm*.log): single-
    #: model pattern EM marginal 33.96 -> 17.20 ms/iter (P=32, D=1024,
    #: k=64, 262k rows; 7.72 -> 15.24M samples/s, +97%), pattern-mixture
    #: 241.5 -> 137.7 ms/iter (M=8, same shapes; +75%); neutral at P=128
    #: where the candidates matmul hands back to the gather.  Opt out with
    #: PPCA_RS_TPU_NO_PAT_GROUPED.
    pat_grouped_estep: bool = True

    #: Sorted-segment pattern EM (ops/pattern_dedup.em_stats_sorted): rows
    #: are grouped by mask pattern ONCE per dataset (host argsort of the
    #: detected pattern index; the sorted data copy is cached on the
    #: Dataset), so each segment's mask is a CONSTANT row and the e-step
    #: runs per-segment matmuls: states cost 2k^2 flops/sample instead of
    #: the candidates matmul's 2Pk^2, and the per-pattern outer-product
    #: statistic is a plain segment Gram (2k^2) instead of the one-hot
    #: contraction (2*q*128 effective).  Both pattern paths measured
    #: MXU-flop-bound (see the seg_gram dead end in docs/DESIGN.md), so
    #: this targets exactly the binding constraint.  Costs: one sorted
    #: data copy in HBM (gated by pat_sorted_max_bytes) and a retrace per
    #: dataset (segment offsets are compile-time constants).
    #: Default ON from the round-5 v5e A/B (logs/r5_arm01-06.log):
    #: single-model pattern EM marginal 17.37 -> 4.09 ms/iter (P=32,
    #: D=1024, k=64, 262k rows; 15.09 -> 64.2M samples/s, 4.2x),
    #: pattern-mixture 137.7 (r4h grouped control; the r5 control arm hit
    #: its compile timeout) -> 17.17 ms/iter (M=8, same shapes; 8.0x),
    #: and P=128 single-model 36.60 -> 7.72 ms (4.7x, compile 45.7 s —
    #: the unrolled segment program scales fine to P=128).  Opt out with
    #: PPCA_RS_TPU_NO_PAT_SORTED.
    pat_sorted_estep: bool = True

    #: Do not build the sorted-by-pattern data copy past this size (it
    #: doubles the dataset's HBM footprint while training).
    pat_sorted_max_bytes: int = 4 << 30

    #: Upper bound on P for the sorted-segment path: each pattern adds an
    #: unrolled segment scan to the compiled EM step, so very fragmented
    #: masks would bloat the program for shrinking per-segment wins.
    pat_sorted_max_p: int = 256

    #: Require N / P >= this many rows per segment (on average) before the
    #: sorted path engages.  Tiny segments lose twice: per-segment matmuls
    #: stop amortizing, and the O(P)-segment unrolled program explodes
    #: compile size (a ~200-pattern/2000-row random-mask dataset produced a
    #: program big enough to SEGFAULT the XLA:CPU compiler under suite
    #: memory pressure — test_bf16_storage_pipeline, round 5).  The v5e
    #: A/B's smallest measured winning config is 2048 rows/segment (P=128
    #: at 262k rows, 4.7x); 512 keeps a 4x safety margin while blocking
    #: the fragmented-mask regime.  Below the gate the grouped pattern
    #: path (pat_grouped_estep) carries the workload.
    pat_sorted_min_rows: int = 512

    #: Upper bound on P for the dedup path (table memory is P * k^2 and the
    #: final assembly is a (D, P) contraction).
    pattern_max: int = 4096

    #: Require P * pattern_min_ratio <= N before switching to the dedup path
    #: (below that the general masked path wins).
    pattern_min_ratio: int = 4


config = Config()

def _env_flag(name: str) -> bool:
    """True when the env var is set to anything but an explicit falsey value
    ("", "0", "false", "no", "off" — case-insensitive). Guards the NO_*
    opt-outs against the double-negative foot-gun NO_X=0 reading as opt-out."""
    return os.environ.get(name, "").strip().lower() not in ("", "0", "false", "no", "off")


if _env_flag("PPCA_RS_TPU_NO_PALLAS"):
    config.use_pallas = False
if _env_flag("PPCA_RS_TPU_NO_NATIVE"):
    config.use_native = False
if _env_flag("PPCA_RS_TPU_NO_BLOCKED_LARGE_K"):
    config.use_blocked_large_k = False
if _env_flag("PPCA_RS_TPU_S_SLAB_STATS"):
    config.s_slab_stats = True
if _env_flag("PPCA_RS_TPU_G_SLAB_INPUTS"):
    config.g_slab_inputs = True
if _env_flag("PPCA_RS_TPU_NO_S_SLAB_STATS"):
    config.s_slab_stats = False
if _env_flag("PPCA_RS_TPU_NO_G_SLAB_INPUTS"):
    config.g_slab_inputs = False
if _env_flag("PPCA_RS_TPU_NO_PAT_GROUPED"):
    config.pat_grouped_estep = False
if _env_flag("PPCA_RS_TPU_PAT_SORTED"):
    config.pat_sorted_estep = True
if _env_flag("PPCA_RS_TPU_NO_PAT_SORTED"):
    config.pat_sorted_estep = False
if _env_flag("PPCA_RS_TPU_MIX_EXACT_RNORM"):
    config.mix_exact_rnorm = True
if os.environ.get("PPCA_RS_TPU_MATMUL_PRECISION"):
    config.matmul_precision = os.environ["PPCA_RS_TPU_MATMUL_PRECISION"]


def block_size_for(n: int, k: int = 0, m: int = 1) -> int:
    """Pick the scan block size for an N-sample reduction: the configured block
    size, shrunk to the smallest power of two >= n for small inputs so tiny
    datasets don't pay for an 8k-row pad.

    When the state size ``k`` is given and exceeds the fused kernel's
    "full" ceiling (the blocked Schur-inverse regime, ops/block_spd.py),
    the block is also shrunk so the ~4 live (m * block, k, k) f32
    temporaries (M, M^{-1}, Sigma, SM) stay within ~2 GiB — at k = 512 an
    8192-row block would otherwise hold 8 GiB PER temporary.  Mixtures
    pass ``m`` = number of components: their per-block problems stack all
    M components, so the bound must count M * block rows."""
    b = config.block_size
    if k:
        from .ops import kernels  # lazy: config must import before ops

        if k > kernels.max_k("full"):
            while b > 128 and max(1, m) * b * k * k * 16 > (2 << 30):
                b //= 2
    while b >= 2 * max(n, 1):
        b //= 2
    return max(b, 8)
