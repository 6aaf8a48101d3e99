#!/bin/bash
# One-shot TPU measurement batch for the round-3 perf decisions:
#   (a) the slab-wedge statistics flags (s_slab_stats / g_slab_inputs) A/B
#       across masked / mix / pat / patmix paths,
#   (b) bf16 value storage A/B (marginal + end-to-end),
#   (c) the e2e-vs-marginal gap at the headline N=1M,
# plus the verify-skill TPU example. Run from /root/repo with the tunnel up.
#
# HISTORICAL: this batch ran 2026-08-19 (logs/round4_tpu_batch.log) and the
# slab defaults were flipped ON in config.py as a result. Bare `python ...`
# arms below are therefore no longer slab-OFF baselines; for a meaningful
# re-run use tools/round3_tpu_reduced.sh, whose arms pin both flags
# explicitly via PPCA_RS_TPU_NO_* / PPCA_RS_TPU_* env vars.
set -x
cd /root/repo
# hw check FIRST (MANDATORY before trusting slab flags: interpret mode
# zero-fills scratch, hardware leaves the dead G wedge as stale VMEM)
timeout 900 python tools/slab_hw_check.py 2>&1 | tail -6
timeout 900 python bench.py 2>&1 | tail -3
# 20-iter run: (elapsed_20 - elapsed_10)/10 = the true per-iter marginal
# THROUGH iterate_n, to localize the e2e-vs-marginal gap (fixed dispatch/
# fetch cost vs per-iteration scan overhead vs microbench optimism).
timeout 900 python bench.py --iters 20 2>&1 | tail -3
timeout 900 python tools/em_microbench.py --path masked --n 1048576 --reps 2 2>&1 | tail -2
timeout 900 env PPCA_RS_TPU_S_SLAB_STATS=1 python tools/em_microbench.py --path masked --n 1048576 --reps 2 2>&1 | tail -2
timeout 900 env PPCA_RS_TPU_G_SLAB_INPUTS=1 python tools/em_microbench.py --path masked --n 1048576 --reps 2 2>&1 | tail -2
timeout 900 env PPCA_RS_TPU_G_SLAB_INPUTS=1 PPCA_RS_TPU_S_SLAB_STATS=1 python tools/em_microbench.py --path masked --n 1048576 --reps 2 2>&1 | tail -2
timeout 900 python tools/em_microbench.py --path masked --n 1048576 --reps 2 --dtype bfloat16 2>&1 | tail -2
timeout 900 env PPCA_RS_TPU_S_SLAB_STATS=1 python tools/em_microbench.py --path masked --n 1048576 --reps 2 --dtype bfloat16 2>&1 | tail -2
timeout 900 python bench.py --dtype bfloat16 2>&1 | tail -3
timeout 900 env PPCA_RS_TPU_S_SLAB_STATS=1 python bench.py 2>&1 | tail -3
PYTHONPATH=/root/repo:$PYTHONPATH timeout 900 python examples/toy_model.py 2>&1 | grep -viE '^warning|xla_bridge' | tail -5
# fused-mixture twins of the slab flags (D=512/k=32/M=8 headline config)
timeout 900 python tools/em_microbench.py --path mix --reps 2 2>&1 | tail -2
timeout 900 env PPCA_RS_TPU_S_SLAB_STATS=1 python tools/em_microbench.py --path mix --reps 2 2>&1 | tail -2
timeout 900 env PPCA_RS_TPU_G_SLAB_INPUTS=1 python tools/em_microbench.py --path mix --reps 2 2>&1 | tail -2
timeout 900 env PPCA_RS_TPU_G_SLAB_INPUTS=1 PPCA_RS_TPU_S_SLAB_STATS=1 python tools/em_microbench.py --path mix --reps 2 2>&1 | tail -2
# mixture slabs at k=64 (bigger wedge savings; g_slab needs k>16)
timeout 900 python tools/em_microbench.py --path mix --k 64 --reps 2 2>&1 | tail -2
timeout 900 env PPCA_RS_TPU_G_SLAB_INPUTS=1 PPCA_RS_TPU_S_SLAB_STATS=1 python tools/em_microbench.py --path mix --k 64 --reps 2 2>&1 | tail -2
# pattern-mixture Souter slab (s_slab only; table-based path, no kernel Gram)
timeout 900 python tools/em_microbench.py --path patmix --reps 2 2>&1 | tail -2
timeout 900 env PPCA_RS_TPU_S_SLAB_STATS=1 python tools/em_microbench.py --path patmix --reps 2 2>&1 | tail -2
# single-model pattern path Souter slab (the 134 MB/block outer_s temp)
timeout 900 python tools/em_microbench.py --path pat --reps 2 2>&1 | tail -2
timeout 900 env PPCA_RS_TPU_S_SLAB_STATS=1 python tools/em_microbench.py --path pat --reps 2 2>&1 | tail -2
