#!/bin/bash
# Reduced round-3 A/B batch at the microbench default N=262144 (the N=1M
# variants compile 831 s/arm over the tunnel -- unusable; the N=1M
# e2e-vs-marginal question was already answered by bench.py --iters 20:
# per-iter marginal 281 ms == microbench 287 ms, gap is fixed dispatch).
set -x
cd /root/repo
mkdir -p logs
# Preflight: slab flags are only trustworthy after a hardware parity check
# on THIS chip/tunnel (interpret mode zero-fills scratch; hardware leaves
# the dead G wedge as stale VMEM). Round-3e recorded parity OK, but a new
# session must re-stamp it.
timeout 900 python tools/slab_hw_check.py 2>&1 | tee logs/slab_hw_check.log | tail -6
arm=0
R() {
  # full output lands in logs/armNN.log so failures stay diagnosable
  arm=$((arm + 1))
  timeout 600 "$@" 2>&1 | tee "logs/arm$(printf %02d $arm).log" | tail -2
}
# NOTE: config.py now DEFAULTS both slab flags ON (round-4 decision,
# logs/round4_tpu_batch.log), so every arm pins BOTH flags explicitly —
# a bare `python ...` is no longer a slab-OFF baseline.
OFF_S=PPCA_RS_TPU_NO_S_SLAB_STATS=1
OFF_G=PPCA_RS_TPU_NO_G_SLAB_INPUTS=1
ON_S=PPCA_RS_TPU_S_SLAB_STATS=1
ON_G=PPCA_RS_TPU_G_SLAB_INPUTS=1
# masked slab A/B
R env $OFF_S $OFF_G python tools/em_microbench.py --path masked --reps 2
R env $ON_S $OFF_G python tools/em_microbench.py --path masked --reps 2
R env $OFF_S $ON_G python tools/em_microbench.py --path masked --reps 2
R env $ON_S $ON_G python tools/em_microbench.py --path masked --reps 2
# fused mixture slab A/B (D=512/k=32/M=8)
R env $OFF_S $OFF_G python tools/em_microbench.py --path mix --reps 2
R env $ON_S $OFF_G python tools/em_microbench.py --path mix --reps 2
R env $OFF_S $ON_G python tools/em_microbench.py --path mix --reps 2
R env $ON_S $ON_G python tools/em_microbench.py --path mix --reps 2
# pattern paths (s_slab only)
R env $OFF_S $OFF_G python tools/em_microbench.py --path pat --reps 2
R env $ON_S $OFF_G python tools/em_microbench.py --path pat --reps 2
R env $OFF_S $OFF_G python tools/em_microbench.py --path patmix --reps 2
R env $ON_S $OFF_G python tools/em_microbench.py --path patmix --reps 2
# bf16 storage marginal (current defaults)
R python tools/em_microbench.py --path masked --reps 2 --dtype bfloat16
# mixture at k=64 (bigger wedge)
R env $OFF_S $OFF_G python tools/em_microbench.py --path mix --k 64 --reps 2
R env $ON_S $ON_G python tools/em_microbench.py --path mix --k 64 --reps 2
