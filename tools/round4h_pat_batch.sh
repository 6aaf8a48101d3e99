#!/bin/bash
# Round-4h decision batch: pat_grouped_estep A/B (pattern-grouped e-step —
# candidates matmul for the per-sample Sigma gather + pattern-grouped mask
# corrections) at the microbench marginals.  Preflight: make tpu-check must
# have passed in THIS session before trusting these numbers (hardware parity
# for all Pallas paths; interpret mode cannot catch stale-VMEM bugs).
set -x
cd /root/repo
mkdir -p logs
arm=0
R() {
  arm=$((arm + 1))
  timeout 900 "$@" 2>&1 | tee "logs/r4h_arm$(printf %02d $arm).log" | tail -2
}
OFF=PPCA_RS_TPU_NO_PAT_GROUPED=1
# single-model pattern path (P=32, D=1024, k=64)
R env $OFF python tools/em_microbench.py --path pat --reps 2
R python tools/em_microbench.py --path pat --reps 2
# pattern-mixture path (M=8, P=32, D=1024, k=64)
R env $OFF python tools/em_microbench.py --path patmix --reps 2
R python tools/em_microbench.py --path patmix --reps 2
# higher pattern count: P=128 exercises the P*k > _SALL_MAX_PK gather branch
# for the sall piece while the grouped mask corrections still engage
R env $OFF python tools/em_microbench.py --path pat --p 128 --reps 2
R python tools/em_microbench.py --path pat --p 128 --reps 2
