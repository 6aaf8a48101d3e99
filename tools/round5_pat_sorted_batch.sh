#!/bin/bash
# Round-5 decision batch: pat_sorted_estep A/B (sorted-by-pattern segment
# EM — per-segment constant-mask matmuls replace the candidates matmul and
# the one-hot Souter contraction; 2k^2 flops/sample on both).
# Preflight: make tpu-check must have passed in THIS session before
# trusting these numbers (hardware parity for all Pallas paths; interpret
# mode cannot catch stale-VMEM bugs).
set -x
cd /root/repo
mkdir -p logs
arm=0
R() {
  arm=$((arm + 1))
  timeout 1200 "$@" 2>&1 | tee "logs/r5_arm$(printf %02d $arm).log" | tail -2
}
# single-model pattern path (P=32, D=1024, k=64): grouped control vs sorted
R python tools/em_microbench.py --path pat --reps 2
R python tools/em_microbench.py --path pat_sorted --reps 2
# pattern-mixture path (M=8, P=32, D=1024, k=64)
R python tools/em_microbench.py --path patmix --reps 2
R python tools/em_microbench.py --path patmix_sorted --reps 2
# higher pattern count: P=128 checks compile-size/perf scaling of the
# unrolled per-segment program (pat_sorted_max_p gate calibration)
R python tools/em_microbench.py --path pat --p 128 --reps 2
R python tools/em_microbench.py --path pat_sorted --p 128 --reps 2
