#!/bin/bash
# Round-4 follow-up TPU batch: measurements with the slab defaults FLIPPED ON
# (config.py s_slab_stats=True, g_slab_inputs=True after the A/B in
# logs/round4_tpu_batch.log).
#
#   1. slab_hw_check preflight (MANDATORY before trusting slab numbers)
#   2. bench.py f32          -> the new recorded headline
#   3. bench.py bfloat16     -> the bf16-headline decision (first bf16+slab e2e)
#   4. northstar_10m.py      -> VERDICT r3 next-step #2, N=10M streaming
set -x
cd /root/repo
mkdir -p logs
R() { name=$1; shift; timeout "$@" 2>&1 | tee "logs/r4f_$name.log" | tail -3; }

R hwcheck 900 python tools/slab_hw_check.py
# bench.py now DEFAULTS to --dtype bfloat16 (f8136ec): the f32 arm must say so
# explicitly or it silently re-measures bf16.
R bench_f32 1800 python bench.py --dtype float32
R bench_bf16 1800 python bench.py --dtype bfloat16
R northstar 3000 python tools/northstar_10m.py
R northstar_bf16 3000 python tools/northstar_10m.py --dtype bfloat16
