#!/bin/bash
# Round-5 TPU job queue — serialized (relay contention distorts timings).
# Run: bash benchmarks/queue_r5.sh >> /tmp/queue_r5.log 2>&1
# Completed earlier this round (artifacts committed):
#   leakgan_stabilizer_sweep       -> leakgan_stabilizer_sweep_r5.json
#   leakgan_mle_ceiling            -> leakgan_mle_ceiling_r5.json
#   leakgan_earlystop_adv (x2)     -> leakgan_earlystop_adv{,_dg}_r5.json
#   hbm_rings stream-shape A/B     -> hbm_rings_shapes_ab_r5.json
#   ae_kernel_gates (trained)      -> ae_kernel_gates_r5.json
#   composed_capacity_validation   -> composed_capacity_r5.json
set -u
cd /root/repo
mkdir -p benchmarks/artifacts

echo "=== queue_r5 start $(date -u +%FT%TZ) ==="

echo "--- [1/3] train_gemm_ab (skip_block variants, VERDICT r4 #7) $(date -u +%FT%TZ)"
timeout 3000 python -m benchmarks.train_gemm_ab \
  > /tmp/train_gemm_ab_r5.json 2> /tmp/train_gemm_ab_r5.err
rc=$?
echo "train_gemm_ab rc=$rc"
tail -c 400 /tmp/train_gemm_ab_r5.json
if [ $rc -eq 0 ] && [ -s /tmp/train_gemm_ab_r5.json ]; then
  cp /tmp/train_gemm_ab_r5.json benchmarks/artifacts/train_gemm_ab_r5.json
fi

echo "--- [2/3] cli_journey_run (VERDICT r4 #5) $(date -u +%FT%TZ)"
timeout 3600 python -m benchmarks.cli_journey_run \
  --out benchmarks/artifacts/cli_journey_r5.json \
  > /tmp/cli_journey_r5.json 2> /tmp/cli_journey_r5.err
echo "cli_journey rc=$?"
tail -c 800 /tmp/cli_journey_r5.json

echo "--- [3/3] bench.py (round-5 local capture) $(date -u +%FT%TZ)"
timeout 1200 python bench.py > /tmp/bench_r5_local.json 2> /tmp/bench_r5_local.err
rc=$?
echo "bench rc=$rc"
tail -c 400 /tmp/bench_r5_local.json
if [ $rc -eq 0 ] && [ -s /tmp/bench_r5_local.json ]; then
  cp /tmp/bench_r5_local.json benchmarks/artifacts/bench_r5_local.json
fi

echo "=== queue_r5 done $(date -u +%FT%TZ) ==="
