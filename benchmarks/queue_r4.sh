#!/bin/bash
# Round-4 TPU job queue — serialized (relay contention distorts timings).
# Run: bash benchmarks/queue_r4.sh >> /tmp/queue_r4.log 2>&1
# Completed earlier this round (artifacts committed):
#   bench.py            -> benchmarks/artifacts/bench_r4_local.json
#   train_gemm_ab       -> benchmarks/artifacts/train_gemm_ab_r4.json
#   _hw_perstream_compile_check -> ok (bitwise, 16 streams)
set -u
cd /root/repo
mkdir -p benchmarks/artifacts

echo "=== queue_r4 start $(date -u +%FT%TZ) ==="

echo "--- [1/2] ae_session_validation $(date -u +%FT%TZ)"
timeout 3600 python -m benchmarks.ae_session_validation > /tmp/ae_session_val_r4.json 2> /tmp/ae_session_val_r4.err
rc=$?
echo "ae_session_validation rc=$rc"
cat /tmp/ae_session_val_r4.json
if [ $rc -eq 0 ] && [ -s /tmp/ae_session_val_r4.json ]; then
  cp /tmp/ae_session_val_r4.json benchmarks/artifacts/ae_session_val_r4.json
fi

echo "--- [2/2] leakgan_quality_run --interleave 1 --early-stop 6 $(date -u +%FT%TZ)"
timeout 14400 python -m benchmarks.leakgan_quality_run \
  --interleave 1 --early-stop 6 \
  --out benchmarks/artifacts/leakgan_quality_r4 \
  > /tmp/leakgan_quality_r4.json 2> /tmp/leakgan_quality_r4.err
echo "leakgan_quality rc=$?"
tail -c 2000 /tmp/leakgan_quality_r4.json

echo "=== queue_r4 done $(date -u +%FT%TZ) ==="
