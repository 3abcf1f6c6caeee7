#!/bin/sh
# Sequential TPU profiling batch (run when the dev tunnel is healthy):
#   1. phased + Pallas-region decode profiler    -> /tmp/dec3.log
#   2. bench A/B: region vs scatter placement    -> /tmp/bench_place.log
#   3. speculative end-to-end breakdown          -> /tmp/spec3.log
#   4. encode slot-scan ablation                 -> /tmp/abl_enc.log
# Each runs alone (the box A/B rule: compare only within one process;
# the bench A/B is cross-process but both legs use best-of adaptive reps).
cd "$(dirname "$0")/.." || exit 1
stamp() { date -u +%H:%M:%S; }
echo "[$(stamp)] decode3" && python -u tools/profile_decode3.py > /tmp/dec3.log 2>&1
echo "exit=$?" >> /tmp/dec3.log
echo "[$(stamp)] bench place=auto(region)" && JPEG_TPU_PLACE=auto python -u bench.py > /tmp/bench_place.log 2>&1
echo "exit=$?" >> /tmp/bench_place.log
echo "[$(stamp)] bench place=scatter" && JPEG_TPU_PLACE=scatter python -u bench.py >> /tmp/bench_place.log 2>&1
echo "exit=$?" >> /tmp/bench_place.log
echo "[$(stamp)] dense" && python -u tools/profile_dense.py > /tmp/dense.log 2>&1
echo "exit=$?" >> /tmp/dense.log
echo "[$(stamp)] spec" && python -u tools/profile_spec.py > /tmp/spec3.log 2>&1
echo "exit=$?" >> /tmp/spec3.log
echo "[$(stamp)] ablate_encode" && python -u tools/ablate_encode.py > /tmp/abl_enc.log 2>&1
echo "exit=$?" >> /tmp/abl_enc.log
echo "[$(stamp)] done"
