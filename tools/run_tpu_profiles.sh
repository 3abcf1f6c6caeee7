#!/bin/sh
# Sequential TPU profiling batch (run when the dev tunnel is healthy),
# ordered most-valuable-first in case the tunnel flaps mid-batch:
#   1. bench A/B: region(auto) vs scatter placement -> /tmp/bench_place.log
#      (captures the headline + all secondary numbers twice)
#   2. speculative end-to-end breakdown             -> /tmp/spec3.log
#   3. intra-probe stage split (two-phase, final)   -> /tmp/spec2.log
#   4. phased + Pallas-region decode profiler       -> /tmp/dec3.log
#   5. encode slot-scan ablation                    -> /tmp/abl_enc.log
#   6. dense-stage prefix profiler                  -> /tmp/dense.log
#   7. speculative primitive costs                  -> /tmp/micro_spec.log
# Each runs alone (the box A/B rule: compare only within one process;
# the bench A/B is cross-process but both legs use best-of adaptive reps).
cd "$(dirname "$0")/.." || exit 1
stamp() { date -u +%H:%M:%S; }
echo "[$(stamp)] bench place=auto(region)" && JPEG_TPU_PLACE=auto python -u bench.py > /tmp/bench_place.log 2>&1
echo "exit=$?" >> /tmp/bench_place.log
echo "[$(stamp)] bench place=scatter" && JPEG_TPU_PLACE=scatter python -u bench.py >> /tmp/bench_place.log 2>&1
echo "exit=$?" >> /tmp/bench_place.log
echo "[$(stamp)] spec" && timeout 1800 python -u tools/profile_spec.py > /tmp/spec3.log 2>&1
echo "exit=$?" >> /tmp/spec3.log
echo "[$(stamp)] spec2" && timeout 1800 python -u tools/profile_spec2.py > /tmp/spec2.log 2>&1
echo "exit=$?" >> /tmp/spec2.log
echo "[$(stamp)] decode3" && timeout 1800 python -u tools/profile_decode3.py > /tmp/dec3.log 2>&1
echo "exit=$?" >> /tmp/dec3.log
echo "[$(stamp)] ablate_encode" && timeout 1800 python -u tools/ablate_encode.py > /tmp/abl_enc.log 2>&1
echo "exit=$?" >> /tmp/abl_enc.log
echo "[$(stamp)] dense" && timeout 1800 python -u tools/profile_dense.py > /tmp/dense.log 2>&1
echo "exit=$?" >> /tmp/dense.log
echo "[$(stamp)] micro_spec" && timeout 1800 python -u tools/microbench_spec.py > /tmp/micro_spec.log 2>&1
echo "exit=$?" >> /tmp/micro_spec.log
echo "[$(stamp)] done"
