#!/bin/sh
# Sequential TPU profiling batch (run when the dev tunnel is healthy):
#   1. phased decode schedule profiler  -> /tmp/dec3.log
#   2. speculative end-to-end breakdown -> /tmp/spec3.log
#   3. encode slot-scan ablation        -> /tmp/abl_enc.log
# Each runs alone (the box A/B rule: compare only within one process).
cd "$(dirname "$0")/.." || exit 1
stamp() { date -u +%H:%M:%S; }
echo "[$(stamp)] decode3" && python -u tools/profile_decode3.py > /tmp/dec3.log 2>&1
echo "exit=$?" >> /tmp/dec3.log
echo "[$(stamp)] spec" && python -u tools/profile_spec.py > /tmp/spec3.log 2>&1
echo "exit=$?" >> /tmp/spec3.log
echo "[$(stamp)] ablate_encode" && python -u tools/ablate_encode.py > /tmp/abl_enc.log 2>&1
echo "exit=$?" >> /tmp/abl_enc.log
echo "[$(stamp)] done"
