#!/bin/bash
# VERDICT r4 item 4: pin the hashgrid-family quality ceiling at the
# reference recipe's 20k iterations ON CHIP (/root/reference/main.py:75-76)
# — the round-3/4 README quality table anchored the hashgrid row at 4k
# iters on the CPU backend. Relay-drop-safe: per-epoch checkpoints +
# --resume retry loop (the tunnel stalls for minutes at a time).
#
# Usage: bash tools/run_hashgrid20k.sh [workspace] [iters]
WS=${1:-/tmp/qg20k}
ITERS=${2:-20000}
for i in $(seq 1 30); do
  echo "== attempt $i ($(date -u +%H:%M:%S)) =="
  timeout 16000 python tools/quality_gate.py --families hashgrid \
    --iters "$ITERS" --save_cnt $((ITERS / 500)) --resume \
    --workspace "$WS" && exit 0
  echo "== attempt $i failed (rc=$?); resuming in 30 s =="
  sleep 30
done
exit 1
