#!/bin/bash
# Round-5 TPU queue, phase A: promotion gate + perf measurements.
# Run AFTER the diversity retrain exits (single-tenant TPU).
set -uo pipefail
cd /root/repo
mkdir -p /tmp/r5q data

echo "=== [1] promotion gate: champion vs r5div candidate (101 poses, offset 1)"
CAND=weights/nbp/nbp_r5div_best_auc.ckpt
[ -f "$CAND" ] || CAND=weights/nbp/nbp_r5div_best_val.ckpt
echo "candidate: $CAND"
timeout 5400 python tools/compare_ckpts.py \
  --ckpt-b "$CAND" \
  --poses 101 --scene-offset 1 --mode sequential \
  --out data/compare_ckpts_r5div_101off1.json \
  > /tmp/r5q/gate.log 2>&1
echo "gate exit=$?"

echo "=== [2] bench 200 poses, faithful headline (auto-segment + BF sweeps)"
timeout 3600 python bench.py --poses 200 --no-secondary \
  > /tmp/r5q/bench200.log 2>&1
echo "bench200 exit=$?"

echo "=== [3] bench 200 poses + batched capture"
timeout 3600 python bench.py --poses 200 --no-secondary --batched-capture \
  > /tmp/r5q/bench200bc.log 2>&1
echo "bench200bc exit=$?"

echo "=== [4] label-quality probe (falsification arm)"
timeout 5400 python tools/probe_label_quality.py \
  --branch-poses 5 20 40 --continuations 8 --cont-poses 30 \
  --out data/label_quality.json \
  > /tmp/r5q/labelq.log 2>&1
echo "labelq exit=$?"

echo "=== phase A done"
