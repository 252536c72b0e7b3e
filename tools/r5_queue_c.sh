#!/bin/bash
# Round-5 TPU queue, phase C: headline refresh + perf attribution + crash fix
# validation. Run after phase B.
set -uo pipefail
cd /root/repo
mkdir -p /tmp/r5q data

echo "=== [10] champion-vs-random 101-pose refresh (VERDICT item 7)"
timeout 7200 python tools/eval101_all.py \
  --out data/eval_vs_random_r5_101.json \
  > /tmp/r5q/eval101.log 2>&1
echo "eval101 exit=$?"

echo "=== [11] perf attribution: OLD champion, stratified @200"
# Swap the round-2 champion in so the 52.9-vs-45.0 delta splits into
# code-improvement vs policy-change parts; restore afterwards.
cp weights/nbp/nbp_best_val.ckpt /tmp/champ_r5.ckpt
cp weights/nbp/nbp_r2_champion_backup.ckpt weights/nbp/nbp_best_val.ckpt
timeout 2400 python bench.py --poses 200 --stratified --no-secondary \
  > /tmp/r5q/bench200_oldckpt.log 2>&1
echo "bench_oldckpt exit=$?"
cp /tmp/champ_r5.ckpt weights/nbp/nbp_best_val.ckpt

echo "=== [12] mfu/roofline refresh at 200 poses"
timeout 3600 python tools/mfu_estimate.py --poses 200 \
  --out data/mfu_estimate_r5.json \
  > /tmp/r5q/mfu_r5.log 2>&1
echo "mfu exit=$?"

echo "=== [13] watchdog-fix validation: 5000-pose single-scene default path"
timeout 3600 python tools/crash_bisect.py --mode single-long --poses 5000 \
  > /tmp/r5q/crash5000.log 2>&1
echo "crash5000 exit=$?"

echo "=== phase C done"
