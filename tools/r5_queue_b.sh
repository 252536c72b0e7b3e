#!/bin/bash
# Round-5 TPU queue, phase B: MACARONS interior pretrain + e2e, staged
# depth unfreeze, oracle extension. Run after phase A (single-tenant TPU).
# eval101_all (item 7) runs separately once the deployed checkpoint for
# round 5 is decided by the phase-A gate.
set -uo pipefail
cd /root/repo
mkdir -p /tmp/r5q data

echo "=== [5] interior-domain SCONE pretraining (both models)"
timeout 10800 python pretrain_scone.py both --domain interior \
  --steps 4000 --n-objects 32 --scenes 8 --batch 8 \
  --out weights/scone_pre_interior \
  > /tmp/r5q/pre_interior.log 2>&1
echo "pre_interior exit=$?"

echo "=== [6a] interior warm start, NO online training (domain isolation)"
timeout 7200 python tools/macarons_e2e.py \
  --occ-ckpt weights/scone_pre_interior/scone_occ.ckpt \
  --vis-ckpt weights/scone_pre_interior/scone_vis.ckpt \
  --train-scenes 0 --save "" \
  --out data/macarons_e2e_interior_pretrainonly.json \
  > /tmp/r5q/e2e_interior_pre.log 2>&1
echo "e2e_interior_pre exit=$?"

echo "=== [6] MACARONS e2e with interior warm start"
timeout 10800 python tools/macarons_e2e.py \
  --occ-ckpt weights/scone_pre_interior/scone_occ.ckpt \
  --vis-ckpt weights/scone_pre_interior/scone_vis.ckpt \
  --train-scenes 4 --save weights/macarons_interior \
  --out data/macarons_e2e_interior.json \
  > /tmp/r5q/e2e_interior.log 2>&1
echo "e2e_interior exit=$?"

echo "=== [7] staged depth unfreeze at protocol length (101 poses)"
timeout 7200 python tools/depth_quality_probe.py --poses 101 \
  --depth-ckpt weights/depth_pre/depth_pre_best.ckpt \
  --unfreeze-after 10 --depth-lr 1e-6 --depth-clip 1.0 --reject-factor 3.0 \
  --out data/depth_quality_r5_staged.json \
  > /tmp/r5q/depth_staged.log 2>&1
echo "depth_staged exit=$?"

echo "=== [8] frozen control at 101 poses (weak #6: protocol length)"
timeout 7200 python tools/depth_quality_probe.py --poses 101 \
  --depth-ckpt weights/depth_pre/depth_pre_best.ckpt --freeze-depth \
  --out data/depth_quality_r5_frozen101.json \
  > /tmp/r5q/depth_frozen101.log 2>&1
echo "depth_frozen101 exit=$?"

echo "=== [9] oracle probe at all four difficulties (weak #7)"
timeout 10800 python tools/probe_nbv_oracle.py \
  --difficulties simple,normal,hard,insane \
  --out data/nbv_oracle_r5.json \
  > /tmp/r5q/oracle4.log 2>&1
echo "oracle4 exit=$?"

echo "=== phase B done"
