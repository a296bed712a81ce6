#!/usr/bin/env bash
# Round-3 chip sequence after the s2d_v2 training run frees the chip:
#   1. protocol-shape accuracy report for the s2d flagship (VERDICT items 1+2)
#   2. execution-mode A/B (repack stage choices) for bench defaults
#   3. launch the faithful twin training run
set -uo pipefail
cd "$(dirname "$0")/.."

echo "=== report_eval s2d_v2 @ protocol shape"
timeout 3600 python scripts/report_eval.py --ckpt /tmp/r3_s2d_v2 --s2d \
  --h 540 --w 972 --max_disp 216 --batch 4 --batches 24 \
  --json runs/report_s2d_r3v2.json

echo "=== bench_repack_ab"
timeout 5400 python scripts/bench_repack_ab.py | tee runs/bench_repack_ab.txt

echo "=== launching faithful_v2 training"
nohup bash scripts/train_supervised.sh --dataset synthetic --root "" \
  --set data.on_device=true --set model.max_disp=216 \
  --set model.use_detail=false --set model.s2d_fine=false \
  --set model.dtype=bfloat16 --set loss.sparse_term_scale=20 \
  --set train.crop_h=162 --set train.crop_w=486 --set train.batch_size=8 \
  --set train.total_steps=24000 --set train.freeze_bn_after=20000 \
  --set train.lr=1e-3 --ckpt_dir /tmp/r3_faithful_v2 \
  --eval_split val --eval_every 2500 --eval_batches 8 \
  > runs/train_faithful_r3v2.log 2>&1 &
echo "faithful_v2 launched: $!"
