#!/usr/bin/env bash
# Round-4 chip sequence AFTER the s2d_v3 training run frees the chip.
# Each step is independently timeout-guarded; artifacts land in runs/.
# Driven step-by-step (run with a step name) or all in order.
set -uo pipefail
cd "$(dirname "$0")/.."

step="${1:-all}"

run() { echo "=== $*"; "$@"; }

if [ "$step" = report_s2d -o "$step" = all ]; then
  run timeout 3600 python scripts/report_eval.py --ckpt /tmp/r4_s2d_win \
    --h 540 --w 972 --max_disp 216 --batch 4 --batches 24 \
    --json runs/report_s2d_r4.json
fi

if [ "$step" = detail_ft -o "$step" = all ]; then
  run timeout 3600 bash scripts/train_supervised.sh --dataset synthetic --root "" \
    --set data.on_device=true --set model.max_disp=216 \
    --set model.use_detail=true --set model.thold=0.9 --set model.s2d_fine=true \
    --set model.dtype=bfloat16 --set model.match_temp=3.0 \
    --set model.match_temp_learned=true --set model.cand_fallback=true \
    --set model.match_window=12 \
    --set loss.sparse_term_scale=20 --set loss.alpha=0.3 \
    --set train.crop_h=162 --set train.crop_w=486 --set train.batch_size=8 \
    --set train.total_steps=4000 --set train.freeze_bn_after=3000 \
    --set train.lr=2e-4 --init_from /tmp/r4_s2d_win --ckpt_dir /tmp/r4_detail \
    --eval_split val --eval_every 2000 --eval_batches 8 \
    > runs/train_detail_r4.log 2>&1
  run timeout 3600 python scripts/report_eval.py --ckpt /tmp/r4_detail \
    --h 540 --w 972 --max_disp 216 --batch 4 --batches 24 \
    --json runs/report_detail_r4.json
fi

if [ "$step" = faithful -o "$step" = all ]; then
  run timeout 9000 bash scripts/train_supervised.sh --dataset synthetic --root "" \
    --set data.on_device=true --set model.max_disp=216 \
    --set model.use_detail=false --set model.s2d_fine=false \
    --set model.dtype=bfloat16 --set model.match_temp=3.0 \
    --set model.match_temp_learned=true --set model.cand_fallback=true \
    --set loss.sparse_term_scale=20 \
    --set train.crop_h=162 --set train.crop_w=486 --set train.batch_size=8 \
    --set train.total_steps=18000 --set train.freeze_bn_after=15000 \
    --set train.lr=1e-3 --ckpt_dir /tmp/r4_faithful \
    --eval_split val --eval_every 2500 --eval_batches 8 \
    > runs/train_faithful_r4.log 2>&1
  run timeout 3600 python scripts/report_eval.py --ckpt /tmp/r4_faithful \
    --h 540 --w 972 --max_disp 216 --batch 4 --batches 24 \
    --json runs/report_faithful_r4.json
fi

if [ "$step" = repack_ab -o "$step" = all ]; then
  run timeout 5400 python scripts/bench_repack_ab.py | tee runs/bench_repack_ab_r4.txt
fi

if [ "$step" = kernels -o "$step" = all ]; then
  DECNET_TEST_TPU=1 run timeout 2400 python -m pytest \
    tests/test_pallas_spamat.py tests/test_pallas_warp.py \
    tests/test_rows_layout.py -q | tee runs/tpu_kernel_suite_r4.txt
fi

if [ "$step" = demos -o "$step" = all ]; then
  python scripts/make_mbury_scene.py --out /tmp/mbury_scene
  run timeout 3600 python -m decnet_tpu.cli.demo \
    --root /root/reference/InputData/Sceneflow --save2where runs/demo_r4/sceneflow \
    --resume /tmp/r4_s2d_win --set model.max_disp=216
  run timeout 3600 python -m decnet_tpu.cli.demo \
    --root /root/reference/InputData/KITTI --save2where runs/demo_r4/kitti \
    --resume /tmp/r4_s2d_win --set model.max_disp=216
  run timeout 3600 python -m decnet_tpu.cli.demo \
    --root /tmp/mbury_scene --save2where runs/demo_r4/middlebury \
    --resume /tmp/r4_s2d_win --set model.max_disp=216 \
    --set model.skip_stage_id=3
fi

if [ "$step" = mask_ab -o "$step" = all ]; then
  run timeout 3600 python scripts/ab_mask_family.py --ckpt /tmp/r4_s2d_win \
    --h 540 --w 972 --max_disp 216 --batch 4 --batches 8 \
    --json runs/ab_mask_family_r4.json
fi

if [ "$step" = bn_ablation -o "$step" = all ]; then
  run bash scripts/r4_bn_ablation.sh | tee runs/bn_ablation_r4.txt
fi

if [ "$step" = bench -o "$step" = all ]; then
  run timeout 2400 python bench.py | tee runs/bench_r4.txt
fi
