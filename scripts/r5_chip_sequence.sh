#!/usr/bin/env bash
# Round-5 chip sequence, run AFTER the 18k faithful twin frees the chip
# (scripts/r4_chip_sequence.sh faithful — executed first this round).
# Each step is independently timeout-guarded; artifacts land in runs/.
# Drive step-by-step (run with a step name) or all in order.
set -uo pipefail
cd "$(dirname "$0")/.."

step="${1:-all}"

run() { echo "=== $*"; "$@"; }

# TPU Pallas kernel suite (the /verify recipe's chip half)
if [ "$step" = kernels -o "$step" = all ]; then
  DECNET_TEST_TPU=1 run timeout 2400 python -m pytest \
    tests/test_pallas_spamat.py tests/test_pallas_warp.py \
    tests/test_rows_layout.py -q | tee runs/tpu_kernel_suite_r5.txt
fi

# A/B the round-5 execution strategies (split-kernel concat, shift2d 3D conv)
if [ "$step" = exec_ab -o "$step" = all ]; then
  run timeout 3600 python scripts/ab_exec_modes.py \
    | tee runs/ab_exec_modes_r5.txt
fi

# quantile-binarisation eval of the round-4 detail checkpoint: does the
# density-calibrated threshold make the learned-mask configuration
# measurable where fixed thold knife-edged (0.000 @ .9, ~1.0 @ .5)?
if [ "$step" = detail_q -o "$step" = all ]; then
  run timeout 3600 python scripts/report_eval.py --ckpt /tmp/r4_detail \
    --h 540 --w 972 --max_disp 216 --batch 4 --batches 24 \
    --thold_mode quantile --detail_density 0.25 \
    --json runs/report_detail_r5_quantile.json
fi

# 16k mask-supervised fine-tune on the FIXED stream (z-buffer right view)
# with quantile masks — the shipped learned-mask configuration, saturated
# (VERDICT r5 item 1a/1b)
if [ "$step" = detail_ft -o "$step" = all ]; then
  run timeout 10800 bash scripts/train_supervised.sh --dataset synthetic --root "" \
    --set data.on_device=true --set model.max_disp=216 \
    --set model.use_detail=true --set model.thold_mode=quantile \
    --set model.detail_density=0.25 --set model.s2d_fine=true \
    --set model.dtype=bfloat16 --set model.match_temp=3.0 \
    --set model.match_temp_learned=true --set model.cand_fallback=true \
    --set model.match_window=12 \
    --set loss.sparse_term_scale=20 --set loss.alpha=0.3 \
    --set train.crop_h=162 --set train.crop_w=486 --set train.batch_size=8 \
    --set train.total_steps=12000 --set train.freeze_bn_after=10000 \
    --set train.lr=2e-4 --init_from /tmp/r4_s2d_win --ckpt_dir /tmp/r5_detail \
    --eval_split val --eval_every 4000 --eval_batches 8 \
    > runs/train_detail_r5.log 2>&1
  run timeout 3600 python scripts/report_eval.py --ckpt /tmp/r5_detail \
    --h 540 --w 972 --max_disp 216 --batch 4 --batches 24 \
    --json runs/report_detail_r5.json
  run python scripts/export_ckpt.py --ckpt /tmp/r5_detail \
    --out runs/ckpt_detail_r5
fi

# stressor stream: short full-band fine-tune (match_window=0 — windowed
# matching cannot recover 0.3-0.7*max_disp offsets) then the lost-detail
# report: the configuration where sparse matching is the only mechanism
# that can recover the disparity (VERDICT r5 item 1c)
if [ "$step" = stressor -o "$step" = all ]; then
  run timeout 7200 bash scripts/train_supervised.sh --dataset synthetic --root "" \
    --set data.on_device=true --set data.variant=stressor \
    --set model.max_disp=216 \
    --set model.use_detail=false --set model.s2d_fine=true \
    --set model.dtype=bfloat16 --set model.match_temp=3.0 \
    --set model.match_temp_learned=true --set model.cand_fallback=true \
    --set model.match_window=0 \
    --set loss.sparse_term_scale=20 \
    --set train.crop_h=162 --set train.crop_w=486 --set train.batch_size=8 \
    --set train.total_steps=6000 --set train.freeze_bn_after=5000 \
    --set train.lr=2e-4 --init_from /tmp/r4_s2d_win \
    --ckpt_dir /tmp/r5_stressor \
    --eval_split val --eval_every 4000 --eval_batches 8 \
    > runs/train_stressor_r5.log 2>&1
  run timeout 3600 python scripts/report_eval.py --ckpt /tmp/r5_stressor \
    --h 540 --w 972 --max_disp 216 --batch 4 --batches 24 \
    --variant stressor --json runs/report_stressor_r5.json
  run python scripts/export_ckpt.py --ckpt /tmp/r5_stressor \
    --out runs/ckpt_stressor_r5
fi

# wavelet pair-consistency fix A/B (VERDICT r5 item 5)
if [ "$step" = mask_ab -o "$step" = all ]; then
  run timeout 3600 python scripts/ab_mask_family.py --ckpt /tmp/r4_s2d_win \
    --h 540 --w 972 --max_disp 216 --batch 4 --batches 8 \
    --json runs/ab_mask_family_r5.json
fi

# the reference's InputData/real calib scenes (VERDICT r5 item 7)
if [ "$step" = demos_real -o "$step" = all ]; then
  run timeout 3600 python -m decnet_tpu.cli.demo \
    --root /root/reference/InputData/real --save2where runs/demo_r5/real \
    --resume runs/ckpt_flagship
fi

if [ "$step" = bench -o "$step" = all ]; then
  run timeout 2400 python bench.py | tee runs/bench_r5.txt
fi

# BN vs GN at a meaningful budget: extend the round-4 4k arms to 12k
# (VERDICT r5 item 6) — only after everything above
if [ "$step" = bn12k ]; then
  for arm in bn gn; do
    norm_flag=""
    [ "$arm" = gn ] && norm_flag="--set model.norm=gn"
    run timeout 7200 bash scripts/train_supervised.sh --dataset synthetic --root "" \
      --set data.on_device=true --set model.max_disp=216 \
      --set model.use_detail=false --set model.s2d_fine=true \
      --set model.dtype=bfloat16 --set model.match_temp=3.0 \
      --set model.match_temp_learned=true --set model.cand_fallback=true \
      --set model.match_window=12 $norm_flag \
      --set loss.sparse_term_scale=20 \
      --set train.crop_h=162 --set train.crop_w=486 --set train.batch_size=8 \
      --set train.total_steps=12000 --set train.freeze_bn_after=10000 \
      --set train.lr=5e-4 --ckpt_dir /tmp/r5_bn_$arm \
      --eval_split val --eval_every 4000 --eval_batches 8 \
      > runs/train_bn12k_$arm.log 2>&1
    run timeout 3600 python scripts/report_eval.py --ckpt /tmp/r5_bn_$arm \
      --h 540 --w 972 --max_disp 216 --batch 4 --batches 16 \
      --json runs/report_bn12k_$arm.json
  done
fi


# training-mode repack throughput: faithful-form freeze_bn training, NHWC
# vs packed execution (train.packed_exec) — the last faithful training tax
if [ "$step" = packed_ab ]; then
  for mode in nhwc packed; do
    pe=false; [ "$mode" = packed ] && pe=true
    run timeout 2400 python -m decnet_tpu.cli.train --dataset synthetic --root "" \
      --set data.on_device=true --set model.max_disp=216 \
      --set model.use_detail=false --set model.s2d_fine=false \
      --set model.dtype=bfloat16 --set model.match_temp=3.0 \
      --set model.match_temp_learned=true --set model.cand_fallback=true \
      --set loss.sparse_term_scale=20 \
      --set train.crop_h=162 --set train.crop_w=486 --set train.batch_size=8 \
      --set train.total_steps=150 --set train.log_every=25 \
      --set train.freeze_bn=true --set train.packed_exec=$pe \
      --init_from /tmp/r4_faithful --ckpt_dir /tmp/r5_packed_$mode \
      > runs/train_packed_ab_$mode.log 2>&1
    tail -2 runs/train_packed_ab_$mode.log
  done
fi

# canonical full-round order (centerpiece first): invoke as `ordered`
if [ "$step" = ordered ]; then
  for s in detail_q detail_ft stressor exec_ab bench kernels mask_ab demos_real; do
    bash "$0" "$s"
  done
fi

# resume order after the 06:24 tunnel hang: detail_ft auto-resumes from its
# Orbax checkpoint (step 4000), then the rest of the round
if [ "$step" = ordered2 ]; then
  for s in detail_ft stressor exec_ab bench kernels mask_ab demos_real packed_ab; do
    bash "$0" "$s"
  done
fi
