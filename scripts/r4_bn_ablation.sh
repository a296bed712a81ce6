#!/usr/bin/env bash
# Matched small-scale arms on the identical synthetic stream (~10 min/arm,
# one v5e chip), doubling as two VERDICT-r3 items:
#   bn vs gn        — the BN root-cause ablation (item 5)
#   bn vs faithful  — the s2d-vs-faithful accuracy twin on identical
#                     training (item 2's table, at reduced scale)
set -uo pipefail
cd "$(dirname "$0")/.."

COMMON=(--dataset synthetic --root ""
  --set data.on_device=true --set model.max_disp=108
  --set model.use_detail=false --set model.s2d_fine=true
  --set model.dtype=bfloat16 --set model.match_temp=3.0
  --set model.match_temp_learned=true --set model.cand_fallback=true
  --set model.match_window=12
  --set loss.sparse_term_scale=20
  --set train.crop_h=162 --set train.crop_w=243 --set train.batch_size=8
  --set train.total_steps=4000 --set train.lr=1e-3
  --eval_split val --eval_every 2000 --eval_batches 8)

run_arm () {
  local name="$1"; shift
  echo "=== arm: $name"
  timeout 2400 bash scripts/train_supervised.sh "${COMMON[@]}" "$@" \
    --ckpt_dir "/tmp/r4_bn_$name" > "runs/train_bnab_${name}.log" 2>&1
  timeout 1200 python scripts/report_eval.py --ckpt "/tmp/r4_bn_$name" --s2d \
    --h 162 --w 243 --max_disp 108 --batch 8 --batches 16 \
    --json "runs/report_bnab_${name}.json" >> "runs/train_bnab_${name}.log" 2>&1
}

run_arm bn
run_arm gn       --set model.norm=gn
run_arm faithful --set model.s2d_fine=false
# The BN+freeze-tail arm is covered by the flagship runs' integrated
# freeze_bn_after tail (in-run eval before/after the switch); an explicit
# small-scale arm can be added with: run_arm bnf --set train.freeze_bn_after=5000

python - <<'EOF'
import json
rows = []
for name in ("bn", "gn", "faithful"):
    r = json.load(open(f"runs/report_bnab_{name}.json"))
    rows.append((name, r["stage3_epe"], r["stage3_d1"],
                 r["up0_baseline_epe"], r.get("mask_sparse_cand_epe")))
print(f"{'arm':9} {'EPE':>7} {'D1':>7} {'up0':>7} {'sparse_cand':>11}")
for n, e, d, u, s in rows:
    print(f"{n:9} {e:7.3f} {d:7.2f} {u:7.2f} {s if s is None else f'{s:11.3f}'}")
EOF
