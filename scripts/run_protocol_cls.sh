#!/usr/bin/env bash
# Classification end-to-end on the chip (VERDICT r3 item 4): two-stage
# protocol on sol1k_class (binary twin of sol1k, ~1:3 imbalance) with
# weighted BCE, val_auroc checkpoint monitoring, global ROC-AUC/PRC-AUC
# eval — the reference classification pipeline (trainer.py:96-149,
# common.py:25-233). Plus one trade_off (val_mean monitor) stage-2 run.
# Writes outputs/protocol/cls_*.json.
set -euo pipefail
cd "$(dirname "$0")/.."
R="${runs:-5}"
run() {
  local cfg="$1" stage="$2" name="$3" out="$4" r="$5"; shift 5
  echo ">>> $cfg [$stage] -> $out"
  python -m conan_fgw_tpu.train.runner --config "config/schnet/$cfg" \
    --stage "$stage" --data_root . --run_name "$name" --run_id 1 \
    --number_of_runs "$r" --out_json "outputs/protocol/$out" "$@"
}
run sol1k_class_5.yaml            conan_fgw_pre s1kc_k5 s1kc_pre.json "$R"
run sol1k_class_5_bc.yaml         conan_fgw     s1kc_k5 s1kc_bc.json "$R"
run sol1k_class_5_bc_tradeoff.yaml conan_fgw    s1kc_k5_to s1kc_bc_tradeoff.json 1 \
  --pre_ckpt_dir outputs/models/s1kc_k5/1
echo "classification protocol complete"
