#!/usr/bin/env bash
# Barycenter ablation on sol250 (VERDICT r2 item 4): a properly-trained
# K=5 stage 1 (K=3 budget: bs 32 / 200 epochs), then stage 2 twice from the
# SAME stage-1 checkpoints — once with the FGW barycenter (agg_weight=0.2)
# and once with agg_weight=0 (identical architecture/optimizer/epochs, no
# barycenter contribution). stage2-vs-stage2(agg0) isolates the FGW branch
# at equal training budget. Writes outputs/protocol/k5wt_*.json.
set -euo pipefail
cd "$(dirname "$0")/.."
R="${runs:-5}"
run() {
  local cfg="$1" stage="$2" name="$3" out="$4"; shift 4
  echo ">>> $cfg [$stage] -> $out"
  python -m conan_fgw_tpu.train.runner --config "config/schnet/$cfg" \
    --stage "$stage" --data_root . --run_name "$name" --run_id 1 \
    --number_of_runs "$R" --out_json "outputs/protocol/$out" "$@"
}
run sol250_5_wt.yaml      conan_fgw_pre sol250_k5wt k5wt_pre.json
run sol250_5_bc.yaml      conan_fgw     sol250_k5wt k5wt_bc.json
run sol250_5_bc_agg0.yaml conan_fgw     sol250_k5wt_agg0 k5wt_bc_agg0.json \
  --pre_ckpt_dir outputs/models/sol250_k5wt/1
echo "ablation complete"
