#!/usr/bin/env bash
# Two-stage protocol on the larger offline sol1k benchmark (~1.2k molecules,
# 4x sol250): K=5, N runs mean±std through the production runner CLI.
# Writes outputs/protocol/s1k_*.json.
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
run sol1k_5.yaml    conan_fgw_pre sol1k_k5 s1k_pre.json
run sol1k_5_bc.yaml conan_fgw     sol1k_k5 s1k_bc.json
# agg_weight=0 control arm: same stage-2 budget/warm-start, FGW branch inert
run sol1k_5_bc_agg0.yaml conan_fgw sol1k_k5_agg0 s1k_bc_agg0.json \
  --pre_ckpt_dir outputs/models/sol1k_k5/1
echo "sol1k protocol complete"
