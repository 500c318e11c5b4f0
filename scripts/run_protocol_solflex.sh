#!/usr/bin/env bash
# 4-arm protocol on solflex — the offline task whose target is built from
# cross-conformer STRUCTURAL dispersion (VERDICT r3 item 3: "a task where
# conformer-structure aggregation must matter"). Arms: well-trained stage 1,
# then three stage-2 variants from the SAME stage-1 checkpoints —
# FGW barycenter agg 0.2, agg_weight=0 control, agg_weight=1.0.
# Writes outputs/protocol/flex_*.json.
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
run solflex_5.yaml         conan_fgw_pre solflex_k5 flex_pre.json
run solflex_5_bc.yaml      conan_fgw     solflex_k5 flex_bc.json
run solflex_5_bc_agg0.yaml conan_fgw     solflex_k5_agg0 flex_bc_agg0.json \
  --pre_ckpt_dir outputs/models/solflex_k5/1
run solflex_5_bc_agg1.yaml conan_fgw     solflex_k5_agg1 flex_bc_agg1.json \
  --pre_ckpt_dir outputs/models/solflex_k5/1
echo "solflex protocol complete"
