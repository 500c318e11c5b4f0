#!/usr/bin/env bash
# Full two-stage protocol on the offline sol250 benchmark: K=3 and K=5,
# 5 runs each (the reference's mean±std protocol), plus the
# bary_pad_mode=masked A/B. Writes summaries to outputs/protocol/*.json.
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
run sol250_3.yaml     conan_fgw_pre sol250_k3 k3_pre.json
run sol250_3_bc.yaml  conan_fgw     sol250_k3 k3_bc.json
run sol250_5.yaml     conan_fgw_pre sol250_k5 k5_pre.json
run sol250_5_bc.yaml  conan_fgw     sol250_k5 k5_bc.json
run sol250_5_bc_masked.yaml conan_fgw sol250_k5_masked k5_bc_masked.json \
  --pre_ckpt_dir outputs/models/sol250_k5/1
echo "protocol complete"
