#!/usr/bin/env bash
# ViSNet and DimeNet through the real two-stage protocol on sol250
# (VERDICT r2 item 8): reduced runs=2 mean±std, the same runner CLI path
# as the flagship SchNet protocol. Writes outputs/protocol/{visnet,dimenet}_*.json.
set -euo pipefail
cd "$(dirname "$0")/.."
R="${runs:-2}"
run() {
  local cfg="$1" stage="$2" name="$3" out="$4"; shift 4
  echo ">>> $cfg [$stage] -> $out"
  python -m conan_fgw_tpu.train.runner --config "$cfg" \
    --stage "$stage" --data_root . --run_name "$name" --run_id 1 \
    --number_of_runs "$R" --out_json "outputs/protocol/$out" "$@"
}
run config/visnet/sol250_5.yaml      conan_fgw_pre sol250_visnet_k5 visnet_k5_pre.json
run config/visnet/sol250_5_bc.yaml   conan_fgw     sol250_visnet_k5 visnet_k5_bc.json
run config/dimenet/sol250_5.yaml     conan_fgw_pre sol250_dimenet_k5 dimenet_k5_pre.json
run config/dimenet/sol250_5_bc.yaml  conan_fgw     sol250_dimenet_k5 dimenet_k5_bc.json
echo "backbone protocol complete"
