#!/usr/bin/env bash
# Per-backbone 3-arm completion (VERDICT r3 item 6): ViSNet and DimeNet
# agg_weight=0 control arms at runs=5, warm-started from the SAME stage-1
# checkpoints as run_backbones_sol250.sh (re-run that with runs=5 first to
# extend pre/bc to 5 runs). Writes outputs/protocol/{visnet,dimenet}_k5_bc_agg0.json.
set -euo pipefail
cd "$(dirname "$0")/.."
R="${runs:-5}"
run() {
  local cfg="$1" name="$2" out="$3"; shift 3
  echo ">>> $cfg -> $out"
  python -m conan_fgw_tpu.train.runner --config "$cfg" \
    --stage conan_fgw --data_root . --run_name "$name" --run_id 1 \
    --number_of_runs "$R" --out_json "outputs/protocol/$out" "$@"
}
run config/visnet/sol250_5_bc_agg0.yaml sol250_visnet_k5_agg0 visnet_k5_bc_agg0.json \
  --pre_ckpt_dir outputs/models/sol250_visnet_k5/1
run config/dimenet/sol250_5_bc_agg0.yaml sol250_dimenet_k5_agg0 dimenet_k5_bc_agg0.json \
  --pre_ckpt_dir outputs/models/sol250_dimenet_k5/1
echo "backbone ablation complete"
