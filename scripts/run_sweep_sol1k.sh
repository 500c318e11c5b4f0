#!/usr/bin/env bash
# Stage-2 hyperparameter sweep on sol1k (VERDICT r3 item 3): agg_weight
# {0.5, 1.0} and a deeper FGW solver budget (15 outer / 10 PGD / 10
# Sinkhorn, eps 0.05 via fgw_from_config), all warm-started from the SAME
# stage-1 checkpoints as the recorded s1k_bc/s1k_bc_agg0 arms
# (outputs/models/sol1k_k5/1 — run run_protocol_sol1k.sh first).
# Writes outputs/protocol/s1k_sweep_*.json.
set -euo pipefail
cd "$(dirname "$0")/.."
R="${runs:-5}"
run() {
  local cfg="$1" name="$2" out="$3"; shift 3
  echo ">>> $cfg -> $out"
  python -m conan_fgw_tpu.train.runner --config "config/schnet/$cfg" \
    --stage conan_fgw --data_root . --run_name "$name" --run_id 1 \
    --number_of_runs "$R" --out_json "outputs/protocol/$out" \
    --pre_ckpt_dir outputs/models/sol1k_k5/1 "$@"
}
run sol1k_5_bc_agg05.yaml sol1k_k5_agg05 s1k_sweep_agg05.json
run sol1k_5_bc_agg1.yaml  sol1k_k5_agg1  s1k_sweep_agg1.json
run sol1k_5_bc_deep.yaml  sol1k_k5_deep  s1k_sweep_deep.json
echo "sol1k sweep complete"
