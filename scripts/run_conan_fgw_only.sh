#!/usr/bin/env bash
# Stage-2-only driver (the reference's script/run_conan_fgw_only.sh protocol):
# run just the conan_fgw (FGW-barycenter) stage, warm-started from a prior
# stage-1 run's checkpoints when present under the same run_name/run_id.
#
# Usage:
#   model=schnet ds=bace n_cfm=5 runs=5 run_id=2024-08-21 ./scripts/run_conan_fgw_only.sh
set -euo pipefail

model="${model:-schnet}"
ds="${ds:-bace}"
n_cfm="${n_cfm:-5}"
runs="${runs:-5}"
data_root="${data_root:-.}"
run_name="${run_name:-${model}_${ds}_${n_cfm}}"
run_id="${run_id:-$(date +"%Y-%m-%d-%T")}"
platform_flag=""
[ -n "${platform:-}" ] && platform_flag="--platform ${platform}"

cfg_dir="$(dirname "$0")/../config/${model}"
bc_cfg="${cfg_dir}/${ds}_${n_cfm}_bc.yaml"

python -m conan_fgw_tpu.train.runner \
  --config "$bc_cfg" --stage conan_fgw --data_root "$data_root" \
  --run_name "$run_name" --run_id "$run_id" --number_of_runs "$runs" \
  --model_name "$model" $platform_flag
