#!/usr/bin/env bash
# Stage-1-only driver (the reference's script/run_conan_fgw_pre_only.sh protocol):
# run just the conan_fgw_pre (no-barycenter) stage.
#
# Usage:
#   model=schnet ds=esol n_cfm=5 runs=5 ./scripts/run_conan_fgw_pre_only.sh
#
# runs defaults to 5 to match run_conan_fgw_only.sh: stage 2 warm-starts per
# run index, so stage 1 must be run with the same number_of_runs.
set -euo pipefail

model="${model:-schnet}"
ds="${ds:-esol}"
n_cfm="${n_cfm:-5}"
runs="${runs:-5}"
data_root="${data_root:-.}"
run_name="${run_name:-${model}_${ds}_${n_cfm}}"
run_id="${run_id:-$(date +"%Y-%m-%d-%T")}"
platform_flag=""
[ -n "${platform:-}" ] && platform_flag="--platform ${platform}"

cfg_dir="$(dirname "$0")/../config/${model}"
pre_cfg="${cfg_dir}/${ds}_${n_cfm}.yaml"
if [ ! -f "$pre_cfg" ]; then
  # the bc config carries stage-2 hyperparameters (lr, epochs); flag the reuse
  echo ">>> NOTE: no dedicated stage-1 config at ${pre_cfg};" \
       "falling back to ${ds}_${n_cfm}_bc.yaml (stage-2 hyperparameters)"
  pre_cfg="${cfg_dir}/${ds}_${n_cfm}_bc.yaml"
fi

python -m conan_fgw_tpu.train.runner \
  --config "$pre_cfg" --stage conan_fgw_pre --data_root "$data_root" \
  --run_name "$run_name" --run_id "$run_id" --number_of_runs "$runs" \
  --model_name "$model" $platform_flag
