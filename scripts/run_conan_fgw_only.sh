#!/usr/bin/env bash
# Stage-2-only driver (the reference's script/run_conan_fgw_only.sh protocol):
# run just the conan_fgw (FGW-barycenter) stage, warm-started from a prior
# stage-1 run's checkpoints when present under the same run_name/run_id.
#
# Usage:
#   model=schnet ds=bace n_cfm=5 runs=5 run_id=2024-08-21 ./scripts/run_conan_fgw_only.sh
#
# Stage 1 must have been run with the same number_of_runs under the same
# run_name/run_id (the runner hard-fails on a missing stage-1 checkpoint,
# like the reference). To warm-start from a different stage-1 run — e.g. a
# different conformer count, the reference's n_cfm_conan_fgw_pre — set
# n_cfm_pre= or point pre_ckpt_dir= at its checkpoint directory.
set -euo pipefail

model="${model:-schnet}"
ds="${ds:-bace}"
n_cfm="${n_cfm:-5}"
runs="${runs:-5}"
data_root="${data_root:-.}"
run_name="${run_name:-${model}_${ds}_${n_cfm}}"
run_id="${run_id:-$(date +"%Y-%m-%d-%T")}"
models_dir="${models_dir:-outputs/models}"
n_cfm_pre="${n_cfm_pre:-${n_cfm}}"
platform_flag=""
[ -n "${platform:-}" ] && platform_flag="--platform ${platform}"
pre_flag=""
if [ -z "${pre_ckpt_dir:-}" ] && [ "$n_cfm_pre" != "$n_cfm" ]; then
  pre_ckpt_dir="${models_dir}/${model}_${ds}_${n_cfm_pre}/${run_id}"
fi
[ -n "${pre_ckpt_dir:-}" ] && pre_flag="--pre_ckpt_dir ${pre_ckpt_dir}"
scratch_flag=""
[ -n "${allow_scratch:-}" ] && scratch_flag="--allow_scratch"

cfg_dir="$(dirname "$0")/../config/${model}"
bc_cfg="${cfg_dir}/${ds}_${n_cfm}_bc.yaml"

python -m conan_fgw_tpu.train.runner \
  --config "$bc_cfg" --stage conan_fgw --data_root "$data_root" \
  --run_name "$run_name" --run_id "$run_id" --number_of_runs "$runs" \
  --models_dir "$models_dir" \
  --model_name "$model" $platform_flag $pre_flag $scratch_flag
