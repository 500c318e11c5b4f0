#!/usr/bin/env bash
# Two-stage ConAN-FGW training driver (the reference's script/run.sh protocol).
#
# Usage:
#   model=schnet ds=esol n_cfm=5 runs=5 ./scripts/run.sh
#
# Env vars:
#   model : schnet | visnet            (default schnet)
#   ds    : esol | freesolv | lipo | bace | ...  (default esol)
#   n_cfm : conformers per molecule    (default 5)
#   runs  : number_of_runs for mean±std (default 5)
#   data_root, run_name, run_id, platform : forwarded to the runner
set -euo pipefail

model="${model:-schnet}"
ds="${ds:-esol}"
n_cfm="${n_cfm:-5}"
runs="${runs:-5}"
data_root="${data_root:-.}"
run_name="${run_name:-${ds}_${model}}"
run_id="${run_id:-1}"
platform_flag=""
[ -n "${platform:-}" ] && platform_flag="--platform ${platform}"

cfg_dir="$(dirname "$0")/../config/${model}"
pre_cfg="${cfg_dir}/${ds}_${n_cfm}.yaml"
bc_cfg="${cfg_dir}/${ds}_${n_cfm}_bc.yaml"
[ -f "$pre_cfg" ] || pre_cfg="${bc_cfg}"   # fall back to the bc config's schema

echo ">>> stage 1: conan_fgw_pre (${pre_cfg})"
python -m conan_fgw_tpu.train.runner \
  --config "$pre_cfg" --stage conan_fgw_pre --data_root "$data_root" \
  --run_name "$run_name" --run_id "$run_id" --number_of_runs "$runs" \
  --model_name "$model" $platform_flag

echo ">>> stage 2: conan_fgw (${bc_cfg})"
python -m conan_fgw_tpu.train.runner \
  --config "$bc_cfg" --stage conan_fgw --data_root "$data_root" \
  --run_name "$run_name" --run_id "$run_id" --number_of_runs "$runs" \
  --model_name "$model" $platform_flag
