#!/usr/bin/env bash
# Round-5 queue C: re-run the arms that hit the VMEM OOM before the R<=8
# super-tile cap + deep-budget XLA fallback (commit after queue A started).
# Validates the fix on chip first, then the solflex deep arm and the
# solflex_class classification protocol.
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=outputs/protocol/r5_queue.log
note() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }
run() {
  local cfg="$1" stage="$2" name="$3" out="$4" r="$5"; shift 5
  note "START $cfg [$stage] runs=$r -> $out"
  if python -m conan_fgw_tpu.train.runner --config "$cfg" \
      --stage "$stage" --data_root . --run_name "$name" --run_id 1 \
      --number_of_runs "$r" --out_json "outputs/protocol/$out" "$@" \
      >> "$LOG" 2>&1; then
    note "DONE  $out"
  else
    note "FAIL  $out (continuing)"
  fi
}
note "queue C: validating OOM fix on chip"
if python scripts/check_r5_fix.py >> "$LOG" 2>&1; then
  note "OOM-fix validation OK"
else
  note "OOM-fix validation FAILED — running the arms anyway to record errors"
fi
run config/schnet/solflex_5_bc_deep.yaml conan_fgw solflex_k5_deep flex_bc_deep.json 5 \
  --pre_ckpt_dir outputs/models/solflex_k5/1
run config/schnet/solflex_class_5.yaml           conan_fgw_pre fxc_k5 fxc_pre.json 5
run config/schnet/solflex_class_5_bc.yaml        conan_fgw     fxc_k5 fxc_bc.json 5
run config/schnet/solflex_class_5_bc_agg0.yaml   conan_fgw     fxc_k5_agg0 fxc_bc_agg0.json 5 \
  --pre_ckpt_dir outputs/models/fxc_k5/1
run config/schnet/solflex_class_5_bc_agg1.yaml   conan_fgw     fxc_k5_agg1 fxc_bc_agg1.json 5 \
  --pre_ckpt_dir outputs/models/fxc_k5/1
run config/schnet/solflex_class_5_bc_tradeoff.yaml conan_fgw   fxc_k5_to fxc_bc_tradeoff.json 3 \
  --pre_ckpt_dir outputs/models/fxc_k5/1
note "queue C complete"
