#!/usr/bin/env bash
# Round-5 queue B (after run_protocol_r5.sh): ViSNet divergence mitigation
# (VERDICT r4 #5) — the sol250 stage-2 arm re-run at runs=5 with the eval
# guard on (pred_outliers + guarded rmse in every run JSON, making the 5/5
# mean reportable), plus a halved-lr probe of whether a smaller stage-2 lr
# removes the run-2 trunk blow-up.
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
run config/visnet/sol250_5_bc.yaml conan_fgw sol250_visnet_guard visnet_k5_bc_guard.json 5 \
  --eval_guard --pre_ckpt_dir outputs/models/sol250_visnet_k5/1
run config/visnet/sol250_5_bc_lowlr.yaml conan_fgw sol250_visnet_lowlr visnet_k5_bc_lowlr.json 5 \
  --eval_guard --pre_ckpt_dir outputs/models/sol250_visnet_k5/1
note "queue B complete"
