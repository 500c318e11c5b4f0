#!/usr/bin/env bash
# Round-5 consolidated queue (supersedes r5/r5b/r5c): this round runs on a
# fresh checkout, so the r4 stage-1 checkpoints under outputs/models/ are
# gone. Every warm-started arm below is preceded by the stage-1 run that
# regenerates its checkpoints (seeded, so the pre arms reproduce the r4
# tracked numbers — the *_pre_r5.json twins make that checkable).
#
# Order = science priority from VERDICT r4: #4a deep solver, #3 solflex_class,
# #4c solcons, #4b ViSNet-on-solflex, #5 ViSNet guard/low-lr, #9 ESAN.
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=outputs/protocol/r5_queue.log
mkdir -p outputs/protocol
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

note "queue r5d: validating super-tile OOM fix on chip"
if python scripts/check_r5_fix.py >> "$LOG" 2>&1; then
  note "OOM-fix validation OK"
else
  note "OOM-fix validation FAILED — continuing to record arm errors"
fi

# --- #4a: solflex deep-solver arm (regenerate pre ckpts, then deep bc)
run config/schnet/solflex_5.yaml conan_fgw_pre solflex_k5 flex_pre_r5.json 5
run config/schnet/solflex_5_bc_deep.yaml conan_fgw solflex_k5_deep flex_bc_deep.json 5 \
  --pre_ckpt_dir outputs/models/solflex_k5/1

# --- #3: solflex_class classification protocol
run config/schnet/solflex_class_5.yaml           conan_fgw_pre fxc_k5 fxc_pre.json 5
run config/schnet/solflex_class_5_bc.yaml        conan_fgw     fxc_k5 fxc_bc.json 5
run config/schnet/solflex_class_5_bc_agg0.yaml   conan_fgw     fxc_k5_agg0 fxc_bc_agg0.json 5 \
  --pre_ckpt_dir outputs/models/fxc_k5/1
run config/schnet/solflex_class_5_bc_agg1.yaml   conan_fgw     fxc_k5_agg1 fxc_bc_agg1.json 5 \
  --pre_ckpt_dir outputs/models/fxc_k5/1
run config/schnet/solflex_class_5_bc_tradeoff.yaml conan_fgw   fxc_k5_to fxc_bc_tradeoff.json 3 \
  --pre_ckpt_dir outputs/models/fxc_k5/1

# --- #4c: solcons dose-response
run config/schnet/solcons_5.yaml         conan_fgw_pre solcons_k5 cons_pre.json 5
run config/schnet/solcons_5_bc.yaml      conan_fgw     solcons_k5 cons_bc.json 5
run config/schnet/solcons_5_bc_agg0.yaml conan_fgw     solcons_k5_agg0 cons_bc_agg0.json 5 \
  --pre_ckpt_dir outputs/models/solcons_k5/1
run config/schnet/solcons_5_bc_agg1.yaml conan_fgw     solcons_k5_agg1 cons_bc_agg1.json 5 \
  --pre_ckpt_dir outputs/models/solcons_k5/1

# --- #4b: ViSNet on solflex (runs=3 — ~4x slower backbone, 4x dataset)
run config/visnet/solflex_5.yaml         conan_fgw_pre solflex_visnet fxv_pre.json 3
run config/visnet/solflex_5_bc_agg1.yaml conan_fgw     solflex_visnet fxv_bc_agg1.json 3
run config/visnet/solflex_5_bc_agg0.yaml conan_fgw     solflex_visnet_agg0 fxv_bc_agg0.json 3 \
  --pre_ckpt_dir outputs/models/solflex_visnet/1

# --- #5: ViSNet sol250 guard re-run + low-lr probe (regenerate pre ckpts)
run config/visnet/sol250_5.yaml conan_fgw_pre sol250_visnet_k5 visnet_k5_pre_r5.json 5
run config/visnet/sol250_5_bc.yaml conan_fgw sol250_visnet_guard visnet_k5_bc_guard.json 5 \
  --eval_guard --pre_ckpt_dir outputs/models/sol250_visnet_k5/1
run config/visnet/sol250_5_bc_lowlr.yaml conan_fgw sol250_visnet_lowlr visnet_k5_bc_lowlr.json 5 \
  --eval_guard --pre_ckpt_dir outputs/models/sol250_visnet_k5/1

# --- #9: ESAN experimental tier on sol250
run config/esan/sol250_avg_conf.yaml conan_fgw_pre esan_avg sol250_esan_avg.json 2
run config/esan/sol250_geometry.yaml conan_fgw_pre esan_geo sol250_esan_geo.json 2

note "round-5 queue r5d complete"
