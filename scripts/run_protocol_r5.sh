#!/usr/bin/env bash
# Round-5 protocol queue (VERDICT r4 #3/#4/#9), serialized for the one-chip
# rule. Arms continue past individual failures; every arm writes its JSON to
# outputs/protocol/ and appends a status line to outputs/protocol/r5_queue.log.
#
# 1. solflex DEEP-solver arm (15/10/10, eps .05 — the sol1k sweep's best
#    setting) warm-started from the SAME r4 stage-1 checkpoints (#4a)
# 2. solflex_class 3-arm classification protocol + trade_off (#3)
# 3. solcons (consensus-structure target) 4-arm dose-response (#4c)
# 4. ESAN avg_conf + geometry_induced on sol250 at runs=2 (#9)
# 5. ViSNet on solflex pre/bc-agg1/agg0 at runs=3 (#4b — reduced runs to
#    bound chip time; ViSNet is ~4x slower and solflex is 4x sol250's size)
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

R="${runs:-5}"

# --- 1: solflex deep-solver arm (warm start from the r4 stage-1 ckpts)
run config/schnet/solflex_5_bc_deep.yaml conan_fgw solflex_k5_deep flex_bc_deep.json "$R" \
  --pre_ckpt_dir outputs/models/solflex_k5/1

# --- 2: solflex_class classification protocol
run config/schnet/solflex_class_5.yaml           conan_fgw_pre fxc_k5 fxc_pre.json "$R"
run config/schnet/solflex_class_5_bc.yaml        conan_fgw     fxc_k5 fxc_bc.json "$R"
run config/schnet/solflex_class_5_bc_agg0.yaml   conan_fgw     fxc_k5_agg0 fxc_bc_agg0.json "$R" \
  --pre_ckpt_dir outputs/models/fxc_k5/1
run config/schnet/solflex_class_5_bc_agg1.yaml   conan_fgw     fxc_k5_agg1 fxc_bc_agg1.json "$R" \
  --pre_ckpt_dir outputs/models/fxc_k5/1
run config/schnet/solflex_class_5_bc_tradeoff.yaml conan_fgw   fxc_k5_to fxc_bc_tradeoff.json 3 \
  --pre_ckpt_dir outputs/models/fxc_k5/1

# --- 3: solcons dose-response
run config/schnet/solcons_5.yaml         conan_fgw_pre solcons_k5 cons_pre.json "$R"
run config/schnet/solcons_5_bc.yaml      conan_fgw     solcons_k5 cons_bc.json "$R"
run config/schnet/solcons_5_bc_agg0.yaml conan_fgw     solcons_k5_agg0 cons_bc_agg0.json "$R" \
  --pre_ckpt_dir outputs/models/solcons_k5/1
run config/schnet/solcons_5_bc_agg1.yaml conan_fgw     solcons_k5_agg1 cons_bc_agg1.json "$R" \
  --pre_ckpt_dir outputs/models/solcons_k5/1

# --- 4: ESAN experimental tier on sol250
run config/esan/sol250_avg_conf.yaml conan_fgw_pre esan_avg sol250_esan_avg.json 2
run config/esan/sol250_geometry.yaml conan_fgw_pre esan_geo sol250_esan_geo.json 2

# --- 5: ViSNet on solflex
run config/visnet/solflex_5.yaml         conan_fgw_pre solflex_visnet fxv_pre.json 3
run config/visnet/solflex_5_bc_agg1.yaml conan_fgw     solflex_visnet fxv_bc_agg1.json 3
run config/visnet/solflex_5_bc_agg0.yaml conan_fgw     solflex_visnet_agg0 fxv_bc_agg0.json 3 \
  --pre_ckpt_dir outputs/models/solflex_visnet/1

note "round-5 protocol queue complete"
