"""Minimal repro / bound for the scan-barycenter pathology (VERDICT r3 #5).

Round 3 observed one anecdote: wrapping the stage-2 (FGW barycenter) train
step — itself nested ``lax.scan``s — in an outer ``lax.scan`` of 2 steps took
339 s end-to-end on the tunneled v5e, vs ~4 ms/step unscanned; stage-1 scan
chunks are fine, and round 3 gated ``scan_barycenter`` off on that anecdote.
Round-4 outcome: this probe could NOT reproduce the pathology (scan8 ran
8.9 ms/step vs 10.0 per-step, compiles ~11 s — PARITY.md table); the
anecdote was transient tunnel degradation and ``TrainSettings.
scan_barycenter`` now defaults True. The probe times, on the current
backend,

  * the per-step stage-2 path (chained, device-fetch completion barrier),
  * a scanned chunk of 2 and of 8 stage-2 steps (compile and run separately),
  * the scanned stage-1 chunk as a control,

and prints one JSON summary (appended to PARITY.md by hand). Optional
``--profile_dir`` captures an XLA profiler trace of one scanned chunk.

Usage:  python scripts/probe_scan_barycenter.py [--profile_dir DIR]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

B, K, N = 24, 5, 32


def build(use_barycenter: bool):
    import jax
    import jax.numpy as jnp

    from conan_fgw_tpu.data.loader import pack
    from conan_fgw_tpu.data.packing import PackedBatch
    from conan_fgw_tpu.data.synthetic import random_dataset
    from conan_fgw_tpu.models.heads import ConanModel
    from conan_fgw_tpu.train import loop as loop_lib

    recs = random_dataset(42, B, num_conformers=K, heavy_range=(8, 13))
    pb = pack(recs, max_atoms=N, batch_size=B)
    batch = PackedBatch(**jax.tree.map(jnp.asarray, dataclasses.asdict(pb)))
    model = ConanModel()
    settings = loop_lib.TrainSettings(use_barycenter=use_barycenter, batch_size=B)
    state = loop_lib.init_state(model, settings, batch)
    return model, settings, state, batch, loop_lib


def timed(fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    return out, time.perf_counter() - t0


def fetch_barrier(tree):
    """Scalar device->host fetch: the only reliable completion barrier on
    this tunneled backend (see bench.py::_measure)."""
    import jax

    leaf = jax.tree.leaves(tree)[0]
    return float(np.asarray(leaf).ravel()[0])


def probe(stage: str, chunk_sizes=(2, 8), profile_dir: str | None = None) -> dict:
    import jax

    from conan_fgw_tpu.train.loop import _stack_batches

    use_bary = stage == "stage2"
    model, settings, state, batch, loop_lib = build(use_bary)
    train_step, _ = loop_lib.make_step_fns(model, settings)
    out: dict = {"stage": stage, "device": str(jax.devices()[0])}

    # per-step path: compile, then chain 8 steps with one completion barrier
    (state, loss, _), compile_s = timed(train_step, state, batch)
    fetch_barrier(loss)
    out["per_step_compile_s"] = round(compile_s, 1)
    t0 = time.perf_counter()
    for _ in range(8):
        state, loss, _ = train_step(state, batch)
    fetch_barrier(loss)
    out["per_step_8steps_s"] = round(time.perf_counter() - t0, 4)

    multi = loop_lib.make_multi_step(model, settings)
    for c in chunk_sizes:
        stacked = _stack_batches([batch] * c)
        stacked = jax.tree.map(jax.numpy.asarray, stacked)
        (state, losses, _), compile_s = timed(multi, state, stacked)
        fetch_barrier(losses)
        out[f"scan{c}_compile_s"] = round(compile_s, 1)
        trace = None
        if profile_dir:
            from conan_fgw_tpu.utils.profiling import device_trace

            trace = device_trace(os.path.join(profile_dir, f"{stage}_scan{c}"))
            trace.__enter__()
        t0 = time.perf_counter()
        state, losses, _ = multi(state, stacked)
        fetch_barrier(losses)
        out[f"scan{c}_run_s"] = round(time.perf_counter() - t0, 4)
        if trace is not None:
            trace.__exit__(None, None, None)
        out[f"scan{c}_per_step_ms"] = round(1000 * out[f"scan{c}_run_s"] / c, 2)
    out["per_step_ms"] = round(1000 * out["per_step_8steps_s"] / 8, 2)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile_dir", default=None)
    ap.add_argument("--stages", nargs="+", default=["stage1", "stage2"])
    args = ap.parse_args()
    for stage in args.stages:
        print(json.dumps(probe(stage, profile_dir=args.profile_dir)), flush=True)


if __name__ == "__main__":
    main()
