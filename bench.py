"""Benchmark: stage-2 (FGW barycenter) training-step throughput on TPU.

Prints JSON lines of the form
  {"metric": "conformer_graphs_per_sec", "value": N, "unit": "graphs/s",
   "vs_baseline": R, ...}

**Un-losable protocol**: the headline line (bucketed N=32 train step, the
shape the production ``fit()`` path actually runs ESOL-sized molecules at)
is printed and flushed IMMEDIATELY after the first measurement.  Every
optional row (unbucketed N=64, bf16, batch-256, DimeNet N=96, Pallas) then
re-prints the whole enriched line as it completes, so the driver's tail
always holds the most complete result that fit in its timeout — a timeout
can only truncate enrichment, never lose the record.  A total wall-clock
budget (``BENCH_BUDGET_S``, default 1200 s) skips remaining optional rows
when exceeded, recording ``{"skipped": "time budget"}`` for each.

The workload is the reference's headline regression configuration (ESOL,
SchNet hidden=128, K=5 conformers, batch 24 — ``esol_5_bc.yaml``,
reference protocol ``conan_fgw/script/run.sh:22-53``) on synthetic
molecules: one full jitted train step (forward incl. batched FGW
barycenters, backward, global-norm clip, Adam update).

``vs_baseline`` compares conformer-graphs/sec against a reference-style CPU
implementation (ragged gather/scatter torch with the per-molecule Python FGW
loop — see ``conan_fgw_tpu/bench_baseline.py``), measured once on this host
and cached in ``.bench_baseline.json``.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time

import numpy as np

B, K, N_ATOMS = 24, 5, 32
N_ATOMS_UNBUCKETED = 64  # the pre-bucketing dataset-max padding width
HEAVY_RANGE = (8, 13)  # ~ESOL-sized molecules once hydrogens are added
STEPS = 20
BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_baseline.json")
# last successful full record: emitted (tagged) as a provisional first line so
# a degraded device/tunnel can never produce an empty bench record
RECORD_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_record.json")
# completed enrichment rows, persisted across rounds so coverage compounds
ROW_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_rows.json")
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1200"))
_T0 = time.monotonic()


def _remaining() -> float:
    return BUDGET_S - (time.monotonic() - _T0)


def _records():
    from conan_fgw_tpu.data.synthetic import random_dataset

    return random_dataset(42, B, num_conformers=K, heavy_range=HEAVY_RANGE)


def _measure(
    batch_size: int, compute_dtype: str = "float32", n_atoms: int = N_ATOMS,
    use_pallas: bool | None = None, backbone: str = "schnet",
    use_barycenter: bool = True, use_pallas_fgw: bool | None = None,
    scan_chunk: int = 0,
) -> dict:
    """Honest per-step time via the slope method.

    On this tunneled TPU platform ``jax.block_until_ready`` returns before
    execution actually completes (verified: independent matmuls 'measure'
    at 100x the chip's peak FLOPS), so every sample here ends with a scalar
    device→host fetch of the loss — a hard completion barrier. The fetch and
    dispatch have a large fixed latency, so per-step time is the *slope*
    between a short and a long chained-step window, best of 3.
    """
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from conan_fgw_tpu.data.loader import pack
    from conan_fgw_tpu.data.packing import PackedBatch
    from conan_fgw_tpu.data.synthetic import random_dataset
    from conan_fgw_tpu.models.heads import ConanModel
    from conan_fgw_tpu.train import loop as loop_lib

    # molecules sized for the requested bucket (DimeNet row: N=96 molecules)
    heavy = (36, 42) if n_atoms >= 96 else HEAVY_RANGE
    recs = random_dataset(42, batch_size, num_conformers=K, heavy_range=heavy)
    pb = pack(recs, max_atoms=n_atoms, batch_size=batch_size)
    batch = PackedBatch(**jax.tree.map(jnp.asarray, dataclasses.asdict(pb)))

    # reference regression config; the production fit() path buckets batches
    # by atom count, so the headline shape is the N=32 bucket these molecules
    # actually land in (not the dataset-max width)
    from conan_fgw_tpu.ops.fgw import FGWConfig

    if backbone == "dimenet":
        model = ConanModel(
            backbone_name="dimenet", cutoff=5.0, bary_shift=0.5,
            compute_dtype=compute_dtype,
            fgw=FGWConfig(alpha=0.5, fixed_structure=True),
        )
    else:
        model = ConanModel(
            compute_dtype=compute_dtype, use_pallas_cfconv=use_pallas,
            fgw=FGWConfig(use_pallas_coupling=use_pallas_fgw),
        )
    settings = loop_lib.TrainSettings(use_barycenter=use_barycenter, batch_size=batch_size)
    state = loop_lib.init_state(model, settings, batch)
    if scan_chunk > 1:
        # dispatch-amortised production path: ONE device dispatch per
        # scan_chunk steps (train/loop.py::make_multi_step — the fit() path
        # protocol configs run with `scan_chunk: 8`). Per-step time from this
        # mode is (almost) pure compute; the headline minus this is the
        # per-step dispatch overhead of the tunneled chip.
        multi = loop_lib.make_multi_step(model, settings)
        stacked = loop_lib._stack_batches(  # noqa: SLF001 — bench-only reuse
            [pack(random_dataset(42 + i, batch_size, num_conformers=K,
                                 heavy_range=heavy), max_atoms=n_atoms,
                  batch_size=batch_size) for i in range(scan_chunk)]
        )
        sbatch = PackedBatch(**jax.tree.map(jnp.asarray, dataclasses.asdict(stacked)))

        def train_step(st, _b):  # chain() below feeds `batch`; ignore it
            st, losses, divs = multi(st, sbatch)
            return st, losses[-1], divs
    else:
        train_step, _ = loop_lib.make_step_fns(model, settings)

    t_compile0 = time.perf_counter()
    state, loss, _ = train_step(state, batch)
    last = float(loss)  # completion barrier
    compile_s = time.perf_counter() - t_compile0

    # analytic FLOPs/step from XLA's cost model (for the MFU line). Ops
    # inside pallas_call are INVISIBLE to cost_analysis, so when the model
    # routes through the fused kernels the count comes from an equivalent
    # all-XLA lowering (same math, path-independent FLOPs); lowerings hit
    # the persistent compile cache so this costs ~a second
    flops_per_step = None
    try:
        # force BOTH kernels off for the count (auto mode would route the
        # cfconv AND the FGW solve through pallas_call on TPU, hiding them)
        if backbone == "dimenet":
            ca_model = ConanModel(
                backbone_name="dimenet", cutoff=5.0, bary_shift=0.5,
                fgw=FGWConfig(alpha=0.5, fixed_structure=True,
                              use_pallas_coupling=False),
            )
        else:
            ca_model = ConanModel(
                compute_dtype=compute_dtype, use_pallas_cfconv=False,
                fgw=FGWConfig(use_pallas_coupling=False),
            )
        ca_step, _ = loop_lib.make_step_fns(ca_model, settings)
        ca = ca_step.lower(state, batch).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        if ca:
            f = float(ca.get("flops", 0.0))
            if np.isfinite(f) and f > 0:
                flops_per_step = f
    except Exception:  # noqa: BLE001 — cost analysis is best-effort
        pass

    def chain(n):
        nonlocal state, last
        t0 = time.perf_counter()
        for _ in range(n):
            state, loss, _ = train_step(state, batch)
        last = float(loss)
        return time.perf_counter() - t0

    # Per-step time = slope between a short and a long chained window.
    # Tunnel latency noise can make an individual slope estimate negative
    # (the r3 record emitted -0.71 ms/step from a min over 3); collect >=3
    # strictly positive slopes, re-measuring noisy ones, and take the
    # MEDIAN — unbiased under symmetric noise where min is not.
    n_short, n_long = 2, 2 + STEPS
    slopes: list[float] = []
    for _ in range(8):
        t_short = chain(n_short)
        t_long = chain(n_long)
        s = (t_long - t_short) / (n_long - n_short)
        if np.isfinite(s) and s > 0:
            slopes.append(s)
        if len(slopes) >= 3:
            break
    assert slopes, "all slope estimates were non-positive (tunnel too noisy)"
    step_s = float(np.median(slopes))
    if scan_chunk > 1:  # each chained call ran scan_chunk train steps
        step_s /= scan_chunk
    assert np.isfinite(step_s) and step_s > 0, f"invalid step_s {step_s}"
    assert np.isfinite(last), "benchmark train step produced non-finite loss"
    # self-describing flags: the RESOLVED auto-mode decisions this
    # measurement actually ran with (VERDICT r4 #8 — a row must say whether
    # the Pallas kernels were active, not make the reader infer it)
    on_tpu = jax.default_backend() == "tpu"
    flags = {
        "compute_dtype": compute_dtype,
        "use_pallas_cfconv": bool(
            (use_pallas if use_pallas is not None else on_tpu)
            and backbone == "schnet"
        ),
        "use_pallas_fgw": bool(
            (use_pallas_fgw if use_pallas_fgw is not None else on_tpu)
            and use_barycenter
        ),
        # 0 = per-step dispatch (parity path); >1 = the dispatch-amortised
        # lax.scan production path (what protocol configs run)
        "scan_chunk": scan_chunk,
        "use_barycenter": use_barycenter,
    }
    return {
        "step_s": step_s,
        "compile_s": compile_s,
        "graphs_per_s": batch_size * K / step_s,
        "device": str(jax.devices()[0]),
        "loss": last,
        "flops_per_step": flops_per_step,
        "n_slope_samples": len(slopes),
        "flags": flags,
    }


def _measure_subprocess(
    batch_size: int, compute_dtype: str = "float32", n_atoms: int = N_ATOMS,
    use_pallas: bool | None = None, backbone: str = "schnet",
    use_barycenter: bool = True, use_pallas_fgw: bool | None = None,
    scan_chunk: int = 0,
) -> dict:
    """Each measurement in a fresh process: this environment's device tunnel
    degrades ~100x for any executable after the first one in a process."""
    import subprocess
    import sys

    timeout = max(60.0, min(1200.0, _remaining()))
    pallas_arg = "a" if use_pallas is None else str(int(use_pallas))
    pfgw_arg = "a" if use_pallas_fgw is None else str(int(use_pallas_fgw))
    res = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--measure", str(batch_size),
         compute_dtype, str(n_atoms), pallas_arg, backbone,
         str(int(use_barycenter)), pfgw_arg, str(scan_chunk)],
        capture_output=True, text=True, check=True, timeout=timeout,
    )
    return json.loads(res.stdout.strip().splitlines()[-1])


def measure_baseline() -> float:
    """Reference-style CPU seconds/step (cached across rounds)."""
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["step_s"]
    from conan_fgw_tpu.bench_baseline import measure_reference_style_step

    mols = [(r.z, r.pos, r.x2d, r.bonds, r.bond_attr, r.y) for r in _records()]
    step_s = measure_reference_style_step(mols, steps=2)
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"step_s": step_s, "B": B, "K": K, "host": os.uname().nodename}, f)
    return step_s


DIMENET_BASELINE_CACHE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".bench_baseline_dimenet.json"
)


def measure_dimenet_baseline() -> float:
    """Reference-style CPU DimeNet seconds/graph at the dimenet_n96 shape
    (cached across rounds) — the denominator VERDICT r4 #6 asked for.

    Measured on ONE molecule (x K conformer graphs) and extrapolated: the
    reference pipeline is an independent per-molecule Python loop, so
    per-molecule step cost is constant in batch size (a full-batch-8 torch
    measurement costs ~7 CPU-minutes per step on this host — ~50 s/molecule;
    the 1-molecule measurement is the same quantity at 1/8 the wall time).
    Returns seconds per batch-8 step equivalent (8 * per-molecule seconds).
    """
    if os.path.exists(DIMENET_BASELINE_CACHE):
        with open(DIMENET_BASELINE_CACHE) as f:
            return json.load(f)["step_s"]
    from conan_fgw_tpu.bench_baseline import measure_reference_dimenet_step
    from conan_fgw_tpu.data.synthetic import random_dataset

    recs = random_dataset(42, 1, num_conformers=K, heavy_range=(36, 42))
    mols = [(r.z, r.pos, r.x2d, r.bonds, r.bond_attr, r.y) for r in recs]
    step_s = 8 * measure_reference_dimenet_step(mols, steps=1)
    with open(DIMENET_BASELINE_CACHE, "w") as f:
        json.dump({"step_s": step_s, "B": 8, "K": K, "max_atoms": 96,
                   "measured_molecules": 1, "extrapolated_to_batch": 8,
                   "host": os.uname().nodename}, f)
    return step_s


def _emit(headline: dict, detail: dict, vs: float | None, base_gps: float | None) -> None:
    """Print the full record as one JSON line and flush — called after every
    completed row so the driver's tail always ends with the best-known state.
    Each record is also persisted to ``RECORD_CACHE`` for the provisional
    first line of future runs."""
    record = {
        "metric": "conformer_graphs_per_sec",
        "value": round(headline["graphs_per_s"], 2),
        "unit": "graphs/s",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "detail": {
            "step_s": round(headline["step_s"], 5),
            "compile_s": round(headline["compile_s"], 1),
            "baseline_graphs_per_s": round(base_gps, 2) if base_gps else None,
            "batch": B, "conformers": K, "max_atoms": N_ATOMS,
            "device": headline["device"],
            "flags": headline.get("flags"),
            **detail,
        },
    }
    print(json.dumps(record), flush=True)
    # never persist a corrupt record: a poisoned cache re-emits as future
    # rounds' provisional line (this is exactly how the r3 negative headline
    # would have propagated into r4)
    v = record["value"]
    if isinstance(v, (int, float)) and np.isfinite(v) and v > 0:
        try:
            with open(RECORD_CACHE, "w") as f:
                json.dump(record, f)
        except OSError:
            pass


def _load_row_cache() -> dict:
    if os.path.exists(ROW_CACHE):
        try:
            with open(ROW_CACHE) as f:
                return json.load(f)
        except (OSError, ValueError):
            pass
    return {}


def _save_row_cache(rows: dict) -> None:
    try:
        with open(ROW_CACHE, "w") as f:
            json.dump(rows, f)
    except OSError:
        pass


def main():
    detail: dict = {}

    # --- provisional line: the last successful record, tagged as cached, so
    # even a fully-degraded device/tunnel leaves a parseable record in the
    # driver's tail. Superseded by every fresh line below. A cached record
    # with a non-positive/non-finite value is corrupt — drop it on sight.
    if os.path.exists(RECORD_CACHE):
        try:
            with open(RECORD_CACHE) as f:
                prev = json.load(f)
            v = prev.get("value")
            if isinstance(v, (int, float)) and np.isfinite(v) and v > 0:
                prev.setdefault("detail", {})["cached_record"] = (
                    "provisional: previous successful run; superseded by any later line"
                )
                print(json.dumps(prev), flush=True)
            else:
                os.remove(RECORD_CACHE)
        except (OSError, ValueError):
            pass

    # --- headline first: bucketed N=32 train step; printed before anything
    # else. A degraded device/tunnel (observed: trivial matmuls taking 100+s
    # after heavy chip use) can stall the measurement past its timeout; retry
    # a bounded number of times (a fast-failing subprocess must not spin the
    # whole budget away) and fall back to the provisional record.
    headline = None
    for attempt in range(3):
        try:
            headline = _measure_subprocess(B)
            break
        except Exception as e:  # noqa: BLE001 — subprocess timeout/crash
            print(f"# headline measurement failed ({attempt + 1}/3): {type(e).__name__}", flush=True)
            if _remaining() < 180:
                break
            time.sleep(5)
    if headline is None:
        # emit a fresh failure-tagged record so the tail's LAST line always
        # reflects THIS run, even when a stale provisional record exists
        print(
            json.dumps({
                "metric": "conformer_graphs_per_sec", "value": None,
                "unit": "graphs/s", "vs_baseline": None,
                "detail": {
                    "failed": "device unresponsive within budget",
                    "provisional_above": os.path.exists(RECORD_CACHE),
                },
            }),
            flush=True,
        )
        return
    _emit(headline, detail, None, None)

    # --- CPU baseline denominator (cached across rounds → usually instant)
    try:
        base_step_s = measure_baseline()
        base_gps = B * K / base_step_s
        vs = headline["graphs_per_s"] / base_gps
    except Exception as e:  # baseline is best-effort; never break the bench
        base_gps, vs = None, None
        print(f"# baseline measurement failed: {e!r}", flush=True)

    # --- MFU: XLA's analytic FLOP count for the whole train step (forward
    # incl. batched FGW barycenters + backward + Adam) over measured time,
    # against the chip's published peak. v5e (TPU v5 lite) peak is 197
    # TFLOP/s bf16; f32 matmuls run through multi-pass bf16 on the MXU, so
    # vs-bf16-peak is the conservative denominator for the f32 headline.
    if headline.get("flops_per_step"):
        achieved = headline["flops_per_step"] / headline["step_s"]
        detail["mfu"] = {
            "flops_per_step": round(headline["flops_per_step"]),
            "achieved_gflops": round(achieved / 1e9, 1),
            "peak_flops_assumed": 197e12,
            "mfu_pct_vs_bf16_peak": round(100 * achieved / 197e12, 3),
        }
    _emit(headline, detail, vs, base_gps)

    # --- optional enrichment rows. Completed rows persist across rounds in
    # ROW_CACHE and pre-populate the record (tagged); rows with NO prior
    # record run FIRST so the budget compounds toward full coverage instead
    # of re-measuring the same cheap rows every round. A row that doesn't
    # fit records {"skipped": ...}; a failing one {"unavailable": ...}.
    row_cache = _load_row_cache()
    known_keys = {
        "pallas_fgw", "xla_cfconv", "large_batch", "dimenet_n96",
        "xla_large_batch_f32", "large_batch_f32", "unbucketed_n64",
        "mixed_precision", "stage1_no_barycenter", "scan_chunk8",
        "scan_chunk8_bf16", "dimenet_n96_bf16",
    }
    # rows whose semantics were retired (e.g. pallas_* rows from before the
    # Pallas-by-default flip) must not linger as stale cached entries, and
    # pre-r5 rows without the self-describing "flags" block are stale too
    # (r5 flipped the FGW kernel on by default, changing every row's meaning)
    row_cache = {k: v for k, v in row_cache.items()
                 if k in known_keys and v.get("flags") is not None}
    for key, cached in row_cache.items():
        detail[key] = {**cached, "cached_from_prior_round": True}

    def row(key: str, min_budget_s: float, fn) -> None:
        if _remaining() < min_budget_s:
            if key not in detail:
                detail[key] = {"skipped": f"time budget ({_remaining():.0f}s left < {min_budget_s:.0f}s)"}
        else:
            try:
                fresh = fn()
                detail[key] = fresh
                row_cache[key] = fresh
                _save_row_cache(row_cache)
            except Exception as e:  # noqa: BLE001
                detail[key] = {"unavailable": str(e)[:200]}
        _emit(headline, detail, vs, base_gps)

    # the cfconv now routes through the fused Pallas kernel by default on
    # TPU f32 (models/schnet.py auto mode), so the HEADLINE is the Pallas
    # path; this row measures the pure-XLA formulation for the ratio
    def _xla_cfconv():
        m = _measure_subprocess(B, "float32", N_ATOMS, use_pallas=False)
        return {
            "use_pallas_cfconv": False,
            "step_s": round(m["step_s"], 5),
            "graphs_per_s": round(m["graphs_per_s"], 1),
            "pallas_speedup": round(headline["graphs_per_s"] / m["graphs_per_s"], 3),
            "flags": m.get("flags"),
        }

    def _big():
        m = _measure_subprocess(256, "bfloat16")
        return {
            "batch": 256,
            "compute_dtype": "bfloat16",
            "step_s": round(m["step_s"], 5),
            "graphs_per_s": round(m["graphs_per_s"], 1),
            "flags": m.get("flags"),
        }

    # DimeNet at N=96: the neighbor-slot triplet layout (N·M² activations)
    # is what makes this fit in HBM at all — the dense N³ formulation costs
    # ~9x more (models/dimenet.py).
    def _dimenet():
        m = _measure_subprocess(8, "float32", 96, backbone="dimenet")
        r = {
            "batch": 8, "max_atoms": 96,
            "step_s": round(m["step_s"], 5),
            "graphs_per_s": round(m["graphs_per_s"], 1),
            "flags": m.get("flags"),
        }
        try:  # CPU torch denominator, cached across rounds (VERDICT r4 #6)
            base_s = measure_dimenet_baseline()
            base_gps_d = 8 * K / base_s
            r["baseline_graphs_per_s"] = round(base_gps_d, 2)
            r["vs_baseline"] = round(m["graphs_per_s"] / base_gps_d, 1)
        except Exception as e:  # noqa: BLE001
            r["baseline_error"] = str(e)[:160]
        return r

    # DimeNet with bf16 triplet intermediates (models/dimenet.py
    # compute_dtype): the PARITY.md roofline says this shape is HBM-bound by
    # the N·M² triplet activations, so halving their bytes is the only
    # headroom — this row measures how much of the theoretical 2x arrives
    def _dimenet_bf16():
        m = _measure_subprocess(8, "bfloat16", 96, backbone="dimenet")
        r = {
            "batch": 8, "max_atoms": 96,
            "compute_dtype": "bfloat16",
            "step_s": round(m["step_s"], 5),
            "graphs_per_s": round(m["graphs_per_s"], 1),
            "flags": m.get("flags"),
        }
        ref = detail.get("dimenet_n96", {}).get("graphs_per_s")
        if ref:
            r["vs_f32"] = round(m["graphs_per_s"] / ref, 3)
        return r

    # the same molecules padded to the pre-bucketing dataset-max width: the
    # production fit() path avoids this padding waste via atom-count buckets
    def _unbucketed():
        wide = _measure_subprocess(B, "float32", N_ATOMS_UNBUCKETED)
        return {
            "max_atoms": N_ATOMS_UNBUCKETED,
            "step_s": round(wide["step_s"], 5),
            "graphs_per_s": round(wide["graphs_per_s"], 1),
            "bucketing_speedup": round(headline["graphs_per_s"] / wide["graphs_per_s"], 2),
            "flags": wide.get("flags"),
        }

    # trunk in bfloat16 (params/FGW stay f32): the supported mixed-precision
    # mode, ~0.6% output deviation, full MXU rate on the cfconv filter MLP
    def _bf16():
        m = _measure_subprocess(B, "bfloat16")
        return {
            "compute_dtype": "bfloat16",
            "step_s": round(m["step_s"], 5),
            "graphs_per_s": round(m["graphs_per_s"], 1),
            "flags": m.get("flags"),
        }

    # stage-1 (no barycenter) step at the same shape: the difference vs the
    # headline is the in-forward FGW barycenter solve's cost share (a
    # fraction — clamped to [0,1])
    def _no_bary():
        m = _measure_subprocess(B, use_barycenter=False)
        return {
            "use_barycenter": False,
            "step_s": round(m["step_s"], 5),
            "graphs_per_s": round(m["graphs_per_s"], 1),
            "fgw_share_of_step": round(
                min(1.0, max(0.0, 1.0 - m["step_s"] / headline["step_s"])), 3
            ),
            "flags": m.get("flags"),
        }

    # at batch 256 the XLA path materialises ~0.3 GB of (B·K, N, N, F)
    # filter tensors per layer in HBM; the fused forward+backward kernels
    # never leave VMEM — this pair shows the saving where it bites most
    # (f32 vs f32 at the same shape; auto = Pallas on TPU)
    def _big_f32():
        m = _measure_subprocess(256, "float32")
        r = {
            "batch": 256,
            "step_s": round(m["step_s"], 5),
            "graphs_per_s": round(m["graphs_per_s"], 1),
        }
        r["flags"] = m.get("flags")
        ref = detail.get("xla_large_batch_f32", {}).get("graphs_per_s")
        if ref:
            r["pallas_speedup"] = round(m["graphs_per_s"] / ref, 3)
        return r

    def _xla_big_f32():
        m = _measure_subprocess(256, "float32", N_ATOMS, use_pallas=False)
        return {
            "batch": 256,
            "use_pallas_cfconv": False,
            "step_s": round(m["step_s"], 5),
            "graphs_per_s": round(m["graphs_per_s"], 1),
            "flags": m.get("flags"),
        }

    # fused Pallas FGW coupling solver (ops/pallas/fgw.py) is ON BY DEFAULT
    # on TPU since r5, so the HEADLINE is the Pallas-FGW path; this row
    # measures the step with the XLA nested-scan solver forced, and vs_xla
    # is the headline's speedup over it (FGW = fgw_share_of_step of the
    # step, so this is the kernel's whole-step win)
    def _pallas_fgw():
        m = _measure_subprocess(B, use_pallas_fgw=False)
        return {
            "measured": "xla_fgw_denominator",
            "step_s": round(m["step_s"], 5),
            "graphs_per_s": round(m["graphs_per_s"], 1),
            "vs_xla": round(headline["graphs_per_s"] / m["graphs_per_s"], 3),
            "flags": m.get("flags"),
        }

    # the dispatch-amortised production path (scan_chunk=8, what protocol
    # configs actually run): per-step time here is ~pure compute, so the
    # delta vs the per-step headline IS the dispatch overhead — the evidence
    # behind the "dispatch-bound" claim (VERDICT r4 #8), and the f32/bf16
    # pair below shows whether bf16 wins once dispatch is amortised away
    def _scan8():
        m = _measure_subprocess(B, "float32", scan_chunk=8)
        return {
            "scan_chunk": 8,
            "step_s": round(m["step_s"], 5),
            "graphs_per_s": round(m["graphs_per_s"], 1),
            "dispatch_share_of_headline_step": round(
                min(1.0, max(0.0, 1.0 - m["step_s"] / headline["step_s"])), 3
            ),
            "flags": m.get("flags"),
        }

    def _scan8_bf16():
        m = _measure_subprocess(B, "bfloat16", scan_chunk=8)
        r = {
            "scan_chunk": 8,
            "compute_dtype": "bfloat16",
            "step_s": round(m["step_s"], 5),
            "graphs_per_s": round(m["graphs_per_s"], 1),
            "flags": m.get("flags"),
        }
        ref = detail.get("scan_chunk8", {}).get("graphs_per_s")
        if ref:
            r["vs_scan8_f32"] = round(m["graphs_per_s"] / ref, 3)
        return r

    all_rows = [
        ("pallas_fgw", 120, _pallas_fgw),
        ("scan_chunk8", 120, _scan8),
        ("scan_chunk8_bf16", 120, _scan8_bf16),
        ("xla_cfconv", 120, _xla_cfconv),
        ("large_batch", 150, _big),
        ("dimenet_n96", 240, _dimenet),
        ("dimenet_n96_bf16", 240, _dimenet_bf16),
        ("xla_large_batch_f32", 150, _xla_big_f32),
        ("large_batch_f32", 150, _big_f32),
        ("unbucketed_n64", 120, _unbucketed),
        ("mixed_precision", 120, _bf16),
        ("stage1_no_barycenter", 120, _no_bary),
    ]
    # never-yet-recorded rows first, then refresh previously-cached rows
    ordered = [r for r in all_rows if r[0] not in row_cache] + [
        r for r in all_rows if r[0] in row_cache
    ]
    for key, min_budget_s, fn in ordered:
        row(key, min_budget_s, fn)


if __name__ == "__main__":
    import sys

    if len(sys.argv) >= 3 and sys.argv[1] == "--measure":
        dtype = sys.argv[3] if len(sys.argv) > 3 else "float32"
        n_atoms = int(sys.argv[4]) if len(sys.argv) > 4 else N_ATOMS
        raw = sys.argv[5] if len(sys.argv) > 5 else "a"
        use_pallas = None if raw == "a" else bool(int(raw))
        backbone = sys.argv[6] if len(sys.argv) > 6 else "schnet"
        use_bary = bool(int(sys.argv[7])) if len(sys.argv) > 7 else True
        raw_pfgw = sys.argv[8] if len(sys.argv) > 8 else "a"
        use_pfgw = None if raw_pfgw == "a" else bool(int(raw_pfgw))
        scan_chunk = int(sys.argv[9]) if len(sys.argv) > 9 else 0
        print(json.dumps(
            _measure(int(sys.argv[2]), dtype, n_atoms, use_pallas, backbone,
                     use_bary, use_pfgw, scan_chunk)
        ))
    else:
        main()
