"""GEOM-scale eval-path exercise (VERDICT r3 #8).

The batched eval gather (``loop.py::evaluate``) claims O(1) host↔device
sync rounds per split — device outputs are collected asynchronously and
fetched once at the end — instead of the reference's per-batch fetch +
final DDP ``all_gather`` (``common.py:307-333``). This script verifies the
claim at GEOM-Drugs scale: it builds an ~N-thousand-molecule synthetic
dataset (the GEOM sets are 5-10k molecules of comparable size), runs one
full eval epoch, and reports wall time and per-molecule throughput

  * single-chip on the ambient backend, and
  * over an 8-device CPU mesh (``--mesh``, run in a subprocess with
    ``xla_force_host_platform_device_count=8``) to exercise the sharded
    gather path.

Prints one JSON line per configuration (recorded in RESULTS.md).

Usage:  python scripts/eval_geom_scale.py [--n 8000] [--mesh]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

K, BATCH = 5, 96


def run(n_mols: int, use_mesh: bool) -> dict:
    import jax

    from conan_fgw_tpu.data.synthetic import random_dataset
    from conan_fgw_tpu.models.heads import ConanModel
    from conan_fgw_tpu.train import loop as loop_lib

    mesh = None
    if use_mesh:
        from conan_fgw_tpu.parallel import mesh as mesh_lib

        mesh = mesh_lib.create_mesh()
    t0 = time.perf_counter()
    records = random_dataset(7, n_mols, num_conformers=K, heavy_range=(8, 13))
    gen_s = time.perf_counter() - t0

    model = ConanModel()
    settings = loop_lib.TrainSettings(use_barycenter=False, batch_size=BATCH)
    max_atoms = loop_lib.dataset_max_atoms(records)
    first = next(iter(loop_lib.batch_iterator(records, BATCH, max_atoms)))
    import dataclasses as dc

    import jax.numpy as jnp

    from conan_fgw_tpu.data.packing import PackedBatch

    batch = PackedBatch(**jax.tree.map(jnp.asarray, dc.asdict(first)))
    state = loop_lib.init_state(model, settings, batch)
    _, eval_step = loop_lib.make_step_fns(model, settings)

    # warm-up compile on every bucket shape so the timed epoch is pure eval
    t0 = time.perf_counter()
    loop_lib.evaluate(eval_step, state.params, records[: 4 * BATCH], settings,
                      max_atoms, mesh)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    metrics, preds, ys = loop_lib.evaluate(
        eval_step, state.params, records, settings, max_atoms, mesh
    )
    eval_s = time.perf_counter() - t0
    assert preds.shape[0] == len(records), (preds.shape, len(records))
    assert np.isfinite(preds).all()
    return {
        "n_molecules": len(records),
        "batch": BATCH,
        "conformers": K,
        "mesh": f"{mesh.devices.size}-device" if mesh is not None else None,
        "backend": jax.default_backend(),
        "gen_s": round(gen_s, 1),
        "warmup_s": round(compile_s, 1),
        "eval_epoch_s": round(eval_s, 2),
        "molecules_per_s": round(len(records) / eval_s, 1),
        "val_loss": round(float(metrics["loss"]), 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8000)
    ap.add_argument("--mesh", action="store_true",
                    help="run on a forced 8-device CPU mesh (subprocess)")
    args = ap.parse_args()
    if args.mesh and "XLA_FLAGS" not in os.environ:
        # re-exec with the virtual 8-device CPU topology
        import subprocess

        env = dict(os.environ,
                   XLA_FLAGS="--xla_force_host_platform_device_count=8",
                   JAX_PLATFORMS="cpu")
        res = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--n", str(args.n),
             "--mesh"], env=env, text=True, capture_output=True, check=True)
        print(res.stdout.strip().splitlines()[-1])
        return
    if args.mesh:
        import jax

        jax.config.update("jax_platforms", "cpu")
    print(json.dumps(run(args.n, args.mesh)), flush=True)


if __name__ == "__main__":
    main()
