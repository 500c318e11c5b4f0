"""Batch inference: restore a checkpoint and predict over a dataset split.

The serving-side entry point the reference lacks (it only evaluates inside
``trainer.test``). Usage:

    python -m conan_fgw_tpu.train.predict --config cfg.yaml \
        --checkpoint outputs/models/run/1/run_conan_fgw:0 \
        --data_root . --split test --out preds.csv [--platform cpu]
"""

from __future__ import annotations

import argparse
import csv

import numpy as np

from conan_fgw_tpu.train import loop as loop_lib
from conan_fgw_tpu.train.checkpoints import RunCheckpointer
from conan_fgw_tpu.train.config import load_config
from conan_fgw_tpu.train.runner import STAGE_BC, build_model, build_settings, load_datasets


def predict_records(model, params, records, settings, max_atoms=None, mesh=None):
    """Predictions (+targets) for a list of MoleculeRecords."""
    max_atoms = max_atoms or loop_lib.dataset_max_atoms(records)
    _, eval_step = loop_lib.make_step_fns(model, settings)
    _, pred, y = loop_lib.evaluate(eval_step, params, records, settings, max_atoms, mesh)
    return pred, y


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint", required=True, help="run directory with best/last")
    ap.add_argument("--which", default="best", choices=["best", "last"])
    ap.add_argument("--data_root", default=".")
    ap.add_argument("--split", default="test")
    ap.add_argument("--out", default=None)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from conan_fgw_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    config = load_config(args.config)
    model = build_model(config, STAGE_BC)
    settings = build_settings(config, STAGE_BC)
    import os

    datasets = load_datasets(config, os.path.join(args.data_root, "data"))
    records = datasets[args.split].records()
    max_atoms = settings.max_atoms or loop_lib.dataset_max_atoms(records)

    first = next(iter(loop_lib.batch_iterator(records, settings.batch_size, max_atoms)))
    state = loop_lib.init_state(model, settings, loop_lib._to_device_batch(first))
    params = RunCheckpointer(args.checkpoint).restore_params(state.params, args.which)

    pred, y = predict_records(model, params, records, settings, max_atoms)
    rows = [
        {"mol_id": r.mol_id, "smiles": r.smiles, "prediction": float(p), "target": float(t)}
        for r, p, t in zip(records, pred, y)
    ]
    if args.out:
        with open(args.out, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["mol_id", "smiles", "prediction", "target"])
            w.writeheader()
            w.writerows(rows)
        print(f"wrote {len(rows)} predictions to {args.out}")
    else:
        for r in rows[:20]:
            print(r)
    rmse = float(np.sqrt(np.mean((pred - y) ** 2)))
    print(f"{args.split} RMSE vs targets: {rmse:.5f}")


if __name__ == "__main__":
    main()
