"""Batch inference: restore a checkpoint and predict over a dataset split.

The serving-side entry point the reference lacks (it only evaluates inside
``trainer.test``). Also exports pre-fusion embeddings — the reference's
visualization workflow (``EmbeddingsVisualizationBaryCenter`` +
``collate_fn_visual``, ``conan_fgw/src/model/schnet_based_models.py:372-417``,
``src/data/datasets.py:202-220``). Usage:

    python -m conan_fgw_tpu.train.predict --config cfg.yaml \
        --checkpoint outputs/models/run/1/run_conan_fgw:0 \
        --data_root . --split test --out preds.csv \
        [--embeddings emb.npz] [--platform cpu]
"""

from __future__ import annotations

import argparse
import csv

import numpy as np

from conan_fgw_tpu.train import loop as loop_lib
from conan_fgw_tpu.train.checkpoints import RunCheckpointer
from conan_fgw_tpu.train.config import load_config
from conan_fgw_tpu.train.runner import STAGE_BC, build_model, build_settings, load_datasets


def _iteration_order(records, settings, max_atoms) -> list[int]:
    """Record order the eval iterator emits (bucketed batching groups
    molecules by padded size, so it differs from input order)."""
    if not settings.bucketed:
        return list(range(len(records)))
    from conan_fgw_tpu.data.loader import bucket_order

    return bucket_order(records, buckets=loop_lib.bucket_boundaries(max_atoms))


def predict_records(model, params, records, settings, max_atoms=None, mesh=None):
    """(records_in_eval_order, predictions, targets) for MoleculeRecords."""
    max_atoms = max_atoms or loop_lib.dataset_max_atoms(records)
    _, eval_step = loop_lib.make_step_fns(model, settings)
    _, pred, y = loop_lib.evaluate(eval_step, params, records, settings, max_atoms, mesh)
    ordered = [records[i] for i in _iteration_order(records, settings, max_atoms)]
    return ordered, pred, y


def export_embeddings(model, params, records, settings, max_atoms, out_path):
    """Dump per-branch embeddings to ``out_path`` (npz): ``x3d`` (M, K, C)
    per conformer, ``x_bary`` (M, C) and ``x_cov`` (M, C) per molecule, plus
    ``mol_id``/``smiles``/``y`` aligned rows."""
    import jax

    if not hasattr(type(model), "embeddings"):
        raise SystemExit(
            f"--embeddings needs a model with an embeddings() method "
            f"(ConanModel); {type(model).__name__} has none"
        )

    @jax.jit
    def embed(p, b):
        out, _ = model.apply(p, b, method="embeddings", mutable=["diagnostics"])
        return out

    keys = ("x3d", "x_bary", "x_cov")
    parts = {k: [] for k in keys}
    for pb in loop_lib.batch_iterator(
        records, settings.batch_size, max_atoms, bucketed=settings.bucketed
    ):
        out = jax.device_get(embed(params, loop_lib._to_device_batch(pb)))
        valid = pb.mol_mask.astype(bool)
        for k in keys:
            parts[k].append(np.asarray(out[k])[valid])
    ordered = [records[i] for i in _iteration_order(records, settings, max_atoms)]
    arrays = {k: np.concatenate(parts[k]) for k in keys}
    assert arrays["x_bary"].shape[0] == len(ordered)
    np.savez_compressed(
        out_path,
        **arrays,
        mol_id=np.asarray([r.mol_id for r in ordered]),
        smiles=np.asarray([r.smiles for r in ordered]),
        y=np.asarray([r.y for r in ordered], np.float32),
    )
    print(f"wrote embeddings for {len(ordered)} molecules to {out_path}")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint", required=True, help="run directory with best/last")
    ap.add_argument("--which", default="best", choices=["best", "last"])
    ap.add_argument("--data_root", default=".")
    ap.add_argument("--split", default="test")
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--embeddings", default=None, metavar="OUT_NPZ",
        help="also export pre-fusion embeddings (x3d/x_bary/x_cov) to this npz",
    )
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

    ordered, pred, y = predict_records(model, params, records, settings, max_atoms)
    if settings.task == "classification":
        # the model emits logits (heads.py); surface probabilities
        pred = 1.0 / (1.0 + np.exp(-np.asarray(pred, dtype=np.float64)))
    rows = [
        {"mol_id": r.mol_id, "smiles": r.smiles, "prediction": float(p), "target": float(t)}
        for r, p, t in zip(ordered, pred, y)
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
    if args.embeddings:
        export_embeddings(model, params, records, settings, max_atoms, args.embeddings)
    rmse = float(np.sqrt(np.mean((pred - y) ** 2)))
    print(f"{args.split} RMSE vs targets: {rmse:.5f}")


if __name__ == "__main__":
    main()
