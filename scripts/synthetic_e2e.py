"""End-to-end two-stage training sanity run on synthetic molecules.

No MoleculeNet CSVs ship with this environment (zero egress), so this script
validates the full training dynamics — stage-1 pretraining, stage-2
warm-started barycenter training, early stopping, checkpoints, test
evaluation — on a deterministic synthetic dataset with a learnable
geometry-dependent target. Prints per-stage test RMSE.

    python scripts/synthetic_e2e.py [--platform cpu] [--epochs 25] [--size 200]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--size", type=int, default=200)
    ap.add_argument("--models_dir", default="/tmp/conan_fgw_tpu_synth")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_tpu"))

    from conan_fgw_tpu.data.synthetic import random_dataset
    from conan_fgw_tpu.train.config import ExperimentConfig
    from conan_fgw_tpu.train.runner import STAGE_BC, STAGE_PRE, run_experiment
    from conan_fgw_tpu.utils.runlog import build_logger

    build_logger()

    full = random_dataset(123, args.size + 60, num_conformers=3, heavy_range=(4, 9))
    datasets = {
        "train": full[: args.size],
        "valid": full[args.size : args.size + 30],
        "test": full[args.size + 30 :],
    }

    def config(experiment, lr, epochs):
        return ExperimentConfig(
            dataset_name=["synthetic"], target=["y"], num_conformers=3,
            batch_size=32, experiment=experiment, num_epochs=epochs,
            learning_rate=lr, es_patience=max(10, epochs), max_atoms=32,
        )

    print("=== stage 1: conan_fgw_pre ===")
    s1, _ = run_experiment(
        config("regression", 2e-3, args.epochs), stage=STAGE_PRE,
        datasets=datasets, run_name="synth", run_id="0",
        models_dir=args.models_dir,
    )
    print("=== stage 2: conan_fgw (warm-started) ===")
    s2, _ = run_experiment(
        config("regression_bc", 1e-3, args.epochs), stage=STAGE_BC,
        datasets=datasets, run_name="synth", run_id="0",
        models_dir=args.models_dir,
    )
    r1 = s1["test_rmse"]["mean"]
    r2 = s2["test_rmse"]["mean"]
    print(f"\nstage-1 test RMSE: {r1:.4f}\nstage-2 test RMSE: {r2:.4f}")
    import numpy as np

    ys = np.asarray([r.y for r in datasets["train"]])
    print(f"target std (predict-the-mean RMSE floor): {ys.std():.4f}")


if __name__ == "__main__":
    main()
