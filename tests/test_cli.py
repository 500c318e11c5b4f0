"""Production CLI (`runner.main`) end-to-end: multi-device data parallelism
and per-epoch conformer resampling, exercised exactly as a user would
(`python -m conan_fgw_tpu.train.runner ...`) on the virtual 8-device mesh.
"""

import json
import os

import jax
import numpy as np
import pytest

from conan_fgw_tpu.data.datasets import ConformerDataset, write_csv
from conan_fgw_tpu.train import runner

SMILES = [
    ("CCO", -0.3), ("CCC", 1.0), ("c1ccccc1", 2.1), ("CC(=O)O", -0.2),
    ("CCN", -0.1), ("CCOC", 0.8), ("CCCl", 1.4), ("c1ccncc1", 0.6),
    ("CC(C)C", 1.3), ("CCCO", -0.1), ("CNC", -0.4), ("COC", 0.1),
]


def _write_dataset(root):
    rows = [
        {"smiles": s, "y": y, "mol_id": f"m{i}"}
        for i, (s, y) in enumerate(SMILES)
    ]
    for mode, sl in [("train", slice(0, 8)), ("valid", slice(8, 10)),
                     ("test", slice(10, 12))]:
        write_csv(os.path.join(root, "data", "mini", f"{mode}.csv"),
                  rows[sl], target="target")


def _write_config(path, experiment="conan_fgw.src.experiments.SOTAExperiment"):
    path.write_text(
        "dataset_name: ['mini']\n"
        "target: ['target']\n"
        "num_conformers: 2\n"
        "batch_size: 8\n"
        f"experiment: {experiment}\n"
        "num_epochs: 2\n"
        "learning_rate: 0.001\n"
        "early_stopping:\n  min_delta: 0.0001\n  patience: 50\n"
    )


class TestRunnerCLIMultiDevice:
    @pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
    def test_dp_via_cli_matches_single_device(self, tmp_path):
        """`--num_devices 8` (the default auto-mesh on an 8-chip host) must
        train equivalently to `--num_devices 1` through the production CLI —
        VERDICT #2: multi-chip reachable from `runner.main()`."""
        _write_dataset(str(tmp_path))
        cfg = tmp_path / "mini.yaml"
        _write_config(cfg)
        outs = {}
        for n in (1, 8):
            out_json = tmp_path / f"out{n}.json"
            runner.main([
                "--config", str(cfg), "--stage", "conan_fgw_pre",
                "--data_root", str(tmp_path),
                "--run_name", f"dp{n}", "--run_id", "1",
                "--models_dir", str(tmp_path / f"models{n}"),
                "--logs_dir", str(tmp_path / "logs"),
                "--num_devices", str(n),
                "--out_json", str(out_json),
            ])
            outs[n] = json.loads(out_json.read_text())
        r1 = outs[1]["test_rmse"]["mean"]
        r8 = outs[8]["test_rmse"]["mean"]
        assert np.isfinite(r1) and np.isfinite(r8)
        # same data, same seed; sharding only changes reduction order
        np.testing.assert_allclose(r1, r8, rtol=2e-3)


class TestPerEpochResampling:
    def test_two_epochs_see_different_conformers(self, tmp_path):
        """With a store holding more conformers than K, successive epochs
        draw different K-subsets (reference per-__getitem__ sampling,
        datasets.py:150-168 — here keyed on set_epoch so every host draws
        identically)."""
        _write_dataset(str(tmp_path))
        ds = ConformerDataset(
            "train", str(tmp_path / "data"), "mini", "target",
            num_conformers=2, store_conformers=6,
        )
        a = ds.records()
        ds.set_epoch(1)
        b = ds.records()
        # identical atoms/features, but at least one molecule's conformer
        # subset differs between the two epochs
        assert any(
            not np.array_equal(ra.pos, rb.pos) for ra, rb in zip(a, b)
        )
        assert all(np.array_equal(ra.z, rb.z) for ra, rb in zip(a, b))

    def test_runner_uses_provider(self, tmp_path, monkeypatch):
        """run_experiment wires the dataset's records() as the per-epoch
        provider when loading from disk."""
        _write_dataset(str(tmp_path))
        cfg = tmp_path / "mini.yaml"
        _write_config(cfg)
        calls = {"n": 0}
        orig = ConformerDataset.records

        def counting(self):
            if self.mode == "train":
                calls["n"] += 1
            return orig(self)

        monkeypatch.setattr(ConformerDataset, "records", counting)
        config = runner.load_config(str(cfg))
        runner.run_experiment(
            config, stage=runner.STAGE_PRE,
            data_dir=str(tmp_path / "data"),
            run_name="p", run_id="1", models_dir=str(tmp_path / "models"),
        )
        # initial snapshot + one per epoch (2 epochs; first epoch reuses it)
        assert calls["n"] >= 2
