"""Predict CLI and GEOM dataset path (the CoV-2 / SARS data layout)."""

import os

import numpy as np
import pytest

from conan_fgw_tpu.data import conformers as conf_lib
from conan_fgw_tpu.data import smiles as smi
from conan_fgw_tpu.data.datasets import write_csv
from conan_fgw_tpu.data.geom import GEOMDataset

SMILES = ["CCO", "CCC", "CCN", "COC", "CCCl", "CC(C)C"]


def _make_geom_dataset(root, num_conformers=3, stored_confs=5):
    """CSV + npz conformer stores in the GEOM layout (no summary.json —
    exercises the converted-store path)."""
    ddir = os.path.join(root, "geomtest")
    npz_dir = os.path.join(ddir, "conformers_npz")
    os.makedirs(npz_dir, exist_ok=True)
    rows = [
        {"smiles": s, "y": float(i) * 0.3 - 0.5, "mol_id": f"g{i}"}
        for i, s in enumerate(SMILES)
    ]
    for mode, sl in [("train", slice(0, 4)), ("valid", slice(4, 5)), ("test", slice(5, 6))]:
        write_csv(os.path.join(ddir, f"{mode}.csv"), rows[sl], target="target")
    for s in SMILES:
        mol = smi.add_hydrogens(smi.parse_smiles(s))
        pos = conf_lib.dg_generate(mol, stored_confs, seed=1)
        np.savez_compressed(
            conf_lib.store_path(npz_dir, s), positions=pos, smiles=np.str_(s)
        )
    return root


class TestGEOMDataset:
    def test_records_from_npz_store(self, tmp_path):
        root = _make_geom_dataset(str(tmp_path))
        ds = GEOMDataset("train", root, "geomtest", "target", num_conformers=3)
        recs = ds.records()
        assert len(recs) == 4
        for r in recs:
            assert r.pos.shape[0] == 3  # resampled 5 stored → K=3
            assert r.pos.shape[1] == r.z.shape[0]
            assert np.isfinite(r.pos).all()

    def test_oversampling_when_fewer_stored(self, tmp_path):
        root = _make_geom_dataset(str(tmp_path), stored_confs=2)
        ds = GEOMDataset("train", root, "geomtest", "target", num_conformers=4)
        r = ds[0]
        assert r.pos.shape[0] == 4  # random.choices upsampling

    def test_atom_count_mismatch_raises(self, tmp_path):
        root = _make_geom_dataset(str(tmp_path))
        npz_dir = os.path.join(root, "geomtest", "conformers_npz")
        bad = np.zeros((3, 2, 3), np.float32)  # wrong atom count
        np.savez_compressed(
            conf_lib.store_path(npz_dir, SMILES[0]), positions=bad,
            smiles=np.str_(SMILES[0]),
        )
        ds = GEOMDataset("train", root, "geomtest", "target", num_conformers=3)
        with pytest.raises(ValueError, match="atom ordering"):
            _ = ds[0]


class TestPredict:
    def test_predict_records(self):
        """predict_records on a freshly trained model returns aligned preds."""
        from conan_fgw_tpu.data.synthetic import random_dataset
        from conan_fgw_tpu.models.heads import ConanModel
        from conan_fgw_tpu.train import loop as loop_lib
        from conan_fgw_tpu.train.predict import predict_records

        recs = random_dataset(21, 10, num_conformers=2, heavy_range=(4, 6))
        model = ConanModel(hidden_channels=32, num_filters=32, num_gaussians=10)
        settings = loop_lib.TrainSettings(
            num_epochs=1, batch_size=4, max_atoms=32, use_barycenter=False
        )
        result = loop_lib.fit(model, settings, recs, recs[:4])
        pred, y = predict_records(model, result.state.params, recs, settings, 32)
        assert pred.shape == (10,) and y.shape == (10,)
        np.testing.assert_allclose(y, [r.y for r in recs], rtol=1e-6)

    def test_predict_cli(self, tmp_path):
        """Full CLI: runner trains on a tiny on-disk dataset, predict restores
        the checkpoint and writes a CSV."""
        from conan_fgw_tpu.train import predict as predict_cli
        from conan_fgw_tpu.train import runner as runner_cli

        root = _make_geom_dataset(str(tmp_path / "data"))
        cfg = tmp_path / "mini.yaml"
        cfg.write_text(
            "dataset_name: ['geomtest']\n"
            "target: ['target']\n"
            "num_conformers: 2\n"
            "batch_size: 4\n"
            "experiment: regression\n"
            "num_epochs: 1\n"
            "learning_rate: 0.001\n"
            "model_name: schnet\n"
            "max_atoms: 32\n"
        )
        runner_cli.main([
            "--config", str(cfg), "--stage", "conan_fgw_pre",
            "--data_root", str(tmp_path), "--run_name", "p", "--run_id", "1",
            "--models_dir", str(tmp_path / "models"),
            "--logs_dir", str(tmp_path / "logs"),
            "--metrics_dir", str(tmp_path / "metrics"),
        ])
        out = tmp_path / "preds.csv"
        predict_cli.main([
            "--config", str(cfg),
            "--checkpoint", str(tmp_path / "models" / "p" / "1" / "run_conan_fgw_pre:0"),
            "--data_root", str(tmp_path), "--split", "test", "--out", str(out),
        ])
        lines = out.read_text().strip().splitlines()
        assert lines[0] == "mol_id,smiles,prediction,target"
        assert len(lines) == 2  # header + 1 test molecule
