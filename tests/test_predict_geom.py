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
        ordered, pred, y = predict_records(model, result.state.params, recs, settings, 32)
        assert pred.shape == (10,) and y.shape == (10,)
        np.testing.assert_allclose(y, [r.y for r in ordered], rtol=1e-6)

    def test_predict_alignment_across_buckets(self):
        """Bucketed eval reorders molecules by padded size; the returned
        record list must follow the same permutation so (record, pred, y)
        rows stay aligned (the bug: zipping against the input order)."""
        from conan_fgw_tpu.data.synthetic import random_dataset
        from conan_fgw_tpu.models.heads import ConanModel
        from conan_fgw_tpu.train import loop as loop_lib
        from conan_fgw_tpu.train.predict import predict_records

        # interleave small (bucket 32) and large (bucket 64) molecules
        small = random_dataset(3, 5, num_conformers=2, heavy_range=(4, 6))
        large = random_dataset(4, 5, num_conformers=2, heavy_range=(26, 30))
        assert all(r.num_atoms > 32 for r in large)  # really in bucket 64
        recs = [r for pair in zip(small, large) for r in pair]
        for i, r in enumerate(recs):
            r.y = float(i)  # distinct labels → alignment is observable
        model = ConanModel(hidden_channels=32, num_filters=32, num_gaussians=10)
        settings = loop_lib.TrainSettings(num_epochs=1, batch_size=4, max_atoms=64)
        result = loop_lib.fit(model, settings, recs, recs[:4])
        ordered, pred, y = predict_records(model, result.state.params, recs, settings, 64)
        assert len(ordered) == len(recs) and pred.shape == (10,)
        # labels follow the reordered records, not the input order
        np.testing.assert_allclose(y, [r.y for r in ordered], rtol=1e-6)
        assert [r.y for r in ordered] != [r.y for r in recs]

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
        emb = tmp_path / "emb.npz"
        predict_cli.main([
            "--config", str(cfg),
            "--checkpoint", str(tmp_path / "models" / "p" / "1" / "run_conan_fgw_pre:0"),
            "--data_root", str(tmp_path), "--split", "test", "--out", str(out),
            "--embeddings", str(emb),
        ])
        lines = out.read_text().strip().splitlines()
        assert lines[0] == "mol_id,smiles,prediction,target"
        assert len(lines) == 2  # header + 1 test molecule
        # embeddings export: the reference's visualization workflow
        # (schnet_based_models.py:372-417) — per-branch pre-fusion embeddings
        with np.load(emb, allow_pickle=False) as z:
            assert z["x3d"].shape[:2] == (1, 2)  # (molecules, K, C)
            assert z["x_bary"].shape[0] == 1 and z["x_cov"].shape[0] == 1
            assert z["x3d"].shape[2] == z["x_bary"].shape[1] == z["x_cov"].shape[1]
            assert np.isfinite(z["x_bary"]).all()
            assert list(z["mol_id"]) == ["g5"]


class _FakeConf:
    """Duck-typed stand-in for an RDKit Conformer (GetPositions only)."""

    def __init__(self, pos):
        self._pos = np.asarray(pos, np.float64)

    def GetPositions(self):
        return self._pos


class _FakeRDMol:
    """Duck-typed stand-in for the pickled GEOM ``rd_mol`` objects: the
    converter only calls ``GetConformers()[0].GetPositions()``."""

    def __init__(self, pos):
        self._confs = [_FakeConf(pos)]

    def GetConformers(self):
        return self._confs


class TestGEOMPickleFixture:
    """Exercises the raw GEOM-Drugs pickle path (summary.json →
    per-molecule pickle of conformer dicts → npz conversion), reference
    ``datasets.py:288-349`` semantics, without needing RDKit."""

    def _make_pickles(self, root, smiles_list, confs=4):
        import pickle

        ddir = os.path.join(root, "geomtest")
        pdir = os.path.join(ddir, "pickles")
        os.makedirs(pdir, exist_ok=True)
        summary = {}
        rng = np.random.default_rng(7)
        for i, s in enumerate(smiles_list):
            mol = smi.add_hydrogens(smi.parse_smiles(s))
            n = mol.num_atoms
            conf_dic = {
                "conformers": [
                    {"rd_mol": _FakeRDMol(rng.normal(size=(n, 3)))}
                    for _ in range(confs)
                ]
            }
            rel = os.path.join("geomtest", "pickles", f"m{i}.pickle")
            with open(os.path.join(root, rel), "wb") as f:
                pickle.dump(conf_dic, f)
            summary[s] = {"pickle_path": rel}
        import json

        with open(os.path.join(ddir, "summary.json"), "w") as f:
            json.dump(summary, f)
        return summary

    def test_convert_geom_store(self, tmp_path):
        from conan_fgw_tpu.data.geom import convert_geom_store, load_geom_positions

        root = str(tmp_path)
        ddir = os.path.join(root, "geomtest")
        rows = [
            {"smiles": s, "y": 0.1 * i, "mol_id": f"g{i}"}
            for i, s in enumerate(SMILES[:3])
        ]
        write_csv(os.path.join(ddir, "train.csv"), rows, target="target")
        summary = self._make_pickles(root, SMILES[:3])
        pos = load_geom_positions(root, summary[SMILES[0]]["pickle_path"])
        assert pos.shape[0] == 4 and pos.shape[2] == 3
        out = convert_geom_store(root, "geomtest")
        for s in SMILES[:3]:
            p = conf_lib.store_path(out, s)
            assert os.path.exists(p)
            with np.load(p, allow_pickle=False) as z:
                assert z["positions"].shape[0] == 4
        # converted stores now feed the dataset RDKit-free
        ds = GEOMDataset("train", root, "geomtest", "target", num_conformers=2)
        recs = ds.records()
        assert len(recs) == 3 and all(r.pos.shape[0] == 2 for r in recs)

    def test_pickle_fallback_without_npz(self, tmp_path):
        """No converted store → the dataset reads the raw pickle directly."""
        root = str(tmp_path)
        ddir = os.path.join(root, "geomtest")
        rows = [{"smiles": SMILES[0], "y": 0.5, "mol_id": "g0"}]
        write_csv(os.path.join(ddir, "train.csv"), rows, target="target")
        self._make_pickles(root, [SMILES[0]])
        ds = GEOMDataset("train", root, "geomtest", "target", num_conformers=3)
        r = ds[0]
        assert r.pos.shape == (3, r.z.shape[0], 3)
        assert np.isfinite(r.pos).all()
