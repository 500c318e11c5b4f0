"""MoleculeNet download path end-to-end against a local fixture.

North star #1 (real-dataset accuracy parity) is blocked on network egress,
but the code path itself — download -> sha256 manifest -> scaffold split ->
conformer store -> training through the runner CLI — must not be the
untested part (VERDICT r4 #7). ``urllib.urlretrieve`` accepts ``file://``
URLs, so a tiny ESOL-format CSV on disk stands in for the deepchem S3
object; everything downstream of the URL is the exact production path of
``scripts/prepare_data.py --download esol`` (reference data contract:
``conan_fgw/src/data/datasets.py:107-220``).
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import prepare_data  # noqa: E402

# ESOL raw-CSV schema: deepchem's delaney-processed.csv column names
_RAW_HEADER = (
    "Compound ID,smiles,measured log solubility in mols per litre\n"
)
_ROWS = [
    ("ethanol", "CCO", -0.30),
    ("propane", "CCC", 1.00),
    ("benzene", "c1ccccc1", 2.10),
    ("acetic acid", "CC(=O)O", -0.17),
    ("ethylamine", "CCN", -0.13),
    ("ethyl methyl ether", "CCOC", 0.84),
    ("chloroethane", "CCCl", 1.43),
    ("pyridine", "c1ccncc1", 0.65),
    ("isobutane", "CC(C)C", 1.33),
    ("1-propanol", "CCCO", -0.12),
    ("dimethylamine", "CNC", -0.38),
    ("dimethyl ether", "COC", 0.10),
    ("toluene", "Cc1ccccc1", 2.25),
    ("aniline", "Nc1ccccc1", 1.05),
    # distinct ring systems so the scaffold splitter has enough scaffold
    # sets to fill all three splits on a small fixture
    ("naphthalene", "c1ccc2ccccc2c1", 3.30),
    ("furan", "c1ccoc1", 0.80),
    ("thiophene", "c1ccsc1", 1.20),
    ("cyclohexane", "C1CCCCC1", 2.90),
    ("tetrahydrofuran", "C1CCOC1", -0.50),
    ("cyclopentane", "C1CCCC1", 2.40),
]


def _write_fixture(path):
    with open(path, "w") as f:
        f.write(_RAW_HEADER)
        for cid, smi, y in _ROWS:
            f.write(f"{cid},{smi},{y}\n")


def test_download_prepare_train_end_to_end(tmp_path, monkeypatch):
    raw = tmp_path / "delaney-processed.csv"
    _write_fixture(str(raw))
    # the only thing the network would add is this URL's content
    monkeypatch.setitem(
        prepare_data.DOWNLOADS["esol"], "url", f"file://{raw}"
    )

    root = str(tmp_path / "root")
    prepare_data.prepare_download(
        "esol", root, store_conformers=3, workers=1, prune=False
    )

    ddir = os.path.join(root, "data", "esol")
    manifest = json.load(open(os.path.join(ddir, "manifest.json")))
    assert manifest["dataset"] == "esol"
    assert manifest["n_molecules"] == len(_ROWS)
    assert manifest["split_method"] == "scaffold"
    assert len(manifest["sha256"]) == 64
    assert sum(manifest["splits"].values()) == len(_ROWS)
    # the fixture's sha256 is reproducible — the manifest must match a
    # recomputation (this is what real-download verification would check)
    assert manifest["sha256"] == prepare_data._sha256(str(raw))

    # split CSVs + conformer stores exist and are loadable by the dataset
    from conan_fgw_tpu.data.conformers import load_store
    from conan_fgw_tpu.data.datasets import read_csv_rows

    n_total = 0
    for mode in ("train", "valid", "test"):
        rows = read_csv_rows(
            os.path.join(ddir, f"{mode}.csv"), target="measured_log_sol"
        )
        assert rows, f"{mode} split is empty"
        n_total += len(rows)
        pos = load_store(
            os.path.join(ddir, f"conformers_{mode}"), rows[0]["mol_id"]
        )
        assert pos.shape[0] == 3 and pos.shape[2] == 3
        assert np.isfinite(pos).all()
    assert n_total == len(_ROWS)

    # one full training run through the production CLI on the prepared data
    from conan_fgw_tpu.train import runner

    cfg = tmp_path / "esol_mini.yaml"
    cfg.write_text(
        "dataset_name: ['esol']\n"
        "target: ['measured_log_sol']\n"
        "num_conformers: 2\n"
        "batch_size: 4\n"
        "experiment: conan_fgw.src.experiments.SOTAExperiment\n"
        "num_epochs: 1\n"
        "learning_rate: 0.001\n"
    )
    out_json = tmp_path / "out.json"
    runner.main([
        "--config", str(cfg), "--stage", "conan_fgw_pre",
        "--data_root", root,
        "--run_name", "dl", "--run_id", "1",
        "--models_dir", str(tmp_path / "models"),
        "--logs_dir", str(tmp_path / "logs"),
        "--num_devices", "1",
        "--out_json", str(out_json),
    ])
    res = json.loads(out_json.read_text())
    assert np.isfinite(res["test_rmse"]["mean"])
