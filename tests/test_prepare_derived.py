"""Derived builtin datasets (scripts/prepare_data.py::prepare_derived):
sol1k_class thresholding and solflex cross-conformer dispersion target."""

import csv
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from prepare_data import conformer_spectral_dispersion, prepare_derived  # noqa: E402


def _mini_sol1k(root):
    """A sol1k-shaped store: 3 splits, tiny conformer npz stores."""
    from conan_fgw_tpu.data import smiles as smi
    from conan_fgw_tpu.data.conformers import dg_generate, store_path
    from conan_fgw_tpu.data.datasets import write_csv

    base = os.path.join(root, "data", "sol1k")
    smiles = ["CCO", "CCC", "CCN", "CCCl", "COC", "CCCO", "CNC", "CCCC"]
    rows = [
        {"smiles": s, "y": float(-i), "mol_id": f"sol1k_{i:04d}"}
        for i, s in enumerate(smiles)
    ]
    splits = {"train": rows[:6], "valid": rows[6:7], "test": rows[7:]}
    for mode, subset in splits.items():
        write_csv(os.path.join(base, f"{mode}.csv"), subset, target="logS_surrogate")
        cdir = os.path.join(base, f"conformers_{mode}")
        os.makedirs(cdir, exist_ok=True)
        for r in subset:
            mol = smi.add_hydrogens(smi.parse_smiles(r["smiles"]))
            pos = np.stack([dg_generate(mol, 1, seed=7 + c)[0] for c in range(4)])
            np.savez_compressed(
                store_path(cdir, r["mol_id"]), positions=pos,
                smiles=np.str_(r["smiles"]),
            )
    return base


def test_dispersion_invariances():
    rng = np.random.default_rng(0)
    P = rng.normal(size=(4, 7, 3))
    d = conformer_spectral_dispersion(P)
    assert d > 0
    # conformer-order invariance
    assert np.isclose(conformer_spectral_dispersion(P[::-1]), d)
    # atom-permutation invariance (the spectra are permutation-invariant)
    perm = rng.permutation(7)
    assert np.isclose(conformer_spectral_dispersion(P[:, perm, :]), d, rtol=1e-9)
    # rigid-motion invariance: rotating one conformer changes nothing
    theta = 0.7
    R = np.array([[np.cos(theta), -np.sin(theta), 0], [np.sin(theta), np.cos(theta), 0], [0, 0, 1]])
    P2 = P.copy()
    P2[1] = P2[1] @ R.T + 3.0
    assert np.isclose(conformer_spectral_dispersion(P2), d, rtol=1e-9)
    # identical conformers -> zero dispersion
    assert conformer_spectral_dispersion(np.repeat(P[:1], 4, axis=0)) == 0.0


@pytest.fixture()
def mini_root(tmp_path):
    _mini_sol1k(str(tmp_path))
    return str(tmp_path)


def test_sol1k_class(mini_root):
    prepare_derived("sol1k_class", mini_root)
    ddir = os.path.join(mini_root, "data", "sol1k_class")
    rows = list(csv.DictReader(open(os.path.join(ddir, "train.csv"))))
    labels = [int(r["Class"]) for r in rows]
    assert set(labels) <= {0, 1}
    # 75th-percentile threshold -> ~25% positives on train
    assert 0 < sum(labels) < len(labels)
    # conformer stores shared via symlink
    link = os.path.join(ddir, "conformers_train")
    assert os.path.islink(link) and os.path.isdir(link)
    # trains through the production dataset class
    from conan_fgw_tpu.data.datasets import ConformerDataset

    ds = ConformerDataset("train", os.path.join(mini_root, "data"), "sol1k_class",
                          "Class", 2, generate_missing=False)
    rec = ds[0]
    assert rec.pos.shape[0] == 2 and rec.y in (0.0, 1.0)


def test_solflex(mini_root):
    prepare_derived("solflex", mini_root)
    ddir = os.path.join(mini_root, "data", "solflex")
    ys = {}
    for mode in ("train", "valid", "test"):
        rows = list(csv.DictReader(open(os.path.join(ddir, f"{mode}.csv"))))
        ys[mode] = np.array([float(r["flex_surrogate"]) for r in rows])
    # standardised by TRAIN stats
    assert abs(ys["train"].mean()) < 1e-9
    assert np.isclose(ys["train"].std(), 1.0)
    # target varies across molecules (not a constant)
    assert ys["train"].std() > 0
    # requires the sol1k store: missing base dir raises
    with pytest.raises(FileNotFoundError):
        prepare_derived("solflex", os.path.join(mini_root, "nonexistent"))


def test_consensus_deviation_invariances():
    from prepare_data import conformer_consensus_deviation

    rng = np.random.default_rng(1)
    P = rng.normal(size=(4, 7, 3))
    d = conformer_consensus_deviation(P)
    assert d > 0
    assert np.isclose(conformer_consensus_deviation(P[::-1]), d)
    perm = rng.permutation(7)
    # NOT generally atom-permutation invariant per-conformer, but permuting
    # ALL conformers identically permutes Dbar identically -> invariant
    assert np.isclose(conformer_consensus_deviation(P[:, perm, :]), d, rtol=1e-9)
    # identical conformers -> zero deviation from consensus
    assert conformer_consensus_deviation(np.repeat(P[:1], 4, axis=0)) < 1e-12


def test_solflex_class_and_solcons(mini_root):
    prepare_derived("solflex_class", mini_root)
    ddir = os.path.join(mini_root, "data", "solflex_class")
    rows = list(csv.DictReader(open(os.path.join(ddir, "train.csv"))))
    labels = [int(r["Class"]) for r in rows]
    assert set(labels) <= {0, 1}
    # median threshold -> balanced-ish on train
    assert 0 < sum(labels) < len(labels)
    assert os.path.islink(os.path.join(ddir, "conformers_train"))

    prepare_derived("solcons", mini_root)
    cdir = os.path.join(mini_root, "data", "solcons")
    crows = list(csv.DictReader(open(os.path.join(cdir, "train.csv"))))
    ys = np.array([float(r["cons_surrogate"]) for r in crows])
    # standardised by train stats
    assert abs(ys.mean()) < 1e-6 and abs(ys.std() - 1.0) < 1e-6
