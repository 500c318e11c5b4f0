"""Scaffold/random splitters and the GEOM dataset fallback path."""

import numpy as np

from conan_fgw_tpu.data.splitters import (
    RandomSplitter,
    ScaffoldSplitter,
    generate_scaffold,
)


SMILES = [
    "c1ccccc1C", "c1ccccc1CC", "c1ccccc1O",          # benzene scaffold
    "c1ccncc1C", "c1ccncc1O",                          # pyridine scaffold
    "C1CCCCC1C", "C1CCCCC1O",                          # cyclohexane scaffold
    "CCO", "CCC", "CCCC",                              # acyclic → empty scaffold
]


def test_scaffold_grouping():
    s = [generate_scaffold(x) for x in SMILES]
    assert s[0] == s[1] == s[2]
    assert s[3] == s[4]
    assert s[5] == s[6]
    assert s[0] != s[3] != s[5]
    assert s[7] == s[8] == s[9]  # acyclic molecules share the empty scaffold


def test_scaffold_split_partitions():
    tr, va, te = ScaffoldSplitter().split(SMILES, 0.6, 0.2, 0.2)
    all_idx = sorted(tr + va + te)
    assert all_idx == list(range(len(SMILES)))
    # same scaffold never crosses splits
    groups = {}
    for i, s in enumerate(SMILES):
        groups.setdefault(generate_scaffold(s), set()).add(i)
    for g in groups.values():
        memberships = [g <= set(part) or not (g & set(part)) for part in (tr, va, te)]
        assert all(memberships)


def test_random_split():
    tr, va, te = RandomSplitter().split(SMILES, 0.8, 0.1, 0.1, seed=0)
    assert sorted(list(tr) + list(va) + list(te)) == list(range(len(SMILES)))


def test_geom_dataset_fallback(tmp_path):
    from conan_fgw_tpu.data.datasets import write_csv
    from conan_fgw_tpu.data.geom import GEOMDataset

    rows = [{"smiles": "CCO", "y": 1.0, "mol_id": "a"}]
    write_csv(str(tmp_path / "cov2" / "train.csv"), rows, target="activity")
    ds = GEOMDataset("train", str(tmp_path), "cov2", "activity", 3)
    rec = ds[0]
    assert rec.pos.shape == (3, 9, 3)  # built-in DG fallback, CCO with Hs
    assert np.isfinite(rec.pos).all()
