"""sol1k builtin enumeration: size, uniqueness, parseability (scripts/prepare_data.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


def test_enumeration_size_and_uniqueness():
    from prepare_data import _graph_key, enumerate_sol1k

    mols = enumerate_sol1k()
    assert len(mols) >= 1000, f"expected >=1000 molecules, got {len(mols)}"
    keys = [_graph_key(s) for s in mols]
    assert len(set(keys)) == len(keys), "WL dedupe left duplicate graphs"


def test_surrogate_labels_sane():
    from prepare_data import enumerate_sol1k, surrogate_logS

    mols = enumerate_sol1k()[::101]  # a spread of ~13 molecules
    ys = [surrogate_logS(s) for s in mols]
    assert all(-6.0 < y < 3.0 for y in ys), ys
    assert len(set(round(y, 6) for y in ys)) > 1, "labels are degenerate"
