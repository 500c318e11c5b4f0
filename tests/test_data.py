"""Host data layer: SMILES parsing, conformer embedding, packing, datasets."""

import numpy as np
import pytest

from conan_fgw_tpu.data import conformers as conf
from conan_fgw_tpu.data import smiles as smi
from conan_fgw_tpu.data import vocab
from conan_fgw_tpu.data.packing import bucket_for, pack_batch
from conan_fgw_tpu.data.synthetic import random_dataset


class TestSmiles:
    @pytest.mark.parametrize(
        "s,n_heavy,n_with_h",
        [
            ("CCO", 3, 9),            # ethanol C2H5OH
            ("c1ccccc1", 6, 12),      # benzene
            ("CC(=O)Oc1ccccc1C(=O)O", 13, 21),  # aspirin C9H8O4
            ("C#N", 2, 3),            # HCN
            ("[nH]1cccc1", 5, 10),    # pyrrole
            ("O=C([O-])C[NH3+]", 5, 10),  # glycine zwitterion
            ("C1CC1", 3, 9),          # cyclopropane
        ],
    )
    def test_atom_counts(self, s, n_heavy, n_with_h):
        m = smi.parse_smiles(s)
        assert m.num_atoms == n_heavy
        assert smi.add_hydrogens(m).num_atoms == n_with_h

    def test_ring_perception(self):
        m = smi.parse_smiles("C1CC1CC")
        ring_bonds = [b for b in m.bonds if b.in_ring]
        assert len(ring_bonds) == 3
        x2d, *_ = smi.featurize(m)
        assert list(x2d[:, 8]) == [1, 1, 1, 0, 0]  # is_in_ring flags

    def test_feature_coding(self):
        m = smi.add_hydrogens(smi.parse_smiles("c1ccccc1"))
        x2d, bonds, battr, z = smi.featurize(m)
        carbon = x2d[0]
        assert carbon[0] == 6  # atomic number
        assert carbon[7] == 1  # aromatic
        assert carbon[8] == 1  # in ring
        aromatic_bonds = battr[battr[:, 0] == vocab.BOND_AROMATIC]
        assert len(aromatic_bonds) == 6
        assert (z[:6] == 6).all() and (z[6:] == 1).all()

    def test_charge_and_explicit_h(self):
        m = smi.parse_smiles("O=C([O-])C[NH3+]")
        charges = [a.charge for a in m.atoms]
        assert -1 in charges and 1 in charges

    def test_errors(self):
        with pytest.raises(smi.SmilesError):
            smi.parse_smiles("C1CC")  # unclosed ring
        with pytest.raises(smi.SmilesError):
            smi.parse_smiles("CXQ")  # unknown atom


class TestConformers:
    def test_bond_lengths(self):
        m = smi.add_hydrogens(smi.parse_smiles("CCO"))
        pos = conf.dg_generate(m, 2, seed=0)
        for b in m.bonds:
            d = np.linalg.norm(pos[:, b.i] - pos[:, b.j], axis=-1)
            t = conf._bond_length(m.atoms[b.i].z, m.atoms[b.j].z, b.order)
            assert np.abs(d - t).max() < 0.25

    def test_resample_semantics(self):
        # reference: random.choices when short, random.sample when long, seed 1
        up = conf.resample_indices(3, 5, seed=1)
        assert len(up) == 5 and set(up) <= {0, 1, 2}
        down = conf.resample_indices(10, 4, seed=1)
        assert len(down) == 4 and len(set(down)) == 4
        assert conf.resample_indices(10, 4, seed=1) == conf.resample_indices(10, 4, seed=1)

    def test_store_roundtrip(self, tmp_path):
        m = smi.add_hydrogens(smi.parse_smiles("CCO"))
        pos = conf.dg_generate(m, 3, seed=0)
        p = conf.store_path(str(tmp_path), "mol/1:a")  # nasty id chars
        np.savez_compressed(p, positions=pos)
        got = conf.load_store(str(tmp_path), "mol/1:a")
        np.testing.assert_array_equal(got, pos)


class TestPacking:
    def test_buckets(self):
        assert bucket_for(10) == 32
        assert bucket_for(33) == 64
        with pytest.raises(ValueError):
            bucket_for(1000)

    def test_pack_masks(self):
        recs = random_dataset(0, 3, num_conformers=2, heavy_range=(4, 6))
        pb = pack_batch(recs, max_atoms=32, batch_size=5)
        assert pb.z.shape == (5, 2, 32)
        assert pb.mol_mask.tolist() == [True] * 3 + [False] * 2
        for b, r in enumerate(recs):
            n = r.num_atoms
            assert pb.atom_mask[b, :n].all() and not pb.atom_mask[b, n:].any()
            # padding positions are far from everything (no spurious edges)
            assert np.linalg.norm(pb.pos[b, 0, n:] - pb.pos[b, 0, 0], axis=-1).min() > 100
        # bond adjacency symmetric, zero in padding
        assert (pb.bond_adj == pb.bond_adj.transpose(0, 2, 1)).all()

    def test_dataset_end_to_end(self, tmp_path):
        from conan_fgw_tpu.data.datasets import ConformerDataset, write_csv

        rows = [
            {"smiles": "CCO", "y": 1.0, "mol_id": "a"},
            {"smiles": "c1ccccc1", "y": 2.0, "mol_id": "b"},
        ]
        write_csv(str(tmp_path / "mini" / "train.csv"), rows, target="target")
        ds = ConformerDataset("train", str(tmp_path), "mini", "target", 3)
        assert len(ds) == 2
        recs = ds.records()
        assert recs[0].num_conformers == 3
        assert recs[0].num_atoms == 9  # CCO with hydrogens
        assert recs[1].y == 2.0
        # conformer store persisted and reused
        ds2 = ConformerDataset("train", str(tmp_path), "mini", "target", 3)
        np.testing.assert_array_equal(ds2[0].z, recs[0].z)

    def test_resampling_deterministic_across_instances(self, tmp_path):
        """K-subset conformer resampling must be identical for independently
        constructed dataset instances at the same epoch (multi-host DP packs
        the same global batch on every host) and fresh across epochs."""
        from conan_fgw_tpu.data.datasets import ConformerDataset, write_csv

        rows = [{"smiles": "CCO", "y": 1.0, "mol_id": "a"}]
        write_csv(str(tmp_path / "mini" / "train.csv"), rows, target="target")
        # store holds 6 conformers, dataset draws K=3 → real subset choice
        ConformerDataset(
            "train", str(tmp_path), "mini", "target", 6, store_conformers=6
        ).records()
        a = ConformerDataset("train", str(tmp_path), "mini", "target", 3)
        b = ConformerDataset("train", str(tmp_path), "mini", "target", 3)
        np.testing.assert_array_equal(a[0].pos, b[0].pos)  # same epoch → same draw
        a.set_epoch(1)
        e1 = a[0].pos
        assert not np.array_equal(e1, b[0].pos)  # new epoch → fresh subset
        b.set_epoch(1)
        np.testing.assert_array_equal(e1, b[0].pos)  # still host-identical


class TestBDEDataset:
    """BDE protocol (reference datasets.py:223-260): stores must pre-exist,
    and the molecule identity comes from the store when it recorded one."""

    def test_missing_store_raises(self, tmp_path):
        from conan_fgw_tpu.data.datasets import BDEDataset, write_csv

        write_csv(
            str(tmp_path / "bde" / "train.csv"),
            [{"smiles": "CCO", "y": 1.0, "mol_id": "a"}],
            target="target",
        )
        ds = BDEDataset("train", str(tmp_path), "bde", "target", 2)
        try:
            ds[0]
        except ValueError as e:
            assert "not found" in str(e)
        else:
            raise AssertionError("expected ValueError for missing store")

    def test_store_smiles_overrides_csv(self, tmp_path):
        from conan_fgw_tpu.data import conformers as conf
        from conan_fgw_tpu.data.datasets import BDEDataset, write_csv

        # CSV says CCO (9 atoms with H); the store was built from CO
        # (6 atoms). The BDE protocol featurises the store's molecule, so
        # the record must come out with 6 atoms, not raise a mismatch.
        write_csv(
            str(tmp_path / "bde" / "train.csv"),
            [{"smiles": "CCO", "y": 1.0, "mol_id": "a"}],
            target="target",
        )
        cdir = str(tmp_path / "bde" / "conformers_train")
        failed = conf.generate_store(["CO"], ["a"], cdir, 2, max_workers=1)
        assert not failed
        ds = BDEDataset("train", str(tmp_path), "bde", "target", 2)
        rec = ds[0]
        assert rec.num_atoms == 6
        assert rec.smiles == "CO"
