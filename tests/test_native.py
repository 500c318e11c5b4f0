"""Native C++ packer: exact equivalence with the Python packer."""

import dataclasses

import numpy as np
import pytest

from conan_fgw_tpu.data.native import native_available, pack_batch_native
from conan_fgw_tpu.data.packing import pack_batch
from conan_fgw_tpu.data.synthetic import random_dataset


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
class TestNativePacker:
    def test_identical_outputs(self):
        recs = random_dataset(5, 7, num_conformers=3, heavy_range=(4, 9))
        a = pack_batch(recs, max_atoms=64, batch_size=8)
        b = pack_batch_native(recs, max_atoms=64, batch_size=8)
        for f in dataclasses.fields(a):
            np.testing.assert_array_equal(
                np.asarray(getattr(a, f.name)), np.asarray(getattr(b, f.name)), err_msg=f.name
            )

    def test_partial_batch_padding(self):
        recs = random_dataset(6, 3, num_conformers=2, heavy_range=(4, 6))
        b = pack_batch_native(recs, max_atoms=32, batch_size=5)
        assert b.mol_mask.tolist() == [True] * 3 + [False] * 2
        assert (b.z[3:] == 0).all()

    def test_prefetcher(self):
        from conan_fgw_tpu.data.loader import prefetched_batches

        recs = random_dataset(7, 10, num_conformers=2, heavy_range=(4, 6))
        got = list(prefetched_batches(recs, 4, 32))
        assert len(got) == 3
        assert got[0].batch_size == 4

    def test_prefetcher_propagates_errors(self):
        from conan_fgw_tpu.data.loader import Prefetcher

        def bad():
            yield 1
            raise RuntimeError("boom")

        it = iter(Prefetcher(bad()))
        assert next(it) == 1
        with pytest.raises(RuntimeError):
            list(it)
