"""ViSNet backbone: shapes, E(3) invariance, and full-model integration."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conan_fgw_tpu.data.packing import PackedBatch, pack_batch
from conan_fgw_tpu.data.synthetic import random_dataset
from conan_fgw_tpu.models.heads import ConanModel
from conan_fgw_tpu.models.visnet import ViSNet3D

SMALL = dict(hidden_channels=32, num_heads=4, num_layers=2, num_rbf=8)


def _flat_inputs(recs, max_atoms=24):
    pb = pack_batch(recs, max_atoms=max_atoms)
    batch = PackedBatch(**jax.tree.map(jnp.asarray, dataclasses.asdict(pb)))
    B, K, N = batch.z.shape
    return (
        batch,
        batch.z.reshape(B * K, N),
        batch.pos.reshape(B * K, N, 3),
        jnp.repeat(batch.atom_mask, K, axis=0),
    )


@pytest.fixture(scope="module")
def setup():
    recs = random_dataset(0, 2, num_conformers=2, heavy_range=(3, 5))
    batch, z, pos, mask = _flat_inputs(recs)
    model = ViSNet3D(**SMALL)
    params = model.init(jax.random.PRNGKey(0), z, pos, mask)
    return batch, z, pos, mask, model, params


class TestViSNet:
    def test_shapes_finite(self, setup):
        _, z, pos, mask, model, params = setup
        out = model.apply(params, z, pos, mask)
        assert out.shape == (z.shape[0], z.shape[1], SMALL["hidden_channels"] // 2)
        assert np.isfinite(np.asarray(out)).all()
        h3, hb, nbr = model.apply(params, z, pos, mask, method="embed_dual")
        assert h3.shape == hb.shape == out.shape
        assert nbr.shape == (z.shape[0], z.shape[1], z.shape[1])
        assert not np.asarray(nbr).diagonal(axis1=-2, axis2=-1).any()

    def test_e3_invariance(self, setup):
        """Scalar outputs must be invariant under rotation + translation."""
        _, z, pos, mask, model, params = setup
        q, _ = np.linalg.qr(np.random.default_rng(1).standard_normal((3, 3)))
        moved = pos @ jnp.asarray(q.T, jnp.float32) + jnp.asarray([3.0, -1.0, 2.0])
        a = model.apply(params, z, pos, mask)
        b = model.apply(params, z, moved, mask)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_padding_invariance(self, setup):
        recs = random_dataset(0, 2, num_conformers=2, heavy_range=(3, 5))
        _, z24, pos24, mask24 = _flat_inputs(recs, 24)
        _, z32, pos32, mask32 = _flat_inputs(recs, 32)
        model = ViSNet3D(**SMALL)
        params = model.init(jax.random.PRNGKey(0), z24, pos24, mask24)
        a = np.asarray(model.apply(params, z24, pos24, mask24))
        b = np.asarray(model.apply(params, z32, pos32, mask32))
        np.testing.assert_allclose(a, b[:, :24], atol=1e-5)

    def test_vertex_variant(self, setup):
        """ViS_MP_Vertex: extra t_src/t_trg rejection gate in the edge update
        (torch_geometric_visnet.py:676-738). Must stay E(3)-invariant."""
        _, z, pos, mask, _, _ = setup
        model = ViSNet3D(**SMALL, vertex=True)
        params = model.init(jax.random.PRNGKey(0), z, pos, mask)
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        names = {"/".join(str(p) for p in path) for path, _ in flat}
        assert any("t_src_proj" in n for n in names)
        out = model.apply(params, z, pos, mask)
        assert np.isfinite(np.asarray(out)).all()
        q, _ = np.linalg.qr(np.random.default_rng(7).standard_normal((3, 3)))
        moved = pos @ jnp.asarray(q.T, jnp.float32) + jnp.asarray([1.0, 2.0, -3.0])
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(model.apply(params, z, moved, mask)), atol=1e-5
        )

    def test_full_model_both_stages(self, setup):
        batch, *_ = setup
        model = ConanModel(
            backbone_name="visnet", hidden_channels=32, cutoff=5.0,
            bary_shift=1.0, bary_postnorm="l2col",
        )
        params = model.init(jax.random.PRNGKey(0), batch, use_barycenter=True)
        for bary in (False, True):
            out = np.asarray(model.apply(params, batch, use_barycenter=bary))
            assert out.shape == (2, 1)
            assert np.isfinite(out).all()
