"""DimeNet backbone: bases, shapes, invariance, full-model integration."""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conan_fgw_tpu.data.packing import PackedBatch, pack_batch
from conan_fgw_tpu.data.synthetic import random_dataset
from conan_fgw_tpu.models.dimenet import (
    DimeNet3D,
    _spherical_jn,
    _spherical_jn_roots,
    envelope,
)
from conan_fgw_tpu.models.heads import ConanModel
from conan_fgw_tpu.ops.fgw import FGWConfig

SMALL = dict(hidden_channels=16, num_blocks=2, remat=False)


def _batch(recs, max_atoms=24):
    pb = pack_batch(recs, max_atoms=max_atoms)
    return PackedBatch(**jax.tree.map(jnp.asarray, dataclasses.asdict(pb)))


class TestBases:
    def test_bessel_roots(self):
        roots = _spherical_jn_roots(3, 3)
        # j_0 roots are n*pi
        np.testing.assert_allclose(roots[0], [math.pi, 2 * math.pi, 3 * math.pi], rtol=1e-6)
        # j_1 first root ~ 4.493409
        assert abs(roots[1, 0] - 4.493409) < 1e-4
        for l in range(3):
            for r in roots[l]:
                assert abs(float(_spherical_jn(l, jnp.asarray(r)))) < 1e-5

    def test_envelope(self):
        x = jnp.asarray([0.2, 0.5, 0.99, 1.0, 2.0])
        u = np.asarray(envelope(x, 5))
        assert (u[-2:] == 0).all()  # zero at/after the cutoff
        assert np.isfinite(u).all()


class TestDimeNet:
    @pytest.fixture(scope="class")
    def setup(self):
        recs = random_dataset(0, 2, num_conformers=2, heavy_range=(3, 5))
        batch = _batch(recs)
        B, K, N = batch.z.shape
        z = batch.z.reshape(B * K, N)
        pos = batch.pos.reshape(B * K, N, 3)
        mask = jnp.repeat(batch.atom_mask, K, axis=0)
        model = DimeNet3D(**SMALL)
        params = model.init(jax.random.PRNGKey(0), z, pos, mask)
        return batch, z, pos, mask, model, params

    def test_shapes_finite(self, setup):
        _, z, pos, mask, model, params = setup
        out = model.apply(params, z, pos, mask)
        assert out.shape == (z.shape[0], z.shape[1], SMALL["hidden_channels"] // 2)
        assert np.isfinite(np.asarray(out)).all()

    def test_e3_invariance(self, setup):
        _, z, pos, mask, model, params = setup
        q, _ = np.linalg.qr(np.random.default_rng(2).standard_normal((3, 3)))
        moved = pos @ jnp.asarray(q.T, jnp.float32) + 1.5
        a = np.asarray(model.apply(params, z, pos, mask))
        b = np.asarray(model.apply(params, z, moved, mask))
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-3)

    def test_full_model(self, setup):
        batch, *_ = setup
        model = ConanModel(
            backbone_name="dimenet", hidden_channels=16, cutoff=5.0,
            fgw=FGWConfig(alpha=0.5, fixed_structure=True),
        )
        params = model.init(jax.random.PRNGKey(0), batch, use_barycenter=True)
        for bary in (False, True):
            out = np.asarray(model.apply(params, batch, use_barycenter=bary))
            assert out.shape == (2, 1) and np.isfinite(out).all()


class TestBF16Triplets:
    def test_bf16_matches_f32(self):
        """compute_dtype='bfloat16' halves the N·M² triplet-tensor bytes
        (the backbone's HBM roofline lever, PARITY.md) without changing the
        param tree, and its outputs track f32 within bf16 tolerance."""
        recs = random_dataset(7, 2, num_conformers=2, heavy_range=(4, 6))
        batch = _batch(recs)
        B, K, N = batch.z.shape
        z = batch.z.reshape(B * K, N)
        pos = batch.pos.reshape(B * K, N, 3)
        mask = jnp.repeat(batch.atom_mask, K, axis=0)
        f32 = DimeNet3D(**SMALL)
        b16 = DimeNet3D(**SMALL, compute_dtype="bfloat16")
        params = f32.init(jax.random.PRNGKey(0), z, pos, mask)
        # identical param tree: bf16 mode is checkpoint-compatible
        chex_shapes = jax.tree.map(lambda a: (a.shape, a.dtype), params)
        assert chex_shapes == jax.tree.map(
            lambda a: (a.shape, a.dtype), b16.init(jax.random.PRNGKey(0), z, pos, mask)
        )
        a = np.asarray(f32.apply(params, z, pos, mask))
        b = np.asarray(b16.apply(params, z, pos, mask)).astype(np.float32)
        assert b.dtype == np.float32  # node outputs stay f32
        scale = np.abs(a).max() + 1e-6
        assert np.abs(a - b).max() / scale < 0.05  # bf16 trunk drift bound

    def test_bf16_grads_finite(self):
        recs = random_dataset(8, 1, num_conformers=1, heavy_range=(4, 5))
        batch = _batch(recs)
        B, K, N = batch.z.shape
        z = batch.z.reshape(B * K, N)
        pos = batch.pos.reshape(B * K, N, 3)
        mask = jnp.repeat(batch.atom_mask, K, axis=0)
        model = DimeNet3D(**SMALL, compute_dtype="bfloat16")
        params = model.init(jax.random.PRNGKey(0), z, pos, mask)
        g = jax.grad(lambda p: jnp.sum(model.apply(p, z, pos, mask) ** 2))(params)
        for leaf in jax.tree.leaves(g):
            assert np.isfinite(np.asarray(leaf, np.float32)).all()


class TestSlotLayoutParity:
    def test_matches_dense_golden(self):
        """The neighbor-slot (N·M²) formulation reproduces the dense N³
        formulation's outputs on the same parameter tree (golden captured
        from the pre-rewrite implementation, max_neighbors=6 exercising the
        first-k-by-index cap)."""
        import os

        data = np.load(os.path.join(os.path.dirname(__file__), "data", "dimenet_golden.npz"))
        z, pos, mask = jnp.asarray(data["z"]), jnp.asarray(data["pos"]), jnp.asarray(data["mask"])
        model = DimeNet3D(hidden_channels=16, num_blocks=2, remat=False, max_neighbors=6)
        params = model.init(jax.random.PRNGKey(3), z, pos, mask)
        # overwrite init params with the golden tree (same names/shapes)
        flat, treedef = jax.tree_util.tree_flatten_with_path(params)
        leaves = [jnp.asarray(data[f"p::{jax.tree_util.keystr(kp)}"]) for kp, _ in flat]
        params = jax.tree_util.tree_unflatten(treedef, leaves)
        out = model.apply(params, z, pos, mask)
        np.testing.assert_allclose(
            np.asarray(out), data["out"], rtol=2e-4, atol=2e-3
        )

    def test_padding_insensitive(self):
        """Extra padding atoms must not change outputs (gather/mask probe)."""
        recs = random_dataset(5, 2, num_conformers=1, heavy_range=(4, 6))
        model = DimeNet3D(**SMALL, max_neighbors=8)
        outs = []
        for pad_to in (16, 24):
            batch = _batch(recs, max_atoms=pad_to)
            B, K, N = batch.z.shape
            z = batch.z.reshape(B * K, N)
            pos = batch.pos.reshape(B * K, N, 3)
            mask = jnp.repeat(batch.atom_mask, K, axis=0)
            params = model.init(jax.random.PRNGKey(1), z, pos, mask)
            outs.append((np.asarray(model.apply(params, z, pos, mask)), np.asarray(mask)))
        (a, ma), (b, mb) = outs
        np.testing.assert_allclose(a[ma], b[mb], rtol=1e-4, atol=1e-5)
