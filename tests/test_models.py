"""Model invariance and shape tests for the masked-dense backbones/heads."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conan_fgw_tpu.data.packing import PackedBatch, pack_batch
from conan_fgw_tpu.data.synthetic import random_dataset
from conan_fgw_tpu.models.heads import ConanModel

SMALL = dict(hidden_channels=32, num_filters=32, num_gaussians=10, num_interactions=2)


def _batch(recs, max_atoms=32, batch_size=None):
    pb = pack_batch(recs, max_atoms=max_atoms, batch_size=batch_size or len(recs))
    return PackedBatch(**jax.tree.map(jnp.asarray, dataclasses.asdict(pb)))


@pytest.fixture(scope="module")
def recs():
    return random_dataset(7, 4, num_conformers=3, heavy_range=(4, 7))


@pytest.fixture(scope="module")
def model_and_params(recs):
    model = ConanModel(**SMALL)
    params = model.init(jax.random.PRNGKey(0), _batch(recs), use_barycenter=True)
    return model, params


class TestShapes:
    def test_output_shapes(self, recs, model_and_params):
        model, params = model_and_params
        batch = _batch(recs)
        for bary in (False, True):
            out = model.apply(params, batch, use_barycenter=bary)
            assert out.shape == (4, 1)
            assert np.isfinite(np.asarray(out)).all()

    def test_classification_logits(self, recs):
        """Classification emits finite LOGITS (sigmoid lives at the loss /
        inference boundary — heads.py); probabilities after squashing."""
        model = ConanModel(task="classification", **SMALL)
        batch = _batch(recs)
        params = model.init(jax.random.PRNGKey(1), batch, use_barycenter=True)
        for bary in (False, True):
            out = np.asarray(model.apply(params, batch, use_barycenter=bary))
            assert np.isfinite(out).all()
            p = 1.0 / (1.0 + np.exp(-out))
            assert ((p >= 0) & (p <= 1)).all()


class TestInvariances:
    def test_rigid_motion_invariance(self, recs, model_and_params):
        """SchNet consumes distances only — E(3) transformations are no-ops."""
        model, params = model_and_params
        batch = _batch(recs)
        # random rotation (QR of a fixed random matrix) + translation
        q, _ = np.linalg.qr(np.random.default_rng(0).standard_normal((3, 3)))
        rot = jnp.asarray(q, jnp.float32)
        moved = dataclasses.replace(
            batch, pos=batch.pos @ rot.T + jnp.asarray([1.0, -2.0, 0.5])
        )
        for bary in (False, True):
            a = np.asarray(model.apply(params, batch, use_barycenter=bary))
            b = np.asarray(model.apply(params, moved, use_barycenter=bary))
            np.testing.assert_allclose(a, b, atol=5e-4)

    def test_atom_permutation_invariance(self, recs, model_and_params):
        """Consistently permuting atoms within each molecule must not change
        the (sum/mean-readout) predictions."""
        model, params = model_and_params
        batch = _batch(recs)
        rng = np.random.default_rng(3)
        z = np.asarray(batch.z).copy()
        pos = np.asarray(batch.pos).copy()
        x2d = np.asarray(batch.x2d).copy()
        adj = np.asarray(batch.bond_adj).copy()
        battr = np.asarray(batch.bond_attr).copy()
        mask = np.asarray(batch.atom_mask)
        for b in range(z.shape[0]):
            n = int(mask[b].sum())
            perm = np.concatenate([rng.permutation(n), np.arange(n, z.shape[2])])
            z[b] = z[b][:, perm]
            pos[b] = pos[b][:, perm]
            x2d[b] = x2d[b][perm]
            adj[b] = adj[b][perm][:, perm]
            battr[b] = battr[b][perm][:, perm]
        permuted = dataclasses.replace(
            batch,
            z=jnp.asarray(z), pos=jnp.asarray(pos), x2d=jnp.asarray(x2d),
            bond_adj=jnp.asarray(adj), bond_attr=jnp.asarray(battr),
        )
        # pre-stage exactly; barycenter uses init_C = Cs[0] whose node order
        # changes, so only the pre path is strictly invariant
        a = np.asarray(model.apply(params, batch, use_barycenter=False))
        b = np.asarray(model.apply(params, permuted, use_barycenter=False))
        np.testing.assert_allclose(a, b, atol=5e-4)

    def test_padding_invariance_pre(self, recs, model_and_params):
        """Growing the atom bucket must not change the no-barycenter output."""
        model, params = model_and_params
        a = np.asarray(model.apply(params, _batch(recs, 32), use_barycenter=False))
        b = np.asarray(model.apply(params, _batch(recs, 48), use_barycenter=False))
        np.testing.assert_allclose(a, b, atol=5e-4)

    def test_padding_invariance_masked_bary(self, recs):
        """With bary_pad_mode='masked', the barycenter path is bucket-size
        independent too (the reference-parity mode deliberately is not)."""
        model = ConanModel(bary_pad_mode="masked", **SMALL)
        params = model.init(jax.random.PRNGKey(0), _batch(recs), use_barycenter=True)
        a = np.asarray(model.apply(params, _batch(recs, 32), use_barycenter=True))
        b = np.asarray(model.apply(params, _batch(recs, 48), use_barycenter=True))
        np.testing.assert_allclose(a, b, atol=5e-3)

    def test_batch_composition_independence(self, recs, model_and_params):
        """A molecule's prediction must not depend on its batch neighbours."""
        model, params = model_and_params
        full = np.asarray(model.apply(params, _batch(recs), use_barycenter=True))
        solo = np.asarray(
            model.apply(params, _batch(recs[:1], batch_size=1), use_barycenter=True)
        )
        np.testing.assert_allclose(full[:1], solo, atol=5e-4)


class TestParameterTree:
    def test_stage_agnostic_params(self, recs):
        """Init under either stage flag must produce the same tree structure
        (the two-stage warm start depends on it)."""
        model = ConanModel(**SMALL)
        batch = _batch(recs)
        p_pre = model.init(jax.random.PRNGKey(0), batch, use_barycenter=False)
        p_bc = model.init(jax.random.PRNGKey(0), batch, use_barycenter=True)
        assert jax.tree.structure(p_pre) == jax.tree.structure(p_bc)


class TestMaskedPadMode:
    """Regression: bary_pad_mode='masked' went NaN in production (every
    Sinkhorn solve 'diverged') because zero-mass padding marginals hit
    1/p=inf in the Y update, ppt=0 in the C update, and 0/0 marginals on
    batch-filler molecules."""

    def test_forward_grad_finite_with_fillers(self, recs):
        model = ConanModel(bary_pad_mode="masked", **SMALL)
        # batch_size > len(recs): real padding *fillers* (mol_mask False)
        batch = _batch(recs, 32, batch_size=6)
        params = model.init(jax.random.PRNGKey(0), batch, use_barycenter=True)
        params = {k: v for k, v in params.items() if k != "diagnostics"}

        def loss(p):
            out, aux = model.apply(
                p, batch, use_barycenter=True, mutable=["diagnostics"]
            )
            valid = batch.mol_mask.astype(out.dtype)
            return jnp.sum((out[:, 0] * valid) ** 2), aux

        (val, aux), grads = jax.value_and_grad(loss, has_aux=True)(params)
        assert np.isfinite(float(val))
        leaves = jax.tree.leaves(grads)
        assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
        # and no solve should report a numerical failure
        n_div = int(np.asarray(jax.tree.leaves(aux)[0]).sum())
        assert n_div == 0

    def test_masked_barycenter_pad_rows_stay_zero(self):
        from conan_fgw_tpu.ops.fgw import FGWConfig
        from conan_fgw_tpu.ops.fgw.barycenter import fgw_barycenter_batch

        rng = np.random.default_rng(3)
        B, K, N, D, n_real = 2, 3, 8, 4, 5
        mask = np.zeros((B, N)); mask[:, :n_real] = 1.0
        Ys = rng.uniform(0.1, 2.0, (B, K, N, D)) * mask[:, None, :, None]
        Cs = (rng.uniform(size=(B, K, N, N)) < 0.4).astype(np.float64)
        Cs = np.tril(Cs) + np.tril(Cs, -1).swapaxes(-1, -2)
        Cs = Cs * mask[:, None, :, None] * mask[:, None, None, :]
        p = mask / mask.sum(-1, keepdims=True)
        ps = np.broadcast_to(p[:, None], (B, K, N))
        Y, C, n_div = fgw_barycenter_batch(
            jnp.asarray(Ys), jnp.asarray(Cs), ps=jnp.asarray(ps), p=jnp.asarray(p),
            config=FGWConfig(), return_diverged=True,
        )
        Y, C = np.asarray(Y), np.asarray(C)
        assert np.isfinite(Y).all() and np.isfinite(C).all()
        assert int(n_div) == 0
        # padding rows carry no mass and must come out exactly zero
        np.testing.assert_array_equal(Y[:, n_real:], 0.0)
        np.testing.assert_array_equal(C[:, n_real:], 0.0)
        np.testing.assert_array_equal(C[:, :, n_real:], 0.0)
