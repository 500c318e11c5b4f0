"""Fused Pallas cfconv vs the XLA formulation (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from conan_fgw_tpu.ops.pallas.cfconv import _cfconv_xla, fused_cfconv


def _problem(g=3, n=16, f=32, gauss=10, seed=0):
    rng = np.random.default_rng(seed)
    pos = rng.standard_normal((g, n, 3)).astype(np.float32) * 2.0
    mask = np.ones((g, n), np.float32)
    mask[:, n - 3 :] = 0.0
    pos[:, n - 3 :] += 1e4  # padding far away
    x = rng.standard_normal((g, n, f)).astype(np.float32)
    w1 = (rng.standard_normal((gauss, f)) * 0.1).astype(np.float32)
    b1 = np.zeros((f,), np.float32)
    w2 = (rng.standard_normal((f, f)) * 0.1).astype(np.float32)
    b2 = np.zeros((f,), np.float32)
    return pos, mask, x, w1, b1, w2, b2


def test_matches_xla():
    args = tuple(map(jnp.asarray, _problem()))
    fused = fused_cfconv(*args, 10.0, 10, 32)
    ref = _cfconv_xla(*args, cutoff=10.0, num_gaussians=10, max_neighbors=32)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=1e-4)


def test_gradients_match():
    args = tuple(map(jnp.asarray, _problem(seed=1)))
    pos, mask, x, w1, b1, w2, b2 = args

    def loss_fused(x, w1, b1, w2, b2):
        return jnp.sum(fused_cfconv(pos, mask, x, w1, b1, w2, b2, 10.0, 10, 32) ** 2)

    def loss_ref(x, w1, b1, w2, b2):
        return jnp.sum(
            _cfconv_xla(pos, mask, x, w1, b1, w2, b2, cutoff=10.0, num_gaussians=10,
                        max_neighbors=32) ** 2
        )

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-4)


def test_neighbor_cap():
    # dense cluster: cap must keep only the first 8 in-range sources per target
    pos, mask, x, w1, b1, w2, b2 = map(jnp.asarray, _problem(g=1, n=16, seed=2))
    capped = fused_cfconv(pos, mask, x, w1, b1, w2, b2, 10.0, 10, 8)
    ref = _cfconv_xla(pos, mask, x, w1, b1, w2, b2, cutoff=10.0, num_gaussians=10,
                      max_neighbors=8)
    np.testing.assert_allclose(np.asarray(capped), np.asarray(ref), atol=1e-4)


def test_model_wiring_matches_xla_path():
    """ConanModel(use_pallas_cfconv=True) is numerically identical to the XLA
    model with the same parameter tree (interpret mode on CPU)."""
    import dataclasses

    from conan_fgw_tpu.data.loader import pack
    from conan_fgw_tpu.data.packing import PackedBatch
    from conan_fgw_tpu.data.synthetic import random_dataset
    from conan_fgw_tpu.models.heads import ConanModel

    recs = random_dataset(7, 4, num_conformers=2, heavy_range=(4, 7))
    pb = pack(recs, max_atoms=32, batch_size=4)
    batch = PackedBatch(**jax.tree.map(jnp.asarray, dataclasses.asdict(pb)))

    xla_model = ConanModel(num_gaussians=10)
    pallas_model = ConanModel(num_gaussians=10, use_pallas_cfconv=True)
    params = xla_model.init(jax.random.PRNGKey(0), batch, use_barycenter=True)
    params = {k: v for k, v in params.items() if k != "diagnostics"}
    out_xla = xla_model.apply(params, batch, use_barycenter=True)
    out_pallas = pallas_model.apply(params, batch, use_barycenter=True)
    np.testing.assert_allclose(
        np.asarray(out_pallas), np.asarray(out_xla), atol=1e-4, rtol=1e-4
    )

    # gradients flow through the custom_vjp recompute path
    def loss(p, model):
        return jnp.sum(model.apply(p, batch, use_barycenter=True) ** 2)

    g1 = jax.grad(loss)(params, pallas_model)
    g2 = jax.grad(loss)(params, xla_model)
    flat1 = jax.tree.leaves(g1)
    flat2 = jax.tree.leaves(g2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3)


def test_bf16_trunk_matches_xla():
    """bf16 node features through the kernel (kernel computes f32, stores
    bf16) track the f32 XLA formulation within bf16 tolerance."""
    args = list(map(jnp.asarray, _problem(seed=4)))
    pos, mask, x, w1, b1, w2, b2 = args
    xb = x.astype(jnp.bfloat16)
    fused = fused_cfconv(pos, mask, xb, w1, b1, w2, b2, 10.0, 10, 32)
    assert fused.dtype == jnp.bfloat16
    ref = _cfconv_xla(pos, mask, x, w1, b1, w2, b2, cutoff=10.0, num_gaussians=10,
                      max_neighbors=32)
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(
        np.asarray(fused, np.float32), np.asarray(ref), atol=2e-2 * scale
    )
    # gradients flow through the fused backward with bf16 activations
    def loss(xb, w1, b1, w2, b2):
        return jnp.sum(
            fused_cfconv(pos, mask, xb, w1, b1, w2, b2, 10.0, 10, 32).astype(
                jnp.float32
            ) ** 2
        )

    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(xb, w1, b1, w2, b2)
    assert grads[0].dtype == jnp.bfloat16
    for g in grads:
        assert np.isfinite(np.asarray(g, np.float32)).all()
