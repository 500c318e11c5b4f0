"""ESAN variants and auxiliary heads: forward shapes + finiteness."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conan_fgw_tpu.data.packing import PackedBatch, pack_batch
from conan_fgw_tpu.data.synthetic import random_dataset
from conan_fgw_tpu.models import aux_heads
from conan_fgw_tpu.models.esan import (
    AverageConformerESAN,
    Geometry2DInducedESAN,
    GeometryInducedESAN,
)


@pytest.fixture(scope="module")
def batch():
    recs = random_dataset(11, 2, num_conformers=2, heavy_range=(3, 5))
    pb = pack_batch(recs, max_atoms=24)
    return PackedBatch(**jax.tree.map(jnp.asarray, dataclasses.asdict(pb)))


@pytest.mark.parametrize(
    "cls", [AverageConformerESAN, GeometryInducedESAN, Geometry2DInducedESAN]
)
def test_esan_variants(cls, batch):
    model = cls(hidden_channels=32)
    params = model.init(jax.random.PRNGKey(0), batch)
    out = np.asarray(model.apply(params, batch))
    assert out.shape == (2, 16)
    assert np.isfinite(out).all()


@pytest.mark.parametrize(
    "cls",
    [
        aux_heads.ScalarsAggregation,
        aux_heads.EmbeddingsAggregation,
        aux_heads.CovalentEmbeddingsAggregation,
        aux_heads.AttentionEmbeddingsAggregation,
        aux_heads.EmbeddingsWithGAT,
    ],
)
def test_aux_heads(cls, batch):
    model = cls(hidden_channels=32)
    params = model.init(jax.random.PRNGKey(0), batch)
    out = np.asarray(model.apply(params, batch))
    assert out.shape == (2, 1)
    assert np.isfinite(out).all()


def test_attention_layer():
    from conan_fgw_tpu.models.attention import AttentionLayer

    layer = AttentionLayer(n_feats=8)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((3, 5, 8)), jnp.float32)
    params = layer.init(jax.random.PRNGKey(0), x)
    out = np.asarray(layer.apply(params, x))
    assert out.shape == (3, 5, 8)
    # softmax over axis 1: columns sum to one
    np.testing.assert_allclose(out.sum(axis=1), 1.0, atol=1e-5)


def test_visualization_embeddings(batch):
    """ConanModel.embeddings mirrors EmbeddingsVisualizationBaryCenter."""
    from conan_fgw_tpu.models.heads import ConanModel

    model = ConanModel(
        task="classification", hidden_channels=32, num_filters=32, num_gaussians=10
    )
    params = model.init(jax.random.PRNGKey(0), batch)
    emb = model.apply(params, batch, method="embeddings")
    B, K, _ = batch.z.shape
    assert emb["x3d"].shape == (B, K, 16)
    assert emb["x_bary"].shape == (B, 16)
    assert emb["x_cov"].shape == (B, 16)
    assert all(np.isfinite(np.asarray(v)).all() for v in emb.values())


def test_esan_head(batch):
    model = aux_heads.ESANAggregation(variant="avg_conf_esan", hidden_channels=32)
    params = model.init(jax.random.PRNGKey(0), batch)
    out = np.asarray(model.apply(params, batch))
    assert out.shape == (2, 1) and np.isfinite(out).all()
