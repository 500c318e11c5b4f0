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


def test_esan_head(batch):
    model = aux_heads.ESANAggregation(variant="avg_conf_esan", hidden_channels=32)
    params = model.init(jax.random.PRNGKey(0), batch)
    out = np.asarray(model.apply(params, batch))
    assert out.shape == (2, 1) and np.isfinite(out).all()
