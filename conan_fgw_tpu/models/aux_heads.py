"""Auxiliary/experimental task heads from the reference model zoo.

Equivalents of the simpler heads in ``conan_fgw/src/model/schnet_based_models.py``
(``ScalarsAggregation``, ``EmbeddingsAggregation``,
``CovalentEmbeddingsAggregation``, ``AttentionEmbeddingsAggregation``,
``EmbeddingsWithGAT``) plus a head for the ESAN variants. All share the
framework's model contract: ``apply(params, batch, use_barycenter=False) ->
(B, 1)`` so they drop into the same training loop as ``ConanModel``.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from conan_fgw_tpu.models import esan as esan_lib
from conan_fgw_tpu.models.gat import GAT2D
from conan_fgw_tpu.models.schnet import SchNet3D
from conan_fgw_tpu.ops.graph import masked_sum

xavier = nn.initializers.xavier_uniform()


def _flatten(batch):
    B, K, N = batch.z.shape
    return (
        batch.z.reshape(B * K, N),
        batch.pos.reshape(B * K, N, 3),
        jnp.repeat(batch.atom_mask, K, axis=0),
        (B, K, N),
    )


class ScalarsAggregation(nn.Module):
    """Plain scalar-energy SchNet → conformer mean (schnet_based_models.py:48-63).

    The reference wires ``model_name='simple_schnet'`` = an unmodified PyG
    ``SchNet()`` whose readout pools a per-atom *scalar* head (hidden=128,
    filters=128, gaussians=50, 6 interactions), then means over conformers
    with no extra linear. Here the scalar head is the backbone's half-width
    head followed by a Dense(1) before the masked sum readout.
    """

    hidden_channels: int = 128

    @nn.compact
    def __call__(self, batch, use_barycenter: bool = False):
        zf, posf, maskf, (B, K, N) = _flatten(batch)
        h = SchNet3D(
            hidden_channels=self.hidden_channels,
            num_filters=128,
            num_gaussians=50,
            num_interactions=6,
        )(zf, posf, maskf)
        e = nn.Dense(1, kernel_init=xavier)(h)  # per-atom scalar energies
        return masked_sum(e, maskf).reshape(B, K, 1).mean(axis=1)


class EmbeddingsAggregation(nn.Module):
    """SchNet embeddings → conformer mean → linear (schnet_based_models.py:65-81)."""

    hidden_channels: int = 128

    @nn.compact
    def __call__(self, batch, use_barycenter: bool = False):
        zf, posf, maskf, (B, K, N) = _flatten(batch)
        h = SchNet3D(hidden_channels=self.hidden_channels, num_interactions=3)(
            zf, posf, maskf
        )
        x = masked_sum(h, maskf).reshape(B, K, -1).mean(axis=1)
        return nn.Dense(1, kernel_init=xavier)(x)


class CovalentEmbeddingsAggregation(nn.Module):
    """SchNet with the parallel covalent interaction stack
    (schnet_based_models.py:420-436; backbone ``schnet_covalent``)."""

    hidden_channels: int = 128

    @nn.compact
    def __call__(self, batch, use_barycenter: bool = False):
        zf, posf, maskf, (B, K, N) = _flatten(batch)
        adjf = jnp.repeat(batch.bond_adj, K, axis=0)
        attrf = jnp.repeat(batch.bond_attr, K, axis=0)
        h = SchNet3D(
            hidden_channels=self.hidden_channels, num_interactions=6, use_covalent=True
        )(zf, posf, maskf, adjf, attrf)
        x = masked_sum(h, maskf).reshape(B, K, -1)
        x = nn.Dense(1, kernel_init=xavier)(x)
        return x.mean(axis=1)


class AttentionEmbeddingsAggregation(nn.Module):
    """Dot-product attention across the whole flat conformer batch before the
    conformer mean (schnet_based_models.py:439-474 — note the reference
    attends across *all* conformers in the batch, molecules included)."""

    hidden_channels: int = 128

    @nn.compact
    def __call__(self, batch, use_barycenter: bool = False):
        zf, posf, maskf, (B, K, N) = _flatten(batch)
        h = SchNet3D(hidden_channels=self.hidden_channels, num_interactions=3)(
            zf, posf, maskf
        )
        x = masked_sum(h, maskf)  # (B*K, C)
        half = self.hidden_channels // 2
        q = nn.Dense(half, kernel_init=xavier)(x)
        k = nn.Dense(half, kernel_init=xavier)(x)
        v = nn.Dense(half, kernel_init=xavier)(x)
        # softmax over the full flat batch axis, as in the reference
        sim = nn.softmax(q @ k.T, axis=1)
        x = (sim @ v).reshape(B, K, -1).mean(axis=1)
        return nn.Dense(1, kernel_init=xavier)(x)


class EmbeddingsWithGAT(nn.Module):
    """2D-only GAT head (GATExperiment; schnet_based_models.py:495-533)."""

    hidden_channels: int = 128

    @nn.compact
    def __call__(self, batch, use_barycenter: bool = False):
        x_cov = GAT2D(out_channels=self.hidden_channels // 2)(
            batch.x2d, batch.bond_adj, batch.bond_attr, batch.atom_mask
        )
        return nn.Dense(1, kernel_init=xavier)(x_cov)


class ESANAggregation(nn.Module):
    """ESAN variant → linear regression head."""

    variant: str = "avg_conf_esan"
    hidden_channels: int = 128

    @nn.compact
    def __call__(self, batch, use_barycenter: bool = False):
        net = {
            "avg_conf_esan": esan_lib.AverageConformerESAN,
            "geometry_induced_esan": esan_lib.GeometryInducedESAN,
            "geometry_2d_induced_esan": esan_lib.Geometry2DInducedESAN,
        }[self.variant](hidden_channels=self.hidden_channels)
        return nn.Dense(1, kernel_init=xavier)(net(batch))
