"""ESAN conformer-subgraph aggregation networks (dense masked form).

Equivalents of ``conan_fgw/src/model/graph_embeddings/esan.py:116-312``:
siamese SchNet encoders per conformer with an "info sharing" SchNet on the
*average conformer* (mean of positions across K — the atoms are identical),
DeepSets aggregation over conformers, and geometry-induced variants that mix
2D GAT branches over (a) the covalent graph and (b) per-conformer radius
subgraphs (with RBF edge features, or covalent bond features masked to the
radius graph).

All variants consume a ``PackedBatch`` and return molecule embeddings
``(B, hidden//2)``. Where the reference computes unused tensors (e.g.
``Geometry2DInducedESAN`` runs its siamese SchNet only to obtain the radius
edge list), we compute just the needed quantity — numerically identical.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from conan_fgw_tpu.models.gat import GAT2D
from conan_fgw_tpu.models.schnet import SchNet3D
from conan_fgw_tpu.ops.graph import masked_sum, pairwise_distances, radius_graph_mask
from conan_fgw_tpu.ops.rbf import gaussian_smearing

xavier = nn.initializers.xavier_uniform()

# SchNetNoSum() defaults used by every ESAN constructor (esan.py:120-121):
_SCHNET_DEFAULTS = dict(
    hidden_channels=128, num_filters=128, num_gaussians=50,
    num_interactions=6, cutoff=10.0,
)


def _flatten(batch):
    B, K, N = batch.z.shape
    return (
        batch.z.reshape(B * K, N),
        batch.pos.reshape(B * K, N, 3),
        jnp.repeat(batch.atom_mask, K, axis=0),
        (B, K, N),
    )


class DeepSets(nn.Module):
    """sum_k local(h_k) — DeepSetsAggregation with a linear local net."""

    channels: int

    @nn.compact
    def __call__(self, h_conf):  # (B, K, C)
        return jnp.sum(nn.Dense(self.channels, kernel_init=xavier)(h_conf), axis=1)


class AverageConformerESAN(nn.Module):
    """Siamese SchNet per conformer + SchNet on the average conformer
    (``esan.py:116-165``)."""

    hidden_channels: int = 128

    def setup(self):
        cfg = {**_SCHNET_DEFAULTS, "hidden_channels": self.hidden_channels}
        self.siamese = SchNet3D(**cfg)
        self.info_sharing = SchNet3D(**cfg)
        self.deep_sets = DeepSets(self.hidden_channels // 2)

    def __call__(self, batch):
        zf, posf, maskf, (B, K, N) = _flatten(batch)
        h = self.siamese(zf, posf, maskf)
        h_conf = masked_sum(h, maskf).reshape(B, K, -1)
        out = self.deep_sets(h_conf)

        pos_avg = jnp.mean(batch.pos, axis=1)  # atoms identical across K
        h_sh = self.info_sharing(batch.z[:, 0], pos_avg, batch.atom_mask)
        out = out + masked_sum(h_sh, batch.atom_mask)
        return out


class GeometryInducedESAN(nn.Module):
    """3D siamese + 2D GAT on covalent graph + GAT on per-conformer radius
    subgraphs with RBF edge features (``esan.py:168-235``)."""

    hidden_channels: int = 128

    def setup(self):
        cfg = {**_SCHNET_DEFAULTS, "hidden_channels": self.hidden_channels}
        half = self.hidden_channels // 2
        self.siamese = SchNet3D(**cfg)
        self.info_sharing = SchNet3D(**cfg)
        self.gat_2d = GAT2D(out_channels=64)
        self.gat_rbf = GAT2D(out_channels=64)
        self.transformation = nn.Dense(half, kernel_init=xavier)
        self.deep_sets = DeepSets(half)

    def __call__(self, batch):
        zf, posf, maskf, (B, K, N) = _flatten(batch)
        h, nbr, rbf = self.siamese.embed_simple(zf, posf, maskf)
        h3d = masked_sum(h, maskf).reshape(B, K, -1)

        x2d_bond = self.gat_2d(batch.x2d, batch.bond_adj, batch.bond_attr, batch.atom_mask)
        x2df = jnp.repeat(batch.x2d, K, axis=0)
        x2d_sub = self.gat_rbf(x2df, nbr, rbf, maskf).reshape(B, K, -1)
        h2d = x2d_bond[:, None, :] + x2d_sub

        out = self.deep_sets(h3d + self.transformation(h2d))
        pos_avg = jnp.mean(batch.pos, axis=1)
        h_sh = self.info_sharing(batch.z[:, 0], pos_avg, batch.atom_mask)
        return out + masked_sum(h_sh, batch.atom_mask)


class Geometry2DInducedESAN(nn.Module):
    """2D GATs only: covalent graph + covalent features masked to the radius
    subgraph of each conformer, plus the average-conformer SchNet
    (``esan.py:238-312``; the 3D siamese output is unused in the reference
    and therefore not computed here)."""

    hidden_channels: int = 128
    cutoff: float = 10.0
    max_neighbors: int = 32

    def setup(self):
        cfg = {**_SCHNET_DEFAULTS, "hidden_channels": self.hidden_channels}
        half = self.hidden_channels // 2
        self.info_sharing = SchNet3D(**cfg)
        self.gat_2d = GAT2D(out_channels=64)
        self.gat_sub = GAT2D(out_channels=64)
        self.transformation = nn.Dense(half, kernel_init=xavier)
        self.deep_sets = DeepSets(half)

    def __call__(self, batch):
        zf, posf, maskf, (B, K, N) = _flatten(batch)
        dist = pairwise_distances(posf)
        nbr = radius_graph_mask(dist, maskf, self.cutoff, self.max_neighbors)

        x2d_bond = self.gat_2d(batch.x2d, batch.bond_adj, batch.bond_attr, batch.atom_mask)
        x2df = jnp.repeat(batch.x2d, K, axis=0)
        battrf = jnp.repeat(batch.bond_attr, K, axis=0) * nbr[..., None]
        x2d_sub = self.gat_sub(x2df, nbr, battrf, maskf).reshape(B, K, -1)
        h2d = x2d_bond[:, None, :] + x2d_sub

        out = self.transformation(self.deep_sets(h2d))
        pos_avg = jnp.mean(batch.pos, axis=1)
        h_sh = self.info_sharing(batch.z[:, 0], pos_avg, batch.atom_mask)
        return out + masked_sum(h_sh, batch.atom_mask)
