"""Masked-dense SchNet backbone with dual (3D / barycenter) heads.

Functional equivalent of the reference ``SchNetNoSum``
(``conan_fgw/src/model/graph_embeddings/schnet_no_sum.py:90-354``), itself an
extension of PyG ``SchNet``: atom embedding → radius graph → Gaussian RBF →
continuous-filter convolution blocks with residual adds → two small MLP heads
sharing the trunk (``lin1/lin2`` for the 3D branch, ``lin1_bary/lin2_bary``
for the barycenter branch; the activation comes *after* both linears, a quirk
of the reference we keep).

TPU-first re-design: the ragged gather/scatter cfconv becomes one masked
einsum over a dense ``(N, N)`` neighbor mask per molecule — fixed shapes,
batched over ``B*K`` conformer graphs, MXU-friendly.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from conan_fgw_tpu.ops.graph import pairwise_distances, radius_graph_mask
from conan_fgw_tpu.ops.rbf import gaussian_smearing, shifted_softplus

xavier = nn.initializers.xavier_uniform()

# Pallas cfconv VMEM gate: the fused backward keeps several (N, N, F) f32
# tiles on the kernel stack at once, and the TPU scoped-VMEM limit is 16 MiB.
# Measured bounds: N=64, F=128 compiles and runs (the bench's unbucketed_n64
# row, N²·F = 524k elements); N=64, F=256 (the classification registry shape)
# OOMs at 18.04 MiB (r5 queue, blocks_2 backward). Gate on N²·F elements with
# headroom below the measured failure; above it the block falls back to the
# XLA formulation, which has no such limit.
CFCONV_PALLAS_MAX_N2F = 600_000


class InteractionBlock(nn.Module):
    """One continuous-filter convolution block (PyG ``InteractionBlock``).

    ``dtype`` is the compute dtype: parameters stay f32 (flax casts them per
    matmul), the MXU accumulates in f32, and only the stored activations are
    low-precision — standard TPU mixed precision.

    The filter-net parameters are declared raw (not as ``nn.Dense``) so the
    same weights drive both formulations of the cfconv:

    * XLA (default): RBF → filter MLP → cosine envelope → masked einsum.
    * Pallas (``use_pallas=True`` and ``pos``/``atom_mask`` given): one fused
      VMEM kernel per conformer graph recomputing distances/mask/RBF on-chip,
      so the ``(G, N, N, F)`` filter tensor never touches HBM
      (``conan_fgw_tpu.ops.pallas.cfconv``). f32 and bf16 trunks (the kernel
      computes in f32 and casts the stored messages).
    """

    hidden_channels: int
    num_filters: int
    cutoff: float
    dtype: jnp.dtype = jnp.float32
    num_gaussians: int = 50
    max_neighbors: Optional[int] = 32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, h, rbf, dist, nbr_mask, pos=None, atom_mask=None):
        h = h.astype(self.dtype)
        # filter network on the RBF-expanded distances (raw params shared by
        # the XLA and Pallas paths)
        w1 = self.param("filter_w1", xavier, (rbf.shape[-1], self.num_filters))
        b1 = self.param("filter_b1", nn.initializers.zeros, (self.num_filters,))
        w2 = self.param("filter_w2", xavier, (self.num_filters, self.num_filters))
        b2 = self.param("filter_b2", nn.initializers.zeros, (self.num_filters,))
        # cfconv: project, message = x_j ⊙ W_ij, sum over sources j
        x = nn.Dense(
            self.num_filters, use_bias=False, kernel_init=xavier, dtype=self.dtype
        )(h)
        fused = (
            self.use_pallas
            and pos is not None
            and atom_mask is not None
            and not self.is_initializing()
            # scoped-VMEM envelope of the fused backward (see
            # CFCONV_PALLAS_MAX_N2F): large buckets × wide filters fall back
            # to XLA instead of failing to compile
            and x.shape[-2] ** 2 * self.num_filters <= CFCONV_PALLAS_MAX_N2F
        )
        if fused:
            from conan_fgw_tpu.ops.pallas.cfconv import fused_cfconv

            lead, (n, f) = x.shape[:-2], x.shape[-2:]
            m = fused_cfconv(
                pos.reshape(-1, n, 3).astype(jnp.float32),
                atom_mask.reshape(-1, n).astype(jnp.float32),
                x.reshape(-1, n, f).astype(jnp.float32),
                w1, b1, w2, b2,
                self.cutoff, self.num_gaussians, self.max_neighbors or n,
            ).reshape(*lead, n, f).astype(self.dtype)
        else:
            w = shifted_softplus(
                rbf.astype(self.dtype) @ w1.astype(self.dtype) + b1.astype(self.dtype)
            )
            w = w @ w2.astype(self.dtype) + b2.astype(self.dtype)
            # smooth cosine-cutoff envelope (PyG CFConv); computed in f32, cast
            env = 0.5 * (jnp.cos(dist * math.pi / self.cutoff) + 1.0)
            w = w * (env * nbr_mask.astype(jnp.float32))[..., None].astype(self.dtype)
            m = jnp.einsum(
                "...ijf,...jf->...if", w, x, preferred_element_type=jnp.float32
            ).astype(self.dtype)
        x = nn.Dense(self.hidden_channels, kernel_init=xavier, dtype=self.dtype)(m)
        x = shifted_softplus(x)
        x = nn.Dense(self.hidden_channels, kernel_init=xavier, dtype=self.dtype)(x)
        return x


class SchNet3D(nn.Module):
    """SchNet trunk + dual heads over padded conformer point clouds.

    Hyper-parameter defaults follow the reference regression configuration
    (``common.py:512-529``: hidden=128, filters=128, gaussians=50,
    interactions=3, cutoff=10, max 32 neighbors); the classification path
    uses hidden=512, filters=256, gaussians=10.
    """

    hidden_channels: int = 128
    num_filters: int = 128
    num_interactions: int = 3
    num_gaussians: int = 50
    cutoff: float = 10.0
    max_neighbors: Optional[int] = 32
    neighbor_cap_mode: str = "index"
    use_covalent: bool = False
    # rematerialise each interaction block in the backward pass: the cfconv's
    # (B·K, N, N, F) filter tensor is the model's dominant activation; without
    # remat the backward keeps one per block live in HBM, capping batch size.
    # Costs ~25% step time — enable only when batch memory demands it.
    remat: bool = False
    # matmul/activation dtype for the trunk (params and accumulation stay
    # f32). bfloat16 runs the cfconv filter MLP at full MXU rate on TPU; the
    # FGW solver is unaffected (its inputs are cast back to f32).
    compute_dtype: str = "float32"
    # route the radius-graph cfconv through the fused Pallas kernel (f32,
    # "index" neighbor-cap only; covalent blocks always use the XLA path).
    # None = auto: Pallas on TPU (measured +22% at the headline shape,
    # +54% at batch 256 f32 with the fused backward — bench.py), XLA
    # elsewhere (interpret-mode Pallas on CPU is orders slower).
    use_pallas_cfconv: Optional[bool] = None

    def setup(self):
        import jax

        self.embedding = nn.Embed(
            100, self.hidden_channels, embedding_init=nn.initializers.normal(1.0)
        )
        block = nn.remat(InteractionBlock) if self.remat else InteractionBlock
        cdtype = jnp.dtype(self.compute_dtype)
        want_pallas = (
            self.use_pallas_cfconv
            if self.use_pallas_cfconv is not None
            else jax.default_backend() == "tpu"
        )
        # f32 and bf16 trunks both route through the kernel (it computes in
        # f32 VMEM regardless and casts only the stored messages, so the
        # bf16 path is slightly *more* precise than the bf16 XLA cfconv)
        use_pallas = (
            want_pallas
            and self.neighbor_cap_mode == "index"
            and cdtype in (jnp.float32, jnp.bfloat16)
        )
        self.blocks = [
            block(
                self.hidden_channels, self.num_filters, self.cutoff, cdtype,
                self.num_gaussians, self.max_neighbors, use_pallas,
            )
            for _ in range(self.num_interactions)
        ]
        if self.use_covalent:
            # parallel interaction stack over the covalent bond graph with
            # 3-dim bond features as "RBF" input and unit edge weights
            # (schnet_no_sum.py:132-142,166-175)
            self.blocks_cov = [
                block(self.hidden_channels, self.num_filters, self.cutoff, cdtype)
                for _ in range(self.num_interactions)
            ]
        half = self.hidden_channels // 2
        self.lin1 = nn.Dense(half, kernel_init=xavier)
        self.lin2 = nn.Dense(half, kernel_init=xavier)
        self.lin1_bary = nn.Dense(half, kernel_init=xavier)
        self.lin2_bary = nn.Dense(half, kernel_init=xavier)

    def neighbor_graph(self, pos, mask):
        """Distances + neighbor mask; also the FGW structure graph source."""
        dist = pairwise_distances(pos)
        nbr = radius_graph_mask(
            dist, mask, self.cutoff, self.max_neighbors, self.neighbor_cap_mode
        )
        return dist, nbr

    def trunk(self, z, pos, mask, bond_adj=None, bond_attr=None):
        dist, nbr = self.neighbor_graph(pos, mask)
        rbf = gaussian_smearing(dist, self.num_gaussians, 0.0, self.cutoff)
        h = self.embedding(z)
        h = h * mask[..., None].astype(h.dtype)
        for blk in self.blocks:
            h = h + blk(h, rbf, dist, nbr, pos, mask)
        if self.use_covalent:
            if bond_adj is None:
                raise ValueError("use_covalent=True requires bond_adj/bond_attr")
            h_cov = self.embedding(z) * mask[..., None].astype(h.dtype)
            ones = jnp.ones_like(dist)  # reference uses unit edge weights
            for blk in self.blocks_cov:
                h_cov = h_cov + blk(h_cov, bond_attr, ones, bond_adj)
            h = jnp.concatenate([h, h_cov], axis=-1)
        return h, nbr

    def __call__(self, z, pos, mask, bond_adj=None, bond_attr=None):
        """3D branch only (stage-1 forward, ``schnet_no_sum.py:144-188``).

        Returns per-node features ``(..., N, hidden//2)``; readout is the
        caller's job (the reference sums per conformer graph).
        """
        if self.is_initializing():
            h3, _, _ = self.embed_dual(z, pos, mask, bond_adj, bond_attr)
            return h3
        h, _ = self.trunk(z, pos, mask, bond_adj, bond_attr)
        h = self.lin1(h)
        h = self.lin2(h)
        h = shifted_softplus(h)
        return h

    def embed_dual(self, z, pos, mask, bond_adj=None, bond_attr=None):
        """Both heads off the shared trunk (``forward_3d_bary``).

        Returns ``(h_3d, h_bary, nbr_mask)`` with per-node features; the
        neighbor mask doubles as the conformer structure graph for FGW
        (the reference re-runs ``interaction_graph`` and densifies it,
        ``schnet_no_sum.py:342,249-253``).
        """
        h, nbr = self.trunk(z, pos, mask, bond_adj, bond_attr)
        h3 = shifted_softplus(self.lin2(self.lin1(h)))
        hb = shifted_softplus(self.lin2_bary(self.lin1_bary(h)))
        return h3, hb, nbr

    def embed_simple(self, z, pos, mask):
        """One-linear head variant (``SchNetWithMultipleReturns.forward``,
        ``schnet_no_sum.py:405-450``): ``h = act(lin1(h))`` per node, plus the
        radius-graph mask and its RBF edge features for subgraph consumers."""
        dist, nbr = self.neighbor_graph(pos, mask)
        rbf = gaussian_smearing(dist, self.num_gaussians, 0.0, self.cutoff)
        h = self.embedding(z) * mask[..., None].astype(pos.dtype)
        for blk in self.blocks:
            h = h + blk(h, rbf, dist, nbr)
        h = shifted_softplus(self.lin1(h))
        return h, nbr, rbf * nbr[..., None].astype(pos.dtype)
