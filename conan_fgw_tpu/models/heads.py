"""Fusion heads: 3D backbone + 2D GAT + FGW-barycenter branch → prediction.

TPU-native redesign of the reference composite models
(``conan_fgw/src/model/schnet_based_models.py``):

* ``EmbeddingsWithGATAggregation[BaryCenter]``   → ``ConanModel(task='regression')``
* ``EmbeddingsWithGATAggregationClassification[BaryCenter]``
                                                 → ``ConanModel(task='classification')``

The barycenter stage is a *call-time* flag (``use_barycenter``) rather than a
separate class, so stage-1 and stage-2 share one parameter tree and the
two-stage warm start is a plain checkpoint restore (the reference relies on
both torch models having identical ``state_dict`` key sets).

Algebraic simplifications (numerically identical to the reference, fewer
FLOPs): affine transforms commute with the conformer mean, so the per-
conformer ``T(x_k)`` + mean is computed as ``T(mean_k x_k)``; the 2D GAT runs
once per molecule instead of once per conformer copy (conformers share the
covalent graph); the barycenter readout is used at molecule level instead of
being replicated K times.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from conan_fgw_tpu.models.attention import SelfAttention
from conan_fgw_tpu.models.gat import GAT2D
from conan_fgw_tpu.models.schnet import SchNet3D
from conan_fgw_tpu.ops.fgw import FGWConfig, fgw_barycenter_batch, normalize_minmax
from conan_fgw_tpu.ops.graph import masked_sum

xavier = nn.initializers.xavier_uniform()


class RegressionHead(nn.Module):
    """``build_mlp``: a single Linear for the simple (non-complex) variant."""

    @nn.compact
    def __call__(self, x):
        return nn.Dense(1, kernel_init=xavier)(x)


class ClassificationHead(nn.Module):
    """``build_mlp_class(is_complex=True)``: Linear→ReLU→Linear→ReLU→Linear."""

    channels: int

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.channels, kernel_init=xavier)(x))
        x = nn.relu(nn.Dense(self.channels // 2, kernel_init=xavier)(x))
        return nn.Dense(1, kernel_init=xavier)(x)


class ConanModel(nn.Module):
    """Conformer aggregation network with optional FGW-barycenter branch.

    Attributes:
      task: "regression" | "classification".
      hidden_channels: backbone width (reference: 128 regression / 512
        classification).
      num_filters / num_gaussians / num_interactions / cutoff: SchNet config.
      agg_weight: barycenter branch weight (reference default 0.2).
      fgw: solver configuration.
      bary_shift: constant added to barycenter-branch node features before
        min-max normalisation (0.5 for SchNet, 1.0 for ViSNet/DimeNet — see
        ``schnet_no_sum.py:59`` vs ``visnet.py:50``).
      bary_pad_mode: "reference" keeps the reference's padding semantics
        (pad rows carry uniform mass with zero adjacency); "masked" excludes
        padding from marginals and normalisation.
    """

    task: str = "regression"
    backbone_name: str = "schnet"
    hidden_channels: int = 128
    num_filters: int = 128
    num_gaussians: int = 50
    num_interactions: int = 3
    cutoff: float = 10.0
    max_neighbors: int = 32
    agg_weight: float = 0.2
    fgw: FGWConfig = FGWConfig()
    bary_shift: float = 0.5
    bary_norm: Tuple[float, float] = (0.1, 2.0)
    bary_pad_mode: str = "reference"
    bary_postnorm: str = "none"  # "l2col" for ViSNet (visnet.py:233-241)
    # trunk matmul dtype: "bfloat16" runs the SchNet cfconv at full MXU rate
    # (params, fusion heads, and the FGW solver stay f32)
    compute_dtype: str = "float32"
    # fused Pallas cfconv (SchNet backbone only; see ops/pallas/cfconv.py).
    # None = auto: on for TPU f32/bf16 trunks, off elsewhere
    # (models/schnet.py:142-157)
    use_pallas_cfconv: Optional[bool] = None

    def setup(self):
        half = self.hidden_channels // 2
        if self.backbone_name == "schnet":
            self.backbone = SchNet3D(
                hidden_channels=self.hidden_channels,
                num_filters=self.num_filters,
                num_gaussians=self.num_gaussians,
                num_interactions=self.num_interactions,
                cutoff=self.cutoff,
                max_neighbors=self.max_neighbors,
                compute_dtype=self.compute_dtype,
                use_pallas_cfconv=self.use_pallas_cfconv,
            )
        elif self.backbone_name == "visnet":
            from conan_fgw_tpu.models.visnet import ViSNet3D

            # wrapper defaults: cutoff 5.0, 6 layers, 8 heads (visnet.py:83-91)
            self.backbone = ViSNet3D(
                hidden_channels=self.hidden_channels,
                cutoff=self.cutoff,
                max_neighbors=self.max_neighbors,
            )
        elif self.backbone_name == "dimenet":
            from conan_fgw_tpu.models.dimenet import DimeNet3D

            self.backbone = DimeNet3D(
                hidden_channels=self.hidden_channels,
                out_channels=half,
                cutoff=self.cutoff,
                max_neighbors=self.max_neighbors,
                compute_dtype=self.compute_dtype,
            )
        else:
            raise ValueError(f"unknown backbone {self.backbone_name!r}")
        self.gat = GAT2D(out_channels=half)
        self.t3d = nn.Dense(half, kernel_init=xavier)
        self.tcov = nn.Dense(half, kernel_init=xavier)
        self.tbary = nn.Dense(half, kernel_init=xavier)
        if self.task == "classification":
            self.head = ClassificationHead(half)
            self.self_attention = SelfAttention(half)
        else:
            self.head = RegressionHead()

    def _conformer_readouts(self, batch, use_barycenter: bool):
        """Backbone over all B*K conformers; returns per-conformer 3D readout
        ``(B, K, C)`` and, when requested, the molecule-level barycenter
        readout ``(B, C)``."""
        B, K, N = batch.z.shape
        zf = batch.z.reshape(B * K, N)
        posf = batch.pos.reshape(B * K, N, 3)
        maskf = jnp.repeat(batch.atom_mask, K, axis=0)

        if not use_barycenter:
            h = self.backbone(zf, posf, maskf)
            x3d = masked_sum(h, maskf).reshape(B, K, -1)
            return x3d, None

        h3, hb, nbr = self.backbone.embed_dual(zf, posf, maskf)
        x3d = masked_sum(h3, maskf).reshape(B, K, -1)

        # --- FGW barycenter branch --------------------------------------
        hb = hb * maskf[..., None].astype(hb.dtype)  # zero pad rows
        C = hb.shape[-1]
        hb = hb.reshape(B, K, N, C)
        a, b = self.bary_norm
        if self.bary_pad_mode == "reference":
            # per-conformer min-max over the full padded matrix, pads included;
            # eps keeps fully-padded (batch-filler) molecules NaN-free
            ys = jax.vmap(
                jax.vmap(lambda m: normalize_minmax(m + self.bary_shift, a, b, eps=1e-12))
            )(hb)
            ps = None
            p = None
        else:
            node_mask = batch.atom_mask[:, None, :, None]
            shifted = hb + self.bary_shift
            lo = jnp.min(jnp.where(node_mask, shifted, jnp.inf), axis=(-2, -1), keepdims=True)
            hi = jnp.max(jnp.where(node_mask, shifted, -jnp.inf), axis=(-2, -1), keepdims=True)
            # where(), not multiply-by-mask: batch-filler molecules have
            # lo=inf/hi=-inf, and nan*0 would poison the solve
            ys = jnp.where(
                node_mask, a + (shifted - lo) * (b - a) / (hi - lo + 1e-12), 0.0
            )
            counts = jnp.sum(batch.atom_mask, axis=-1, keepdims=True)
            pm = batch.atom_mask.astype(hb.dtype) / jnp.maximum(counts, 1)
            ps = jnp.broadcast_to(pm[:, None, :], (B, K, N))
            p = pm
        # structure graph: dense adjacency of the radius graph, A[j, i] = j→i
        cs = nbr.swapaxes(-1, -2).astype(hb.dtype).reshape(B, K, N, N)
        y_bary, _, n_div = fgw_barycenter_batch(
            ys, cs, ps=ps, p=p, config=self.fgw, return_diverged=True
        )
        # Sinkhorn numerical-failure counter (rolled-back solves); readable via
        # ``apply(..., mutable=["diagnostics"])`` and logged by the train loop
        self.sow("diagnostics", "fgw_diverged", n_div)
        if self.bary_postnorm == "l2col":
            # ViSNet wrapper: zero non-finite barycenters, then normalise each
            # feature column to unit L2 norm (visnet.py:233-241)
            finite = jnp.all(jnp.isfinite(y_bary), axis=(-2, -1), keepdims=True)
            y_bary = jnp.where(finite, y_bary, 0.0)
            col = jnp.sqrt(jnp.sum(y_bary * y_bary, axis=-2, keepdims=True) + 1e-16)
            y_bary = y_bary / col
        x_bary = jnp.sum(y_bary, axis=-2)  # sum-readout (pads included, as ref)
        return x3d, x_bary

    def embeddings(self, batch):
        """Visualization path: per-conformer 3D readouts and the molecule-level
        barycenter embedding, before fusion (the reference's
        ``EmbeddingsVisualizationBaryCenter.forward`` /
        ``forward_w_barycenter_visualization``,
        ``schnet_based_models.py:372-417``). Returns a dict
        ``{"x3d": (B, K, C), "x_bary": (B, C), "x_cov": (B, C)}``."""
        x3d, x_bary = self._conformer_readouts(batch, use_barycenter=True)
        x_cov = self.gat(batch.x2d, batch.bond_adj, batch.bond_attr, batch.atom_mask)
        return {"x3d": x3d, "x_bary": x_bary, "x_cov": x_cov}

    def __call__(self, batch, use_barycenter: bool = False):
        """Returns predictions ``(B, 1)`` (logits for classification)."""
        if self.is_initializing():
            # Materialise every branch so stage-1 (pre) and stage-2 (barycenter)
            # share one parameter tree — the two-stage warm start is then a
            # plain restore (the reference relies on identical state_dicts).
            use_barycenter = True
            half = self.hidden_channels // 2
            if self.task == "classification":
                _ = self.self_attention(jnp.zeros((1, 1, half)))
        x3d, x_bary = self._conformer_readouts(batch, use_barycenter)
        x_cov = self.gat(batch.x2d, batch.bond_adj, batch.bond_attr, batch.atom_mask)

        if self.task == "classification" and not use_barycenter:
            # attention runs per conformer before the K-mean in the reference;
            # fused embedding = T3d(x3d_k) + Tcov(x_cov)
            xk = self.t3d(x3d) + self.tcov(x_cov)[:, None, :]
            xk = self.self_attention(xk[..., None, :])[..., 0, :]
            x = jnp.mean(xk, axis=1)
        else:
            x = self.t3d(jnp.mean(x3d, axis=1)) + self.tcov(x_cov)
            if use_barycenter:
                x = x + self.agg_weight * self.tbary(x_bary)

        out = self.head(x)
        # Classification returns LOGITS (deviation from the reference, which
        # applies sigmoid in-model and F.binary_cross_entropy on
        # probabilities, common.py:211-217): at the 512-wide head's init
        # scale the f32 sigmoid saturates exactly to 0/1, the clipped
        # prob-space BCE has zero gradient, and training never starts.
        # The sigmoid moves to the numerically-stable logit-space BCE in
        # the loss (loop.py) and to the inference boundary (predict.py);
        # AUROC/PRC are rank-based and unaffected.
        return out
