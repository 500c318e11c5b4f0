"""Dense masked GAT over the 2D covalent graph.

Equivalent of the reference's ``GATBased``
(``conan_fgw/src/model/graph_embeddings/gat.py:5-25``): two PyG ``GATConv``
layers with 3-dim bond-edge attributes (no activation in between — a
reference quirk we keep) followed by a sum readout. PyG semantics that are
load-bearing and replicated here:

* attention logits ``leaky_relu(a_src·Wx_j + a_dst·Wx_i + a_edge·We_ij, 0.2)``
  softmaxed over each target's in-neighborhood,
* self-loops added with edge attributes equal to the *mean of the incoming
  edges'* attributes (``add_self_loops(fill_value='mean')``),
* raw categorical feature indices consumed as floats.

Dense form: the softmax runs over a masked ``(N, N)`` adjacency — one fused
softmax+matmul per graph instead of scatter ops.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

glorot = nn.initializers.xavier_uniform()


class DenseGATConv(nn.Module):
    out_channels: int
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, x, adj, edge_attr, mask):
        """x: (..., N, F); adj: (..., N, N) bool (symmetric, no self loops);
        edge_attr: (..., N, N, E); mask: (..., N) node validity."""
        n = x.shape[-2]
        xs = nn.Dense(self.out_channels, use_bias=False, kernel_init=glorot)(x)
        att_src = self.param("att_src", glorot, (1, self.out_channels))
        att_dst = self.param("att_dst", glorot, (1, self.out_channels))
        att_edge = self.param("att_edge", glorot, (1, self.out_channels))
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))

        adj_f = adj.astype(x.dtype)
        # self-loop edge attrs: mean of attrs of edges pointing at each node
        deg = jnp.sum(adj_f, axis=-1, keepdims=True)
        loop_attr = jnp.einsum("...ji,...jie->...ie", adj_f, edge_attr) / jnp.maximum(
            deg, 1.0
        )
        eye = jnp.eye(n, dtype=bool)
        edge_attr = jnp.where(
            eye[..., None], loop_attr[..., None, :, :], edge_attr
        )
        e_proj = nn.Dense(self.out_channels, use_bias=False, kernel_init=glorot)(
            edge_attr
        )

        a_src = jnp.einsum("...jc,oc->...j", xs, att_src)
        a_dst = jnp.einsum("...ic,oc->...i", xs, att_dst)
        a_edge = jnp.einsum("...ijc,oc->...ij", e_proj, att_edge)
        # logits for target i attending over sources j
        logits = a_src[..., None, :] + a_dst[..., :, None] + a_edge
        logits = nn.leaky_relu(logits, self.negative_slope)

        attend = (adj | eye) & mask[..., None, :] & mask[..., :, None]
        # -1e9 (not -inf) keeps fully-masked rows NaN-free under softmax+grad
        logits = jnp.where(attend, logits, -1e9)
        alpha = nn.softmax(logits, axis=-1)
        alpha = jnp.where(attend, alpha, 0.0)

        out = jnp.einsum("...ij,...jc->...ic", alpha, xs) + bias
        return out * mask[..., None].astype(x.dtype)


class GAT2D(nn.Module):
    """Two-layer GAT + masked sum readout (``GATBased.forward``)."""

    out_channels: int = 64
    edge_dim: int = 3

    @nn.compact
    def __call__(self, x2d, adj, edge_attr, mask):
        x = x2d.astype(jnp.float32)
        e = edge_attr.astype(jnp.float32)
        h = DenseGATConv(self.out_channels)(x, adj, e, mask)
        h = DenseGATConv(self.out_channels)(h, adj, e, mask)
        return jnp.sum(h * mask[..., None].astype(h.dtype), axis=-2)
