"""Masked-dense ViSNet: equivariant vector-scalar interactive message passing.

TPU-native re-implementation of the reference's vendored PyG ViSNet
(``conan_fgw/src/model/graph_embeddings/torch_geometric_visnet.py``) and its
conformer wrapper (``visnet.py:82-288``): ExpNormal RBF + cosine cutoff,
neighbor/edge embeddings, ``num_layers`` ViS_MP attention blocks updating
scalar ``x (N, H)``, vector ``vec (N, 3, H)`` (lmax=1) and edge ``f (N, N, H)``
features, gated-equivariant output heads, and the dual barycenter head
(``output_model_bary``) off the shared trunk.

Dense-mask design notes:
* the reference radius graph here *includes self-loops* (``Distance`` with
  ``add_self_loops=True``); the neighbor-embedding block masks them out again;
* attention is modulated (SiLU, cutoff-scaled), NOT softmax-normalised — a
  plain masked sum over sources;
* all per-edge quantities live as ``(N, N, ...)`` tensors; per-layer
  rematerialisation keeps the N²H activations out of the backward footprint.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from conan_fgw_tpu.ops.graph import pairwise_distances, radius_graph_mask
from conan_fgw_tpu.ops.rbf import cosine_cutoff, expnorm_initial_params

xavier = nn.initializers.xavier_uniform()


def _self_loop_graph_mask(dist, mask, cutoff, cap):
    """radius_graph(loop=True, max_num_neighbors=cap): per-target, the first
    ``cap`` in-range candidates *including self* (torch-cluster index order)."""
    n = dist.shape[-1]
    eye = jnp.eye(n, dtype=bool)
    valid = mask[..., :, None] & mask[..., None, :]
    within = valid & ((dist <= cutoff) | eye)
    rank = jnp.cumsum(within.astype(jnp.int32), axis=-1) - within.astype(jnp.int32)
    return within & (rank < cap)


class VecLayerNorm(nn.Module):
    """Identity (norm_type=None, the reference default) or max-min norm over
    the vector channel, scaled by a per-channel weight."""

    hidden_channels: int
    trainable: bool = False
    norm_type: Optional[str] = None

    @nn.compact
    def __call__(self, vec):
        if self.trainable:
            w = self.param("weight", nn.initializers.ones, (self.hidden_channels,))
        else:
            w = jnp.ones((self.hidden_channels,), vec.dtype)
        if self.norm_type == "max_min":
            dist = jnp.sqrt(
                jnp.sum(vec * vec, axis=-2, keepdims=True) + 1e-16
            )  # (..., 1, H)
            direct = vec / jnp.maximum(dist, 1e-12)
            mx = jnp.max(dist, axis=-1, keepdims=True)
            mn = jnp.min(dist, axis=-1, keepdims=True)
            delta = jnp.where(mx - mn == 0, 1.0, mx - mn)
            dist = (dist - mn) / delta
            vec = jnp.maximum(dist, 0.0) * direct
        return vec * w


class ViS_MP(nn.Module):
    """One vector-scalar interactive attention block (dense masked form)."""

    num_heads: int
    hidden_channels: int
    cutoff: float
    last_layer: bool = False
    vecnorm_type: Optional[str] = None
    trainable_vecnorm: bool = False
    vertex: bool = False  # ViS_MP_Vertex (torch_geometric_visnet.py:676-738)

    @nn.compact
    def __call__(self, x, vec, f, dist, dvec_unit, edge_mask):
        """x (..., N, H); vec (..., N, 3, H); f (..., N, N, H) edge scalars;
        dist (..., N, N); dvec_unit[i, j] = unit(pos_j - pos_i); edge_mask
        (..., N, N) incl. self loops. Returns (dx, dvec, df|None)."""
        H, nh = self.hidden_channels, self.num_heads
        hd = H // nh
        act = nn.silu

        x_ln = nn.LayerNorm(epsilon=1e-5)(x)
        vec_ln = VecLayerNorm(H, self.trainable_vecnorm, self.vecnorm_type)(vec)

        def heads(t):
            return t.reshape(*t.shape[:-1], nh, hd)

        q = heads(nn.Dense(H, kernel_init=xavier, name="q_proj")(x_ln))
        k = heads(nn.Dense(H, kernel_init=xavier, name="k_proj")(x_ln))
        v = heads(nn.Dense(H, kernel_init=xavier, name="v_proj")(x_ln))
        dk = heads(act(nn.Dense(H, kernel_init=xavier, name="dk_proj")(f)))
        dv = heads(act(nn.Dense(H, kernel_init=xavier, name="dv_proj")(f)))

        vec123 = nn.Dense(3 * H, use_bias=False, kernel_init=xavier, name="vec_proj")(vec_ln)
        vec1, vec2, vec3 = jnp.split(vec123, 3, axis=-1)
        vec_dot = jnp.sum(vec1 * vec2, axis=-2)  # (..., N, H)

        m = edge_mask.astype(x.dtype)
        # modulated attention: SiLU(sum_d q_i k_j dk_ij) * cutoff(r_ij)
        attn = jnp.einsum("...ihd,...jhd,...ijhd->...ijh", q, k, dk)
        attn = act(attn) * (cosine_cutoff(dist, self.cutoff) * m)[..., None]

        vmsg = (v[..., None, :, :, :] * dv) * attn[..., None]  # (..., i, j, nh, hd)
        vmsg = vmsg.reshape(*vmsg.shape[:-2], H)  # (..., i, j, H)

        s = act(nn.Dense(2 * H, kernel_init=xavier, name="s_proj")(vmsg))
        s1, s2 = jnp.split(s, 2, axis=-1)
        # vec message: vec_j * s1 + s2 * d_ij  → (..., i, j, 3, H)
        vecmsg = (
            vec_ln[..., None, :, :, :] * s1[..., None, :]
            + s2[..., None, :] * dvec_unit[..., None]
        ) * m[..., None, None]

        x_agg = jnp.sum(vmsg * m[..., None], axis=-2)  # over j
        vec_agg = jnp.sum(vecmsg, axis=-3)  # over j

        o = nn.Dense(3 * H, kernel_init=xavier, name="o_proj")(x_agg)
        o1, o2, o3 = jnp.split(o, 3, axis=-1)
        dx = vec_dot * o2 + o3
        dvec = vec3 * o1[..., None, :] + vec_agg

        if self.last_layer:
            return dx, dvec, None

        # edge update: rejection-product gate
        w_trg = nn.Dense(H, use_bias=False, kernel_init=xavier, name="w_trg_proj")(vec_ln)
        w_src = nn.Dense(H, use_bias=False, kernel_init=xavier, name="w_src_proj")(vec_ln)

        def reject(vh, d):
            # vh: (..., i, j, 3, H) broadcastable; d: (..., i, j, 3)
            proj = jnp.sum(vh * d[..., None], axis=-2, keepdims=True)
            return vh - proj * d[..., None]

        w1 = reject(w_trg[..., :, None, :, :], dvec_unit)  # vec_i vs d_ij
        w2 = reject(w_src[..., None, :, :, :], -dvec_unit)  # vec_j vs -d_ij
        w_dot = jnp.sum(w1 * w2, axis=-2)  # (..., i, j, H)
        if self.vertex:
            # vertex geometric features: a second rejection product built from
            # the *target* vectors alone, gated by the split f-projection
            # (ViS_MP_Vertex.edge_update, torch_geometric_visnet.py:726-738)
            t_trg = nn.Dense(H, use_bias=False, kernel_init=xavier, name="t_trg_proj")(vec_ln)
            t_src = nn.Dense(H, use_bias=False, kernel_init=xavier, name="t_src_proj")(vec_ln)
            t1 = reject(t_trg[..., :, None, :, :], dvec_unit)  # vec_i vs d_ij
            t2 = reject(t_src[..., :, None, :, :], -dvec_unit)  # vec_i vs -d_ij
            t_dot = jnp.sum(t1 * t2, axis=-2)
            f12 = act(nn.Dense(2 * H, kernel_init=xavier, name="f_proj")(f))
            f1, f2 = jnp.split(f12, 2, axis=-1)
            df = f1 * w_dot + f2 * t_dot
        else:
            df = act(nn.Dense(H, kernel_init=xavier, name="f_proj")(f)) * w_dot
        return dx, dvec, df * m[..., None]


def _safe_norm(v, axis):
    # norm with a defined gradient at 0 — padded atoms carry zero vectors and
    # d|v|/dv at 0 is NaN, which would poison the whole backward pass
    return jnp.sqrt(jnp.sum(v * v, axis=axis) + 1e-16)


class GatedEquivariantBlock(nn.Module):
    out_channels: int
    scalar_activation: bool = False

    @nn.compact
    def __call__(self, x, v):
        hidden = x.shape[-1]
        vec1 = _safe_norm(
            nn.Dense(hidden, use_bias=False, kernel_init=xavier, name="vec1_proj")(v),
            axis=-2,
        )
        vec2 = nn.Dense(
            self.out_channels, use_bias=False, kernel_init=xavier, name="vec2_proj"
        )(v)
        h = jnp.concatenate([x, vec1], axis=-1)
        h = nn.Dense(hidden, kernel_init=xavier)(h)
        h = nn.silu(h)
        h = nn.Dense(2 * self.out_channels, kernel_init=xavier)(h)
        x, gate = jnp.split(h, 2, axis=-1)
        v = gate[..., None, :] * vec2
        if self.scalar_activation:
            x = nn.silu(x)
        return x, v


class EquivariantScalar(nn.Module):
    hidden_channels: int
    output_channels: int

    @nn.compact
    def __call__(self, x, v):
        x, v = GatedEquivariantBlock(self.hidden_channels // 2, scalar_activation=True)(x, v)
        x, v = GatedEquivariantBlock(self.output_channels, scalar_activation=False)(x, v)
        return x


class Atomref(nn.Module):
    """Per-element scalar reference added to atomic outputs (zeros by default)."""

    max_z: int = 100

    @nn.compact
    def __call__(self, x, z):
        ref = nn.Embed(self.max_z, 1, embedding_init=nn.initializers.zeros)(z)
        return x + ref


class ViSNet3D(nn.Module):
    """Dense ViSNet trunk + dual output heads (the SchNet3D-compatible API).

    Reference defaults (``torch_geometric_visnet.py:1104-1123`` +
    ``visnet.py:82-91``): lmax=1, 8 heads, 6 layers, 32 RBFs, cutoff 5.0,
    max 32 neighbors (self-loops included in the representation graph).
    """

    hidden_channels: int = 128
    num_heads: int = 8
    num_layers: int = 6
    num_rbf: int = 32
    trainable_rbf: bool = False
    cutoff: float = 5.0
    max_neighbors: int = 32
    vecnorm_type: Optional[str] = None
    trainable_vecnorm: bool = False
    vertex: bool = False  # use ViS_MP_Vertex message passing
    remat: bool = True

    def setup(self):
        H = self.hidden_channels
        self.embedding = nn.Embed(100, H, embedding_init=nn.initializers.normal(1.0))
        self.neighbor_distance_proj = nn.Dense(H, kernel_init=xavier)
        self.neighbor_combine = nn.Dense(H, kernel_init=xavier)
        self.neighbor_embedding_z = nn.Embed(
            100, H, embedding_init=nn.initializers.normal(1.0)
        )
        self.edge_proj = nn.Dense(H, kernel_init=xavier)
        block = nn.remat(ViS_MP, static_argnums=()) if self.remat else ViS_MP
        self.layers = [
            block(
                num_heads=self.num_heads,
                hidden_channels=H,
                cutoff=self.cutoff,
                last_layer=(i == self.num_layers - 1),
                vecnorm_type=self.vecnorm_type,
                trainable_vecnorm=self.trainable_vecnorm,
                vertex=self.vertex,
            )
            for i in range(self.num_layers)
        ]
        self.out_norm = nn.LayerNorm(epsilon=1e-5)
        self.vec_out_norm = VecLayerNorm(H, self.trainable_vecnorm, self.vecnorm_type)
        self.output_model = EquivariantScalar(H, H // 2)
        self.prior_model = Atomref()
        self.output_model_bary = EquivariantScalar(H, H // 2)
        self.prior_model_bary = Atomref()

    def _rbf(self, dist, edge_mask):
        if self.trainable_rbf:
            means = self.param(
                "rbf_means",
                lambda _: expnorm_initial_params(self.num_rbf, self.cutoff)[0],
            )
            betas = self.param(
                "rbf_betas",
                lambda _: expnorm_initial_params(self.num_rbf, self.cutoff)[1],
            )
        else:
            means, betas = expnorm_initial_params(self.num_rbf, self.cutoff)
        alpha = 5.0 / self.cutoff
        env = cosine_cutoff(dist, self.cutoff)
        rbf = env[..., None] * jnp.exp(
            -betas * (jnp.exp(-alpha * dist[..., None]) - means) ** 2
        )
        return rbf * edge_mask[..., None]

    def trunk(self, z, pos, mask):
        n = z.shape[-1]
        H = self.hidden_channels
        dist = pairwise_distances(pos)
        edge_mask = _self_loop_graph_mask(dist, mask, self.cutoff, self.max_neighbors)
        eye = jnp.eye(n, dtype=bool)
        nbr = edge_mask & ~eye  # without self loops
        # the self-loop rows keep dist 0 (reference zeroes self edge weights)
        dist = jnp.where(eye, 0.0, dist)
        rbf = self._rbf(dist, edge_mask)
        # unit vectors pos_j - pos_i; zero on the diagonal
        dvec = pos[..., None, :, :] - pos[..., :, None, :]
        dvec_unit = jnp.where(
            eye[..., None], 0.0, dvec / jnp.maximum(dist[..., None], 1e-12)
        )

        x = self.embedding(z) * mask[..., None]
        # NeighborEmbedding (self-loops excluded)
        c = cosine_cutoff(dist, self.cutoff) * nbr.astype(x.dtype)
        w = self.neighbor_distance_proj(rbf) * c[..., None]
        xz = self.neighbor_embedding_z(z)
        x_nb = jnp.einsum("...ijh,...jh->...ih", w, xz)
        x = self.neighbor_combine(jnp.concatenate([x, x_nb], axis=-1))
        x = x * mask[..., None]

        # EdgeEmbedding: (x_i + x_j) * proj(rbf), on all edges incl. self
        f = (x[..., :, None, :] + x[..., None, :, :]) * self.edge_proj(rbf)
        f = f * edge_mask[..., None]

        vec = jnp.zeros((*x.shape[:-1], 3, H), x.dtype)
        for layer in self.layers:
            dx, dv, df = layer(x, vec, f, dist, dvec_unit, edge_mask)
            x = x + dx
            vec = vec + dv
            if df is not None:
                f = f + df
        x = self.out_norm(x) * mask[..., None]
        vec = self.vec_out_norm(vec) * mask[..., None, None]
        return x, vec, nbr

    def __call__(self, z, pos, mask):
        """Per-node scalar outputs ``(..., N, H//2)`` (caller does readout)."""
        if self.is_initializing():
            h3, _, _ = self.embed_dual(z, pos, mask)  # materialise both heads
            return h3
        x, vec, _ = self.trunk(z, pos, mask)
        out = self.output_model(x, vec)
        out = self.prior_model(out, z)
        return out * mask[..., None]

    def embed_dual(self, z, pos, mask):
        """(h_3d, h_bary, nbr) — both heads off the shared representation,
        matching ``forward_3d_bary`` (visnet.py:124-158)."""
        x, vec, nbr = self.trunk(z, pos, mask)
        h3 = self.prior_model(self.output_model(x, vec), z) * mask[..., None]
        hb = self.prior_model_bary(self.output_model_bary(x, vec), z) * mask[..., None]
        return h3, hb, nbr
