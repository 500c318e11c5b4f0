"""Self-attention used by the classification heads.

Equivalent of ``conan_fgw/src/model/attention_layer.py:17-33``. Note the
reference applies it to a sequence of length 1 (one fused embedding per
conformer, ``schnet_based_models.py:297-299``), where softmax over a
singleton is identically 1 and the block degenerates to its value
projection — we implement the general form anyway.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

xavier = nn.initializers.xavier_uniform()


class AttentionLayer(nn.Module):
    """Gated softmax attention map (``attention_layer.py:6-14``,
    ``Attention_Layer`` — defined but unused by the reference heads; kept for
    inventory parity). Returns ``softmax(X ⊙ W(X))`` over axis 1."""

    n_feats: int

    @nn.compact
    def __call__(self, x):
        w = nn.Dense(self.n_feats, kernel_init=xavier)(x)
        return nn.softmax(x * w, axis=1)


class SelfAttention(nn.Module):
    input_dim: int

    @nn.compact
    def __call__(self, x):
        """x: (..., L, D) → (..., L, D)."""
        q = nn.Dense(self.input_dim, kernel_init=xavier)(x)
        k = nn.Dense(self.input_dim, kernel_init=xavier)(x)
        v = nn.Dense(self.input_dim, kernel_init=xavier)(x)
        scores = q @ k.swapaxes(-1, -2) / (self.input_dim**0.5)
        return nn.softmax(scores, axis=-1) @ v
