"""Radial basis expansions and smooth cutoffs (pure functions, shape-static).

Equivalents of PyG's ``GaussianSmearing`` (used by the reference SchNet,
``schnet_no_sum.py:209``) and ``ExpNormalSmearing``/``CosineCutoff``
(vendored ViSNet, ``torch_geometric_visnet.py:13-113``).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def gaussian_smearing(
    dist: jnp.ndarray, num_gaussians: int, start: float = 0.0, stop: float = 10.0
) -> jnp.ndarray:
    """``exp(-0.5/dx^2 * (d - mu_k)^2)`` over a linspace grid of centers."""
    offset = jnp.linspace(start, stop, num_gaussians, dtype=dist.dtype)
    coeff = -0.5 / (offset[1] - offset[0]) ** 2
    return jnp.exp(coeff * (dist[..., None] - offset) ** 2)


def cosine_cutoff(dist: jnp.ndarray, cutoff: float) -> jnp.ndarray:
    """``0.5 * (cos(pi d / r_c) + 1)``, zero beyond the cutoff."""
    c = 0.5 * (jnp.cos(dist * math.pi / cutoff) + 1.0)
    return jnp.where(dist <= cutoff, c, 0.0)


def expnorm_smearing(
    dist: jnp.ndarray,
    means: jnp.ndarray,
    betas: jnp.ndarray,
    cutoff: float,
) -> jnp.ndarray:
    """ViSNet's exponential-normal RBF with cosine-cutoff envelope."""
    alpha = 5.0 / cutoff
    env = cosine_cutoff(dist, cutoff)
    return env[..., None] * jnp.exp(
        -betas * (jnp.exp(alpha * (-dist[..., None])) - means) ** 2
    )


def expnorm_initial_params(num_rbf: int, cutoff: float, dtype=jnp.float32):
    """Initial (means, betas) exactly as the vendored ViSNet computes them."""
    start_value = math.exp(-cutoff)
    means = jnp.linspace(start_value, 1.0, num_rbf, dtype=dtype)
    betas = jnp.full((num_rbf,), (2.0 / num_rbf * (1.0 - start_value)) ** -2, dtype=dtype)
    return means, betas


def shifted_softplus(x: jnp.ndarray) -> jnp.ndarray:
    """``softplus(x) - log(2)`` — SchNet's activation."""
    return jnp.logaddexp(x, 0.0) - math.log(2.0)
