"""Single-pair Fused Gromov-Wasserstein coupling via entropic projected gradient.

Semantics follow the reference PGD solver (``conan_fgw/src/model/fgw/bregman.py:70-167``
with the gradient helpers of ``fgw/utils.py:4-64``):

  repeat:  G = alpha * 2 * (constC - hC1 @ T @ hC2^T) + (1 - alpha) * M
           T = sinkhorn_log(p, q, G, epsilon)
  with the update error checked every 10th iteration against ``tol``.

Everything is a fixed-shape matmul, so the solve batches cleanly with ``vmap``
over conformers and molecules and lands on the MXU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from conan_fgw_tpu.ops.fgw.sinkhorn import sinkhorn_log


def _square_loss_const(C1: jnp.ndarray, C2: jnp.ndarray, p: jnp.ndarray, q: jnp.ndarray):
    """constC, hC1, hC2 for the square GW loss (fgw/utils.py:4-45, square branch)."""
    constC1 = jnp.outer((C1**2) @ p, jnp.ones_like(q))
    constC2 = jnp.outer(jnp.ones_like(p), (C2**2) @ q)
    return constC1 + constC2, C1, 2.0 * C2


def _kl_loss_const(C1: jnp.ndarray, C2: jnp.ndarray, p: jnp.ndarray, q: jnp.ndarray):
    """constC, hC1, hC2 for the KL GW loss (fgw/utils.py:4-45, kl branch)."""
    f1 = C1 * jnp.log(C1 + 1e-15) - C1
    constC1 = jnp.outer(f1 @ p, jnp.ones_like(q))
    constC2 = jnp.outer(jnp.ones_like(p), C2 @ q)
    return constC1 + constC2, C1, jnp.log(C2 + 1e-15)


def gw_grad(constC, hC1, hC2, T):
    """2 * (constC - hC1 @ T @ hC2^T): gradient of the GW term (fgw/utils.py:48-64)."""
    return 2.0 * (constC - hC1 @ T @ hC2.T)


@partial(
    jax.jit,
    static_argnames=(
        "alpha",
        "epsilon",
        "pgd_iters",
        "pgd_tol",
        "sinkhorn_iters",
        "sinkhorn_thr",
        "loss_fun",
        "symmetric",
        "solver",
        "return_diverged",
    ),
)
def fgw_coupling(
    M: jnp.ndarray,
    C1: jnp.ndarray,
    C2: jnp.ndarray,
    p: jnp.ndarray,
    q: jnp.ndarray,
    T0: jnp.ndarray | None = None,
    *,
    alpha: float = 0.5,
    epsilon: float = 0.1,
    pgd_iters: int = 5,
    pgd_tol: float = 1e-4,
    sinkhorn_iters: int = 5,
    sinkhorn_thr: float = 1e-2,
    loss_fun: str = "square_loss",
    symmetric: bool = True,
    solver: str = "PGD",
    return_diverged: bool = False,
) -> jnp.ndarray:
    """Solve one FGW coupling ``T`` between graphs ``(C1, p)`` and ``(C2, q)``.

    ``M`` is the (N1, N2) feature-distance cost; ``alpha`` trades structure
    against features as in the reference. ``T0`` warm-starts the plan
    (defaults to the independent coupling ``p q^T``).

    ``solver``: "PGD" (entropic projected gradient, the reference hot path)
    or "PPA" (proximal point: the gradient gets an extra ``-eps*log(T)``
    term, ``bregman.py:131-132``).

    ``return_diverged=True`` additionally returns a scalar bool: True if any
    inner Sinkhorn solve hit non-finite potentials and rolled back.
    """
    if solver not in ("PGD", "PPA"):
        raise ValueError(f"unknown solver {solver!r}; pick 'PGD' or 'PPA'")
    # OT iterations exponentiate their inputs — keep matmuls in true f32
    # even on TPU MXUs (tiny matrices; precision is effectively free).
    with jax.default_matmul_precision("highest"):
        if loss_fun == "square_loss":
            constC, hC1, hC2 = _square_loss_const(C1, C2, p, q)
        elif loss_fun == "kl_loss":
            constC, hC1, hC2 = _kl_loss_const(C1, C2, p, q)
        else:
            raise ValueError(f"unknown loss_fun {loss_fun!r}")
        if not symmetric:
            if loss_fun == "square_loss":
                constCt, hC1t, hC2t = _square_loss_const(C1.T, C2.T, p, q)
            else:
                constCt, hC1t, hC2t = _kl_loss_const(C1.T, C2.T, p, q)

        T = jnp.outer(p, q) if T0 is None else T0
        check = (jnp.arange(pgd_iters) % 10) == 0

        def step(carry, do_check):
            T, frozen, diverged = carry
            if symmetric:
                tens = alpha * gw_grad(constC, hC1, hC2, T) + (1.0 - alpha) * M
            else:
                tens = (alpha * 0.5) * (
                    gw_grad(constC, hC1, hC2, T) + gw_grad(constCt, hC1t, hC2t, T)
                ) + (1.0 - alpha) * M
            if solver == "PPA":
                tens = tens - epsilon * jnp.log(jnp.maximum(T, 1e-30))
            T_new, div = sinkhorn_log(
                p, q, tens, epsilon, num_iters=sinkhorn_iters, stop_thr=sinkhorn_thr,
                return_diverged=True,
            )
            # a non-finite plan (despite finite potentials, e.g. inf cost rows)
            # also counts as a numerical failure: keep the previous iterate
            bad = div | ~jnp.all(jnp.isfinite(T_new))
            err = jnp.linalg.norm(T_new - T)
            newly_frozen = (do_check & (err <= pgd_tol)) | bad
            T = jnp.where(frozen | bad, T, T_new)
            frozen = frozen | newly_frozen
            diverged = diverged | bad
            return (T, frozen, diverged), None

        (T, _, diverged), _ = jax.lax.scan(
            step, (T, jnp.bool_(False), jnp.bool_(False)), check
        )
        if return_diverged:
            return T, diverged
        return T
