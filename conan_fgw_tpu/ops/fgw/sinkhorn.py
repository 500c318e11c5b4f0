"""Log-domain Sinkhorn for entropic optimal transport, fixed-shape and scannable.

Mirrors the behaviour of the reference's ``sinkhorn_log``
(``conan_fgw/src/model/fgw/sinkhorn.py:318-450``) including its
"check the marginal violation every 10th iteration, stop early if below
``stop_thr``" policy — but as a fixed-trip-count ``lax.scan`` whose updates
are frozen (via ``jnp.where``) once a row has converged, so the whole batch
shares one compiled program and no data-dependent control flow reaches XLA.

Numerical-failure handling matches the reference's divergence detection
(``sinkhorn.py:262-274,434-438,646-652``): if an update produces non-finite
potentials, the solver *rolls back to the previous iterate* and freezes —
the jit-compatible analog of the reference's "Numerical errors at iteration
%d, resuming from last stable point" warning + break. The ``diverged`` flag
(``return_diverged=True``) propagates the event up to the FGW solvers so the
training loop can surface a divergence counter in its logs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# guard for log(0) on empty-mass marginals. Must be a *normal* float32:
# 1e-38 is subnormal (min normal ~1.18e-38) and XLA flushes subnormals to
# zero, turning the guard into log(0) = -inf — which the divergence detector
# then reads as a numerical failure on every masked-marginal solve.
_LOG_EPS = 1e-30


def sinkhorn_log(
    p: jnp.ndarray,
    q: jnp.ndarray,
    cost: jnp.ndarray,
    epsilon: float,
    *,
    num_iters: int = 5,
    stop_thr: float = 1e-2,
    check_every: int = 10,
    u0: jnp.ndarray | None = None,
    v0: jnp.ndarray | None = None,
    return_potentials: bool = False,
    return_diverged: bool = False,
):
    """Entropic OT plan ``T = exp((-cost/eps) + u ⊕ v)`` in the log domain.

    Args:
      p: source marginal ``(N,)``.
      q: target marginal ``(M,)``.
      cost: cost matrix ``(N, M)``.
      epsilon: entropic regularisation.
      num_iters: fixed iteration budget (reference hot path uses 5).
      stop_thr: marginal-violation threshold for the early-freeze.
      check_every: violation is evaluated on iterations ``i % check_every == 0``
        (after the update), matching the reference's cadence.
      u0/v0: optional warm-start log potentials.
      return_potentials: also return final ``(u, v)`` log potentials.
      return_diverged: also return a scalar bool — True if any iteration hit
        non-finite potentials and was rolled back (reference
        ``sinkhorn.py:434-438`` semantics).

    Returns:
      ``T`` of shape ``(N, M)`` (optionally ``(u, v)`` and/or ``diverged``).
    """
    n, m = cost.shape
    mr = -cost / epsilon
    logp = jnp.log(jnp.maximum(p, _LOG_EPS))
    logq = jnp.log(jnp.maximum(q, _LOG_EPS))
    u = jnp.zeros((n,), cost.dtype) if u0 is None else u0
    v = jnp.zeros((m,), cost.dtype) if v0 is None else v0

    check = (jnp.arange(num_iters) % check_every) == 0

    def step(carry, do_check):
        u, v, frozen, diverged = carry
        v_new = logq - jax.nn.logsumexp(mr + u[:, None], axis=0)
        u_new = logp - jax.nn.logsumexp(mr + v_new[None, :], axis=1)
        # divergence detection: non-finite potentials → roll back to the
        # previous iterate and stop updating (reference sinkhorn.py:262-274)
        finite = jnp.all(jnp.isfinite(u_new)) & jnp.all(jnp.isfinite(v_new))
        newly_diverged = ~finite & ~frozen
        # column marginal of the would-be plan vs q (reference sinkhorn.py:419-421)
        col = jnp.sum(jnp.exp(mr + u_new[:, None] + v_new[None, :]), axis=0)
        err = jnp.linalg.norm(col - q)
        newly_frozen = (do_check & (err < stop_thr)) | newly_diverged
        keep = frozen | newly_diverged
        u = jnp.where(keep, u, u_new)
        v = jnp.where(keep, v, v_new)
        frozen = frozen | newly_frozen
        diverged = diverged | newly_diverged
        return (u, v, frozen, diverged), None

    (u, v, _, diverged), _ = jax.lax.scan(
        step, (u, v, jnp.bool_(False), jnp.bool_(False)), check
    )
    T = jnp.exp(mr + u[:, None] + v[None, :])
    out = (T,)
    if return_potentials:
        out = out + ((u, v),)
    if return_diverged:
        out = out + (diverged,)
    return out if len(out) > 1 else T
