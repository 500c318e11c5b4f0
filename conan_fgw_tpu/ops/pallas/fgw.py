"""Fused FGW coupling solver as a Pallas TPU kernel.

One grid instance solves one conformer's full entropic-PGD coupling
(``ops/fgw/coupling.py`` semantics: square loss, symmetric, PGD solver —
the reference hot path, ``bregman.py:70-167``): all ``pgd_iters`` gradient
steps and their inner log-domain Sinkhorn projections run unrolled in VMEM,
so the (N, N) iterates never round-trip to HBM between iterations and the
whole solve is a single fused kernel instead of ~10 small HLO ops per
Sinkhorn iteration inside nested ``lax.scan``s.

Gradients: the barycenter couplings are solved under ``stop_gradient``
(reference ``torch.no_grad`` at ``barycenter.py:120``), so the kernel is
forward-only by design — the caller (``ops/fgw/barycenter.py``) wraps it in
``jax.lax.stop_gradient``. Freeze/rollback semantics mirror the XLA solver:
early-freeze on the iteration-0 convergence check, roll back and freeze on
non-finite potentials/plans, and surface a per-solve divergence flag.

Mosaic portability: everything is kept 2D — marginals ride as ``(1, N)``
rows, potentials as ``(N, 1)``/``(1, N)``, scalar freeze flags as f32
``jnp.where`` selectors (no 1D bool outer products).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_LOG_EPS = 1e-30  # same normal-f32 log(0) guard as ops/fgw/sinkhorn.py


def _sinkhorn_unrolled(mr, logp_col, logq_row, q_row, num_iters, stop_thr):
    """Log-domain Sinkhorn, unrolled, with the XLA solver's freeze/rollback.

    ``mr`` is ``-cost/eps`` (N, N); ``logp_col`` (N, 1); ``logq_row``/
    ``q_row`` (1, N). Returns (T, diverged_scalar_f32).
    """
    n = mr.shape[0]
    u = jnp.zeros((n, 1), mr.dtype)
    v = jnp.zeros((1, n), mr.dtype)
    frozen = jnp.float32(0.0)
    diverged = jnp.float32(0.0)
    for it in range(num_iters):
        v_new = logq_row - _lse(mr + u, axis=0)  # (1, N)
        u_new = logp_col - _lse(mr + v_new, axis=1)  # (N, 1)
        finite = jnp.all(jnp.isfinite(u_new)) & jnp.all(jnp.isfinite(v_new))
        newly_diverged = jnp.where(
            (~finite) & (frozen < 0.5), jnp.float32(1.0), jnp.float32(0.0)
        )
        col = jnp.sum(jnp.exp(mr + u_new + v_new), axis=0, keepdims=True)  # (1, N)
        err = jnp.sqrt(jnp.sum((col - q_row) ** 2))
        do_check = 1.0 if it % 10 == 0 else 0.0  # reference check cadence
        newly_frozen = jnp.where(
            (do_check > 0.5) & (err < stop_thr), jnp.float32(1.0), newly_diverged
        )
        keep = jnp.maximum(frozen, newly_diverged)
        u = jnp.where(keep > 0.5, u, u_new)
        v = jnp.where(keep > 0.5, v, v_new)
        frozen = jnp.maximum(frozen, newly_frozen)
        diverged = jnp.maximum(diverged, newly_diverged)
    return jnp.exp(mr + u + v), diverged


def _lse(x, axis):
    m = jnp.max(x, axis=axis, keepdims=True)
    return m + jnp.log(jnp.sum(jnp.exp(x - m), axis=axis, keepdims=True))


def _coupling_kernel(M_ref, Cb_ref, Ck_ref, p_ref, q_ref, T0_ref, T_out, div_out,
                     *, alpha: float, epsilon: float, pgd_iters: int,
                     pgd_tol: float, sinkhorn_iters: int, sinkhorn_thr: float):
    M = M_ref[0]
    C1 = Cb_ref[0]
    C2 = Ck_ref[0]
    p_row = p_ref[0]  # (1, N)
    q_row = q_ref[0]  # (1, N)
    T = T0_ref[0]
    n = M.shape[0]

    # square-loss constants (fgw/utils.py:4-45): hC1 = C1, hC2 = 2*C2
    ones_row = jnp.ones((1, n), M.dtype)
    constC = (
        jnp.dot(C1 * C1, p_row.T, preferred_element_type=jnp.float32) @ ones_row
        + (jnp.dot(C2 * C2, q_row.T, preferred_element_type=jnp.float32) @ ones_row).T
    )
    hC2t = 2.0 * C2.T
    logp_col = jnp.log(jnp.maximum(p_row, _LOG_EPS)).T  # (N, 1)
    logq_row = jnp.log(jnp.maximum(q_row, _LOG_EPS))

    frozen = jnp.float32(0.0)
    diverged = jnp.float32(0.0)
    for it in range(pgd_iters):
        gw = 2.0 * (
            constC
            - jnp.dot(
                jnp.dot(C1, T, preferred_element_type=jnp.float32),
                hC2t,
                preferred_element_type=jnp.float32,
            )
        )
        tens = alpha * gw + (1.0 - alpha) * M
        T_new, div = _sinkhorn_unrolled(
            -tens / epsilon, logp_col, logq_row, q_row, sinkhorn_iters, sinkhorn_thr
        )
        bad = jnp.maximum(
            div, jnp.where(jnp.all(jnp.isfinite(T_new)), 0.0, 1.0)
        )
        err = jnp.sqrt(jnp.sum((T_new - T) ** 2))
        do_check = 1.0 if it % 10 == 0 else 0.0
        newly_frozen = jnp.maximum(
            jnp.where((do_check > 0.5) & (err <= pgd_tol), 1.0, 0.0), bad
        )
        T = jnp.where(jnp.maximum(frozen, bad) > 0.5, T, T_new)
        frozen = jnp.maximum(frozen, newly_frozen)
        diverged = jnp.maximum(diverged, bad)
    T_out[0] = T

    # divergence count accumulated across the sequential grid into a
    # lane-wide buffer: Mosaic requires output block tails divisible by
    # (8, 128) or equal to the array dims, so a (k, 1) per-instance flag is
    # unloweratable — a (1, 128) full-array accumulator is the portable form
    @pl.when(pl.program_id(0) == 0)
    def _init():
        div_out[...] = jnp.zeros_like(div_out)

    div_out[...] += jnp.full(div_out.shape, diverged, div_out.dtype)


def pallas_fgw_couplings(Ms, Cb, Cks, p, qs, T0s, *, alpha, epsilon, pgd_iters,
                         pgd_tol, sinkhorn_iters, sinkhorn_thr, interpret=None):
    """Solve K couplings of one barycenter step in one fused kernel.

    Args: ``Ms``/``Cks``/``T0s`` ``(K, N, N)``, ``Cb`` ``(N, N)`` (shared
    barycenter structure), ``p`` ``(N,)``, ``qs`` ``(K, N)``. Returns
    ``(T (K, N, N), diverged int32 scalar)`` — the *count* of the K solves
    that hit a Sinkhorn numerical failure. Forward-only (see module doc).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    k, n, _ = Ms.shape
    kern = functools.partial(
        _coupling_kernel, alpha=float(alpha), epsilon=float(epsilon),
        pgd_iters=int(pgd_iters), pgd_tol=float(pgd_tol),
        sinkhorn_iters=int(sinkhorn_iters), sinkhorn_thr=float(sinkhorn_thr),
    )
    T, div = pl.pallas_call(
        kern,
        grid=(k,),
        in_specs=[
            pl.BlockSpec((1, n, n), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, n, n), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, n, n), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, n), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, n, n), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, n, n), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 128), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k, n, n), Ms.dtype),
            jax.ShapeDtypeStruct((1, 128), jnp.float32),
        ],
        interpret=interpret,
    )(
        Ms, Cb[None], Cks, p[None, None, :], qs[:, None, :], T0s,
    )
    # div[0, 0] = number of the K solves that diverged (scalar count)
    return T, div[0, 0].astype(jnp.int32)
