"""Batched FGW barycenter of K conformer graphs, solved once for a whole batch.

The reference computes barycenters with a per-molecule Python loop
(``conan_fgw/src/model/graph_embeddings/schnet_no_sum.py:259-306``) calling
``fgw_barycenters`` (``conan_fgw/src/model/fgw/barycenter.py:7-225``) whose
hot-path configuration is hardcoded: outer=5, PGD=5, Sinkhorn=5 iterations,
``alpha=0.1``, ``epsilon=0.1``, warm-started couplings, ``init_C = Cs[0]``,
``init_Y = 0``. Here the same block-coordinate descent runs as a fixed-length
``lax.scan`` and is ``vmap``-ed over molecules — O(B·K) dense (N, N) matmul
batches on the MXU instead of O(B) serial CPU-bound Python.

Gradient semantics match the reference: couplings ``T`` are solved under
``stop_gradient`` (the ``torch.no_grad()`` at ``barycenter.py:120``); the
feature update ``Y = diag(1/p) * sum_s lambda_s T_s Y_s`` stays differentiable
w.r.t. the conformer features ``Y_s``.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from conan_fgw_tpu.ops.fgw.coupling import fgw_coupling


@dataclasses.dataclass(frozen=True)
class FGWConfig:
    """Solver hyper-parameters.

    Defaults replicate the reference's hardcoded training configuration
    (``schnet_no_sum.py:281-306``). Note the reference passes the *same*
    ``max_iter`` to both the outer barycenter loop and the inner PGD solve.
    """

    alpha: float = 0.1
    epsilon: float = 0.1
    outer_iters: int = 5
    outer_tol: float = 1e-2
    pgd_iters: int = 5
    pgd_tol: float = 1e-4
    sinkhorn_iters: int = 5
    sinkhorn_thr: float = 1e-2
    loss_fun: str = "square_loss"
    warmstart: bool = True
    fixed_structure: bool = False
    fixed_features: bool = False
    stop_grad_couplings: bool = True
    # fused Pallas coupling solver (ops/pallas/fgw.py): the whole PGD x
    # Sinkhorn solve runs unrolled in VMEM, R*G graphs per grid instance.
    # Forward-only, so it requires stop_grad_couplings (the reference's
    # torch.no_grad semantics) and the square-loss PGD hot path; other
    # configurations keep the XLA solver. None = auto: on for TPU (measured
    # 1.69x the XLA solver at the headline shape — BENCH pallas_fgw row),
    # off elsewhere (interpret mode on CPU is orders slower). Under a
    # GSPMD mesh the pallas_call runs replicated like the cfconv kernel;
    # set false to force the XLA solver on multi-chip runs if profiling
    # shows the replication hurts.
    use_pallas_coupling: bool | None = None

    def wants_pallas_coupling(self) -> bool:
        """Resolve the auto mode against the gating conditions."""
        if self.use_pallas_coupling is None:
            # auto: TPU only, and only at reference-scale solver budgets —
            # the unrolled kernel is chip-validated at 5/5/5; deep research
            # budgets (e.g. the 10x10 sweep arm) keep more VMEM live and
            # blow the per-instance envelope, so they keep the XLA solver
            # unless the kernel is forced with use_pallas_coupling=True
            want = (
                jax.default_backend() == "tpu"
                and self.pgd_iters * self.sinkhorn_iters <= 30
            )
        else:
            want = self.use_pallas_coupling
        return bool(
            want
            and self.loss_fun == "square_loss"
            and self.stop_grad_couplings
        )


def normalize_minmax(x: jnp.ndarray, a: float, b: float, eps: float = 0.0) -> jnp.ndarray:
    """Min-max rescale the whole tensor into [a, b] (barycenter.py:393-399)."""
    lo = jnp.min(x)
    hi = jnp.max(x)
    return a + (x - lo) * (b - a) / (hi - lo + eps)


def sqdist(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Pairwise squared euclidean distances (fgw/utils.py:141-171), clamped at 0."""
    d = (
        jnp.sum(x * x, axis=-1)[..., :, None]
        + jnp.sum(y * y, axis=-1)[..., None, :]
        - 2.0 * x @ y.swapaxes(-1, -2)
    )
    return jnp.maximum(d, 0.0)


@partial(jax.jit, static_argnames=("config", "return_diverged"))
def fgw_barycenter(
    Ys: jnp.ndarray,
    Cs: jnp.ndarray,
    ps: jnp.ndarray,
    p: jnp.ndarray,
    lambdas: jnp.ndarray,
    config: FGWConfig = FGWConfig(),
    init_C: jnp.ndarray | None = None,
    init_Y: jnp.ndarray | None = None,
    return_diverged: bool = False,
):
    """FGW barycenter of K graphs.

    Args:
      Ys: conformer node features ``(K, N, D)``.
      Cs: conformer structure matrices (dense adjacency) ``(K, N, N)``.
      ps: per-conformer marginals ``(K, N)``.
      p: barycenter marginal ``(N,)``.
      lambdas: barycenter weights ``(K,)``.
      init_C: initial barycenter structure; defaults to ``Cs[0]`` as in the
        reference hot path.
      init_Y: initial features; defaults to zeros.

    Returns:
      ``(Y, C)``: barycenter features ``(N, D)`` and structure ``(N, N)``.
      With ``return_diverged=True``, also the number of coupling solves that
      hit a Sinkhorn numerical failure and rolled back (reference
      ``sinkhorn.py:262-274`` divergence detection, surfaced for logging).
    """
    K, N, D = Ys.shape
    C = Cs[0] if init_C is None else init_C
    Y = jnp.zeros((N, D), Ys.dtype) if init_Y is None else init_Y
    T = jax.vmap(lambda q: jnp.outer(p, q))(ps)  # (K, N, N)
    Ms = sqdist(Y[None], Ys)  # (K, N, N)
    # zero-mass rows (masked-marginal mode excludes padding atoms entirely)
    # must not poison the updates: 1/0 -> inf and inf*0 -> nan otherwise
    has_mass = p > 0
    inv_p = jnp.where(has_mass, 1.0 / jnp.where(has_mass, p, 1.0), 0.0)
    ppt = jnp.outer(p, p)
    ppt_safe = jnp.where(ppt > 0, ppt, 1.0)

    if config.wants_pallas_coupling():
        from conan_fgw_tpu.ops.pallas.fgw import pallas_fgw_couplings

        def solve(Ms_, Cb_, Cks_, qs_, T0_):
            # forward-only kernel: explicitly stop-grad every input (the
            # stop_grad_couplings path never differentiates through the
            # solve anyway — identical semantics, no autodiff residuals)
            sg = jax.lax.stop_gradient
            return pallas_fgw_couplings(
                sg(Ms_), sg(Cb_), sg(Cks_), sg(p), sg(qs_), sg(T0_),
                alpha=config.alpha, epsilon=config.epsilon,
                pgd_iters=config.pgd_iters, pgd_tol=config.pgd_tol,
                sinkhorn_iters=config.sinkhorn_iters,
                sinkhorn_thr=config.sinkhorn_thr,
            )
    else:
        solve = jax.vmap(
            lambda M, Cb, Ck, q, T0: fgw_coupling(
                M,
                Cb,
                Ck,
                p,
                q,
                T0,
                alpha=config.alpha,
                epsilon=config.epsilon,
                pgd_iters=config.pgd_iters,
                pgd_tol=config.pgd_tol,
                sinkhorn_iters=config.sinkhorn_iters,
                sinkhorn_thr=config.sinkhorn_thr,
                loss_fun=config.loss_fun,
                symmetric=True,
                return_diverged=True,
            ),
            in_axes=(0, None, 0, 0, 0),
        )

    def outer_step(carry, _):
        Y, C, T, T_eff, Ms, frozen, n_div = carry
        T0 = T if config.warmstart else jax.vmap(lambda q: jnp.outer(p, q))(ps)
        T_new, div = solve(Ms, C, Cs_ng, ps, T0)
        n_div = n_div + jnp.sum(jnp.where(frozen, 0, div.astype(jnp.int32)))

        if config.fixed_features:
            Y_new, Ms_new = Y, Ms
        else:
            # Y = diag(1/p) * sum_s lambda_s T_s @ Ys_s   (fgw/utils.py:90-95)
            Y_new = inv_p[:, None] * jnp.einsum("k,knm,kmd->nd", lambdas, T_new, Ys_ng)
            Ms_new = sqdist(Y_new[None], Ys_ng)
        if config.fixed_structure:
            C_new = C
        else:
            if config.loss_fun == "square_loss":
                # C = sum_s lambda_s T_s C_s T_s^T / p p^T  (fgw/utils.py:67-73)
                C_new = jnp.where(
                    ppt > 0,
                    jnp.einsum("k,knm,kmj,klj->nl", lambdas, T_new, Cs_ng, T_new)
                    / ppt_safe,
                    0.0,
                )
            else:
                C_new = jnp.where(
                    ppt > 0,
                    jnp.exp(
                        jnp.einsum(
                            "k,knm,kmj,klj->nl",
                            lambdas,
                            T_new,
                            jnp.log(jnp.maximum(Cs_ng, 1e-15)),
                            T_new,
                        )
                        / ppt_safe
                    ),
                    0.0,
                )
        err_f = jnp.linalg.norm(Y_new - Y) if not config.fixed_features else 0.0
        err_s = jnp.linalg.norm(C_new - C) if not config.fixed_structure else 0.0
        newly_frozen = (err_f <= config.outer_tol) & (err_s <= config.outer_tol)
        Y = jnp.where(frozen, Y, Y_new)
        C = jnp.where(frozen, C, C_new)
        T = jnp.where(frozen, T, T_new)
        # the couplings behind the *last applied* Y update — the only place
        # gradients enter (reference: torch.no_grad around the solves means
        # dY_final/dYs = lambda_s diag(1/p) T_final alone)
        T_eff = jnp.where(frozen, T_eff, T_new)
        Ms = jnp.where(frozen, Ms, Ms_new)
        frozen = frozen | newly_frozen
        return (Y, C, T, T_eff, Ms, frozen, n_div), None

    n_div = jnp.int32(0)
    with jax.default_matmul_precision("highest"):
        if config.stop_grad_couplings:
            # run the entire solve without autodiff residuals, then re-apply
            # the final feature update differentiably w.r.t. Ys — identical
            # gradients to the reference at a fraction of the memory.
            Ys_ng = jax.lax.stop_gradient(Ys)
            Cs_ng = jax.lax.stop_gradient(Cs)
            (Y, C, _, T_eff, _, _, n_div), _ = jax.lax.scan(
                outer_step,
                (Y, C, T, T, Ms, jnp.bool_(False), n_div),
                None,
                length=config.outer_iters,
            )
            Y, C, T_eff = map(jax.lax.stop_gradient, (Y, C, T_eff))
            if not config.fixed_features:
                Y = inv_p[:, None] * jnp.einsum("k,knm,kmd->nd", lambdas, T_eff, Ys)
        else:
            Ys_ng, Cs_ng = Ys, Cs
            (Y, C, _, _, _, _, n_div), _ = jax.lax.scan(
                outer_step,
                (Y, C, T, T, Ms, jnp.bool_(False), n_div),
                None,
                length=config.outer_iters,
            )
    if return_diverged:
        return Y, C, n_div
    return Y, C


def _fgw_barycenter_batch_pallas(Ys, Cs, ps, p, lambdas, config, return_diverged):
    """Batched barycenter with the graph-tiled Pallas coupling kernel.

    Mathematically identical to ``vmap(fgw_barycenter)`` over molecules, but
    the outer block-coordinate scan runs once over the whole batch so each
    outer iteration issues a *single* tiled ``pallas_call`` covering all
    ``B*K`` coupling solves (``ops/pallas/fgw.py``: G graphs per grid
    instance as one block-diagonal MXU tile) instead of ``B*K`` sequential
    one-graph grid instances under vmap. Per-molecule outer freeze flags and
    the stop-grad re-application trick are preserved exactly.

    Only reachable for the gated Pallas configuration: ``square_loss`` +
    ``stop_grad_couplings`` (the reference ``torch.no_grad`` hot path,
    ``barycenter.py:120``).
    """
    from conan_fgw_tpu.ops.pallas.fgw import pallas_fgw_couplings_flat

    B, K, N, D = Ys.shape
    S = B * K
    sg = jax.lax.stop_gradient
    Ys_ng, Cs_ng, ps_ng, p_ng = sg(Ys), sg(Cs), sg(ps), sg(p)
    C = Cs[:, 0]
    Y = jnp.zeros((B, N, D), Ys.dtype)
    T = jnp.einsum("bn,bkm->bknm", p, ps)
    Ms = sqdist(Y[:, None], Ys)
    has_mass = p > 0
    inv_p = jnp.where(has_mass, 1.0 / jnp.where(has_mass, p, 1.0), 0.0)
    ppt = jnp.einsum("bn,bm->bnm", p, p)
    ppt_safe = jnp.where(ppt > 0, ppt, 1.0)
    flat = lambda x: x.reshape((S,) + x.shape[2:])

    def outer_step(carry, _):
        Y, C, T, T_eff, Ms, frozen, n_div = carry  # frozen: (B,) bool
        T0 = T if config.warmstart else jnp.einsum("bn,bkm->bknm", p_ng, ps_ng)
        T_flat, div_flags = pallas_fgw_couplings_flat(
            flat(sg(Ms)),
            flat(jnp.broadcast_to(sg(C)[:, None], (B, K, N, N))),
            flat(Cs_ng),
            flat(jnp.broadcast_to(p_ng[:, None], (B, K, N))),
            flat(ps_ng),
            flat(sg(T0)),
            alpha=config.alpha, epsilon=config.epsilon,
            pgd_iters=config.pgd_iters, pgd_tol=config.pgd_tol,
            sinkhorn_iters=config.sinkhorn_iters,
            sinkhorn_thr=config.sinkhorn_thr,
        )
        T_new = T_flat.reshape(B, K, N, N).astype(T.dtype)
        div_b = jnp.sum(div_flags.reshape(B, K), axis=1)
        n_div = n_div + jnp.sum(jnp.where(frozen, 0, div_b))

        if config.fixed_features:
            Y_new, Ms_new = Y, Ms
        else:
            Y_new = inv_p[:, :, None] * jnp.einsum(
                "bk,bknm,bkmd->bnd", lambdas, T_new, Ys_ng
            )
            Ms_new = sqdist(Y_new[:, None], Ys_ng)
        if config.fixed_structure:
            C_new = C
        else:
            C_new = jnp.where(
                ppt > 0,
                jnp.einsum("bk,bknm,bkmj,bklj->bnl", lambdas, T_new, Cs_ng, T_new)
                / ppt_safe,
                0.0,
            )
        zeros_b = jnp.zeros((B,), Ys.dtype)
        err_f = (
            jnp.sqrt(jnp.sum((Y_new - Y) ** 2, axis=(1, 2)))
            if not config.fixed_features
            else zeros_b
        )
        err_s = (
            jnp.sqrt(jnp.sum((C_new - C) ** 2, axis=(1, 2)))
            if not config.fixed_structure
            else zeros_b
        )
        newly_frozen = (err_f <= config.outer_tol) & (err_s <= config.outer_tol)
        m3 = frozen[:, None, None]
        m4 = frozen[:, None, None, None]
        Y = jnp.where(m3, Y, Y_new)
        C = jnp.where(m3, C, C_new)
        T = jnp.where(m4, T, T_new)
        T_eff = jnp.where(m4, T_eff, T_new)
        Ms = jnp.where(m4, Ms, Ms_new)
        frozen = frozen | newly_frozen
        return (Y, C, T, T_eff, Ms, frozen, n_div), None

    with jax.default_matmul_precision("highest"):
        (Y, C, _, T_eff, _, _, n_div), _ = jax.lax.scan(
            outer_step,
            (Y, C, T, T, Ms, jnp.zeros((B,), bool), jnp.int32(0)),
            None,
            length=config.outer_iters,
        )
    Y, C, T_eff = map(sg, (Y, C, T_eff))
    if not config.fixed_features:
        # re-apply the last feature update differentiably w.r.t. Ys — the
        # reference's torch.no_grad gradient semantics (barycenter.py:120)
        Y = inv_p[:, :, None] * jnp.einsum("bk,bknm,bkmd->bnd", lambdas, T_eff, Ys)
    if return_diverged:
        return Y, C, n_div
    return Y, C


def fgw_barycenter_batch(
    Ys: jnp.ndarray,
    Cs: jnp.ndarray,
    ps: jnp.ndarray | None = None,
    p: jnp.ndarray | None = None,
    lambdas: jnp.ndarray | None = None,
    config: FGWConfig = FGWConfig(),
    return_diverged: bool = False,
):
    """Barycenters for a whole batch: ``Ys (B, K, N, D)``, ``Cs (B, K, N, N)``.

    Replaces the reference's per-molecule Python loop with one vmapped solve.
    Marginals default to uniform over the padded node axis — deliberately
    identical to the reference, where padding rows of ``to_dense_batch``
    participate with zero adjacency (``schnet_no_sum.py:264-271``).

    With ``config.use_pallas_coupling`` (square-loss + stop-grad path), the
    batch runs through the graph-tiled kernel with all B*K solves flattened
    into one pallas grid per outer iteration.

    ``return_diverged=True`` appends the batch-total count of coupling solves
    that hit Sinkhorn numerical failures and rolled back.
    """
    B, K, N, _ = Ys.shape
    if ps is None:
        ps = jnp.full((B, K, N), 1.0 / N, Ys.dtype)
    if p is None:
        p = jnp.full((B, N), 1.0 / N, Ys.dtype)
    if lambdas is None:
        lambdas = jnp.full((B, K), 1.0 / K, Ys.dtype)
    if config.wants_pallas_coupling():
        out = _fgw_barycenter_batch_pallas(
            Ys, Cs, ps, p, lambdas, config, return_diverged
        )
        if return_diverged:
            Y, C, n_div = out
            return Y, C, jnp.sum(n_div)
        return out
    out = jax.vmap(
        lambda y, c, psb, pb, lb: fgw_barycenter(
            y, c, psb, pb, lb, config, return_diverged=return_diverged
        )
    )(Ys, Cs, ps, p, lambdas)
    if return_diverged:
        Y, C, n_div = out
        return Y, C, jnp.sum(n_div)
    return out
