"""Alternative OT/FGW solvers from the reference inventory.

* ``sinkhorn_knopp`` — kernel-space scaling (``fgw/sinkhorn.py:207-315``)
* ``sinkhorn_stabilized`` — log-stabilised with tau-absorption
  (``fgw/sinkhorn.py:535-685``), fixed-iteration batched form
* ``sinkhorn_epsilon_scaling`` — outer epsilon annealing
  (``fgw/sinkhorn.py:688-786``)
* ``greenkhorn`` — greedy coordinate updates (``fgw/sinkhorn.py:453-532``)
* ``fgw_coupling_bapg`` / ``fgw_barycenter_bapg`` — Bregman alternating
  projected gradient (``fgw/bregman.py:170-279``, ``barycenter.py:228-390``,
  after FGWMixup)

All are fixed-shape and scannable; the hot path uses ``sinkhorn_log`` (see
``sinkhorn.py``) exactly like the reference, so these exist for API parity
and experimentation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from conan_fgw_tpu.ops.fgw.coupling import _square_loss_const


def sinkhorn_knopp(p, q, cost, epsilon, *, num_iters=100, stop_thr=1e-9):
    """Classic kernel-space Sinkhorn scaling (batch-friendly)."""
    k = jnp.exp(-cost / epsilon)
    u = jnp.ones_like(p) / p.shape[-1]
    v = jnp.ones_like(q) / q.shape[-1]

    def step(carry, _):
        u, v, frozen = carry
        kt_u = k.T @ u
        v_new = q / jnp.maximum(kt_u, 1e-38)
        u_new = p / jnp.maximum(k @ v_new, 1e-38)
        err = jnp.linalg.norm((u_new * (k @ v_new)) - p)
        u = jnp.where(frozen, u, u_new)
        v = jnp.where(frozen, v, v_new)
        return (u, v, frozen | (err < stop_thr)), None

    (u, v, _), _ = jax.lax.scan(step, (u, v, jnp.bool_(False)), None, length=num_iters)
    return u[:, None] * k * v[None, :]


def sinkhorn_stabilized(p, q, cost, epsilon, *, num_iters=100, tau=1e3, stop_thr=1e-9):
    """Sinkhorn with log-domain absorption when scalings exceed ``tau``."""
    alpha = jnp.zeros_like(p)
    beta = jnp.zeros_like(q)
    u = jnp.ones_like(p) / p.shape[-1]
    v = jnp.ones_like(q) / q.shape[-1]

    def kernel(alpha, beta):
        return jnp.exp(-(cost - alpha[:, None] - beta[None, :]) / epsilon)

    def step(carry, _):
        alpha, beta, u, v = carry
        k = kernel(alpha, beta)
        v_new = q / jnp.maximum(k.T @ u, 1e-300)
        u_new = p / jnp.maximum(k @ v_new, 1e-300)
        absorb = (jnp.max(jnp.abs(u_new)) > tau) | (jnp.max(jnp.abs(v_new)) > tau)
        alpha = jnp.where(absorb, alpha + epsilon * jnp.log(jnp.maximum(u_new, 1e-300)), alpha)
        beta = jnp.where(absorb, beta + epsilon * jnp.log(jnp.maximum(v_new, 1e-300)), beta)
        u_new = jnp.where(absorb, jnp.ones_like(u_new), u_new)
        v_new = jnp.where(absorb, jnp.ones_like(v_new), v_new)
        return (alpha, beta, u_new, v_new), None

    (alpha, beta, u, v), _ = jax.lax.scan(
        step, (alpha, beta, u, v), None, length=num_iters
    )
    return u[:, None] * kernel(alpha, beta) * v[None, :]


def sinkhorn_epsilon_scaling(
    p, q, cost, epsilon, *, num_iters=100, num_outer=10, eps0=1e1
):
    """Anneal epsilon geometrically toward the target, warm-starting scalings."""
    from conan_fgw_tpu.ops.fgw.sinkhorn import sinkhorn_log

    u = jnp.zeros_like(p)
    v = jnp.zeros_like(q)
    for it in range(num_outer):
        eps_it = max(float(epsilon), float(eps0 * (epsilon / eps0) ** ((it + 1) / num_outer)))
        _, (u, v) = sinkhorn_log(
            p, q, cost, eps_it, num_iters=num_iters // num_outer + 1,
            u0=u, v0=v, return_potentials=True,
        )
    # polish at the target epsilon from the annealed warm start
    T, _ = sinkhorn_log(
        p, q, cost, epsilon, num_iters=num_iters, u0=u, v0=v, return_potentials=True
    )
    return T


def greenkhorn(p, q, cost, epsilon, *, num_iters=1000):
    """Greedy coordinate Sinkhorn: each step rescales the single worst row or
    column (sequential by nature — expressed as a fori_loop over argmax picks)."""
    p, q, cost = jnp.asarray(p), jnp.asarray(q), jnp.asarray(cost)
    k = jnp.exp(-cost / epsilon)
    u = jnp.full_like(p, 1.0 / p.shape[-1])
    v = jnp.full_like(q, 1.0 / q.shape[-1])

    def body(_, uv):
        u, v = uv
        T = u[:, None] * k * v[None, :]
        row_gain = jnp.abs(T.sum(1) - p)
        col_gain = jnp.abs(T.sum(0) - q)
        i = jnp.argmax(row_gain)
        j = jnp.argmax(col_gain)
        do_row = row_gain[i] >= col_gain[j]
        u_new = u.at[i].set(p[i] / jnp.maximum((k @ v)[i], 1e-38))
        v_new = v.at[j].set(q[j] / jnp.maximum((k.T @ u)[j], 1e-38))
        return jnp.where(do_row, u_new, u), jnp.where(do_row, v, v_new)

    u, v = jax.lax.fori_loop(0, num_iters, body, (u, v))
    return u[:, None] * k * v[None, :]


@partial(jax.jit, static_argnames=("alpha", "rho", "num_iters"))
def fgw_coupling_bapg(M, C1, C2, p, q, T0=None, *, alpha=0.5, rho=0.1, num_iters=100):
    """Bregman alternating projected gradient coupling (``fused_ACC_torch``,
    barycenter.py:228-256): exponentiated-gradient row/column updates."""
    T = jnp.outer(p, q) if T0 is None else T0

    def step(T, _):
        T = T + 1e-10
        grad = 4.0 * alpha * C1 @ T @ C2 - (1.0 - alpha) * M
        T = jnp.exp(grad / rho) * T
        T = T * (p / jnp.maximum(T.sum(1), 1e-38))[:, None]
        grad = 4.0 * alpha * C1 @ T @ C2 - (1.0 - alpha) * M
        T = jnp.exp(grad / rho) * T
        T = T * (q / jnp.maximum(T.sum(0), 1e-38))[None, :]
        return T, None

    T, _ = jax.lax.scan(step, T, None, length=num_iters)
    return T


def fgw_coupling_bregman(
    M, C1, C2, p, q, T0=None, *, alpha=0.5, epsilon=0.1, num_iters=100,
    marginal_loss=False,
):
    """Direct Bregman row/column multiplicative updates (``fgw_bregman``,
    bregman.py:170-279)."""
    constC, hC1, hC2 = _square_loss_const(C1, C2, p, q)
    T = jnp.outer(p, q) if T0 is None else T0

    def df(T):
        if marginal_loss:
            return alpha * 2.0 * (constC - hC1 @ T @ hC2.T) + (1 - alpha) * M
        return 2.0 * alpha * (-(hC1 @ T @ hC2.T)) + (1 - alpha) * M

    def step(T, _):
        T = T * jnp.exp(-df(T) / epsilon)
        T = (p / jnp.maximum(T.sum(1), 1e-38))[:, None] * T
        T = T * jnp.exp(-df(T) / epsilon)
        T = T * (q / jnp.maximum(T.sum(0), 1e-38))[None, :]
        return T, None

    T, _ = jax.lax.scan(step, T, None, length=num_iters)
    return T


def fgw_barycenter_bapg(
    Ys, Cs, ps, p, lambdas, *, alpha=0.5, rho=1.0, outer_iters=5,
    coupling_iters=100, init_C=None,
):
    """BAPG barycenter (barycenter.py:259-390): same block-coordinate descent
    as the main solver with the BAPG coupling inside."""
    from conan_fgw_tpu.ops.fgw.barycenter import sqdist

    K, N, D = Ys.shape
    C = Cs[0] if init_C is None else init_C
    Y = jnp.zeros((N, D), Ys.dtype)
    inv_p = 1.0 / p
    ppt = jnp.outer(p, p)

    def outer_step(carry, _):
        Y, C = carry
        Ms = sqdist(Y[None], Ys)
        T = jax.lax.stop_gradient(
            jax.vmap(
                lambda M, Ck, q: fgw_coupling_bapg(
                    M, C, Ck, p, q, alpha=alpha, rho=rho, num_iters=coupling_iters
                )
            )(Ms, Cs, ps)
        )
        Y = inv_p[:, None] * jnp.einsum("k,knm,kmd->nd", lambdas, T, Ys)
        C = jnp.einsum("k,knm,kmj,klj->nl", lambdas, T, Cs, T) / ppt
        return (Y, C), None

    (Y, C), _ = jax.lax.scan(outer_step, (Y, C), None, length=outer_iters)
    return Y, C
