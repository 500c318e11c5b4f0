"""Fused, graph-tiled FGW coupling solver as a Pallas TPU kernel.

Each grid instance solves a *super-tile* of ``R x G`` independent entropic-PGD
couplings (``ops/fgw/coupling.py`` semantics: square loss, symmetric, PGD —
the reference hot path, ``bregman.py:70-167``): ``G = 128 // N`` graphs side
by side along lanes ("wide" layout — lanes fully packed at 128) times ``R``
independent row-groups stacked along sublanes. Three hardware facts drive
this shape:

* The solve is **transcendental-bound** (exp/log in the Sinkhorn inner loop),
  so elementwise work must be laid out with zero padding waste — the wide
  layout gives every graph exactly its ``N*N`` elements of vector register
  footprint, same as XLA's batched layout.
* A single ``(N, G*N)`` tile is **latency-bound**: one Sinkhorn iteration is
  a chain of ~30 dependent vector ops on only ``N/8`` vregs, and grid
  instances execute sequentially, so small tiles leave the VPU idle between
  dependent ops. Stacking ``R`` independent row-groups per instance gives
  the scheduler ``R`` parallel chains to interleave — the same
  instruction-level parallelism XLA gets from batching 100+ graphs per
  fused op.
* The per-graph GW-gradient matmuls ``hC1 @ T @ hC2^T`` ride the MXU as
  block-diagonal ``(G*N, G*N)`` operands (assembled host-side), batched
  over the ``R`` row-groups with ``dot_general`` batch dimensions. The
  wide<->tall conversions of the iterate use iota-built one-hot selector
  matmuls, so no vector ever needs a lane-offset relayout (which Mosaic
  cannot lower in a concat).

Within a row-group, per-graph column LSE is a plain axis-1 reduction of the
``(R, N, G*N)`` view (columns never mix graphs); per-graph row LSE uses a
lane-segment sum via the ``STg`` selector matmul, stabilised by the global
row max (any upper bound of the per-block max yields the identical LSE
value). Per-graph semantics — convergence checks at the reference's
every-10th-iteration cadence (materialised ONLY on check iterations, the
loops being unrolled), early freeze, divergence rollback — are preserved
exactly via ``(R, G)`` per-graph flags.

All ``pgd_iters`` gradient steps and their inner log-domain Sinkhorn
projections run unrolled in VMEM; iterates never round-trip to HBM.

Gradients: the barycenter couplings are solved under ``stop_gradient``
(reference ``torch.no_grad`` at ``barycenter.py:120``), so the kernel is
forward-only by design — callers wrap it in ``jax.lax.stop_gradient``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_LOG_EPS = 1e-30  # same normal-f32 log(0) guard as ops/fgw/sinkhorn.py
_HI = jax.lax.Precision.HIGHEST  # OT iterations exponentiate their inputs:
# match the XLA solver's default_matmul_precision("highest") (coupling.py:95)


def _dot(a, b):
    return jnp.dot(a, b, precision=_HI, preferred_element_type=jnp.float32)


def _bdot(a, b):
    """Batched (R, i, k) @ (R, k, j) -> (R, i, j) on the MXU."""
    return jax.lax.dot_general(
        a, b, (((2,), (1,)), ((0,), (0,))),
        precision=_HI, preferred_element_type=jnp.float32,
    )


def _col_selector(n, G, g, dtype):
    """(G*N, N) one-hot: ``sel[i, j] = 1 iff i == g*n + j``.

    Extracting lane-block ``g`` from a wide matrix is ``X @ sel`` — the
    one-hot matmul lands the block at lane offset 0, so Mosaic never has to
    relayout a lane-offset vector.
    """
    return (
        jax.lax.broadcasted_iota(jnp.int32, (G * n, n), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (G * n, n), 1) + g * n
    ).astype(dtype)


def _row_selector(n, G, g, dtype):
    """(N, G*N) one-hot placing an (N, N) block into lane segment ``g``."""
    return (
        jax.lax.broadcasted_iota(jnp.int32, (n, G * n), 0) + g * n
        == jax.lax.broadcasted_iota(jnp.int32, (n, G * n), 1)
    ).astype(dtype)


def _wide_to_tall3(x3, n, G):
    """(R, N, G*N) wide -> (R, G*N, N) tall per row-group.

    Lane blocks are extracted via one-hot matmuls (each lands at lane
    offset 0) and concatenated along sublanes — the one concat direction
    Mosaic lowers without an offset relayout.
    """
    if G == 1:
        return x3
    R = x3.shape[0]
    pieces = [
        jax.lax.dot_general(
            x3, _col_selector(n, G, g, x3.dtype), (((2,), (0,)), ((), ())),
            precision=_HI, preferred_element_type=jnp.float32,
        )
        for g in range(G)
    ]  # each (R, N, N)
    return jnp.concatenate(pieces, axis=1)


def _tall_to_wide3(x3, n, G):
    """(R, G*N, N) tall -> (R, N, G*N) wide per row-group.

    Sublane slices at 8-aligned offsets are whole-vreg selections (free);
    lane placement happens through a one-hot matmul.
    """
    if G == 1:
        return x3
    out = None
    for g in range(G):
        piece = jax.lax.dot_general(
            x3[:, g * n:(g + 1) * n, :], _row_selector(n, G, g, x3.dtype),
            (((2,), (0,)), ((), ())),
            precision=_HI, preferred_element_type=jnp.float32,
        )
        out = piece if out is None else out + piece
    return out


def _sinkhorn_super(mr, logp, logq, q, Sg, STg, R, n, G, num_iters, stop_thr):
    """Log-domain Sinkhorn on an (R*N, G*N) super-tile, per-graph rollback.

    ``mr`` is ``-cost/eps`` (R*N, GN); ``logp`` (R*N, G); ``logq``/``q``
    (R, GN). Returns ``(T (R*N, GN), diverged (R, G))``.
    """
    gn = G * n
    f32 = jnp.float32
    u = jnp.zeros((R * n, G), f32)
    v = jnp.zeros((R, gn), f32)
    frozen = jnp.zeros((R, G), f32)
    diverged = jnp.zeros((R, G), f32)
    g3 = lambda x: x.reshape(R, n, gn)  # leading-dim split: relayout-free
    for it in range(num_iters):
        # v-update: per-graph column LSE == plain axis-1 LSE of the 3D view
        A3 = g3(mr + _dot(u, Sg))
        mA = jnp.max(A3, axis=1)  # (R, GN)
        v_new = logq - (
            mA + jnp.log(jnp.sum(jnp.exp(A3 - mA[:, None, :]), axis=1))
        )  # (R, GN)
        # u-update: per-graph row LSE via lane-segment sums, stabilised by
        # the global row max (an upper bound of every per-block max, so the
        # LSE value is identical up to fp rounding)
        Bm = mr + jnp.broadcast_to(v_new[:, None, :], (R, n, gn)).reshape(
            R * n, gn
        )
        mB = jnp.max(Bm, axis=1, keepdims=True)  # (R*N, 1)
        s = _dot(jnp.exp(Bm - mB), STg)  # (R*N, G) per-graph row sums
        u_new = logp - (mB + jnp.log(jnp.maximum(s, _LOG_EPS)))
        nf_u = jnp.max(
            jnp.where(jnp.isfinite(u_new), 0.0, 1.0).reshape(R, n, G), axis=1
        )  # (R, G)
        nf_v = _dot(jnp.where(jnp.isfinite(v_new), 0.0, 1.0), STg)  # (R, G)
        newly_diverged = jnp.where(
            (nf_u + nf_v > 0.5) & (frozen < 0.5), 1.0, 0.0
        )
        if it % 10 == 0:  # reference check cadence; the loop is unrolled, so
            # the marginal-error exp (a full super-tile transcendental pass)
            # is only materialised on check iterations
            col = jnp.sum(
                jnp.exp(
                    g3(mr + _dot(u_new, Sg))
                    + v_new[:, None, :]
                ),
                axis=1,
            )  # (R, GN)
            err_g = jnp.sqrt(_dot((col - q) ** 2, STg))  # (R, G)
            newly_frozen = jnp.where(err_g < stop_thr, 1.0, newly_diverged)
        else:
            newly_frozen = newly_diverged
        keep_g = jnp.maximum(frozen, newly_diverged)  # (R, G)
        u = jnp.where(
            keep_g[:, None, :] > 0.5, u.reshape(R, n, G), u_new.reshape(R, n, G)
        ).reshape(R * n, G)
        v = jnp.where(_dot(keep_g, Sg) > 0.5, v, v_new)
        frozen = jnp.maximum(frozen, newly_frozen)
        diverged = jnp.maximum(diverged, newly_diverged)
    T = jnp.exp(
        g3(mr + _dot(u, Sg)) + v[:, None, :]
    ).reshape(R * n, gn)
    return T, diverged


def _super_kernel(constC_ref, C1bd_ref, hC2Tbd_ref, M_ref, p_ref, q_ref,
                  T0_ref, T_out, div_out, *, alpha: float, epsilon: float,
                  pgd_iters: int, pgd_tol: float, sinkhorn_iters: int,
                  sinkhorn_thr: float, n: int, G: int, R: int, R8: int):
    gn = G * n
    f32 = jnp.float32
    constC = constC_ref[0]  # (R*N, GN) wide
    C1bd = C1bd_ref[0].reshape(R, gn, gn)  # per-group block-diagonal
    hC2Tbd = hC2Tbd_ref[0].reshape(R, gn, gn)
    M = M_ref[0]  # (R*N, GN) wide
    logp = jnp.log(jnp.maximum(p_ref[0], _LOG_EPS))  # (R*N, G)
    q = q_ref[0]  # (R, GN)
    logq = jnp.log(jnp.maximum(q, _LOG_EPS))
    T = T0_ref[0]  # (R*N, GN) wide

    # per-graph lane-segment selectors, built from 2D iotas (Mosaic-portable)
    Sg = (
        jax.lax.broadcasted_iota(jnp.int32, (G, gn), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (G, gn), 1) // n
    ).astype(f32)
    STg = (
        jax.lax.broadcasted_iota(jnp.int32, (gn, G), 0) // n
        == jax.lax.broadcasted_iota(jnp.int32, (gn, G), 1)
    ).astype(f32)

    frozen = jnp.zeros((R, G), f32)
    diverged = jnp.zeros((R, G), f32)
    g3 = lambda x: x.reshape(R, n, gn)
    for it in range(pgd_iters):
        # square-loss GW gradient 2*(constC - hC1 @ T @ hC2^T): per-graph
        # left-multiply = BD @ tall, per-graph right-multiply = wide @ BD,
        # batched over the R row-groups on the MXU
        V3 = _bdot(C1bd, _wide_to_tall3(g3(T), n, G))  # (R, GN, N)
        H3 = _bdot(_tall_to_wide3(V3, n, G), hC2Tbd)  # (R, N, GN)
        H = H3.reshape(R * n, gn)
        tens = (2.0 * alpha) * (constC - H) + (1.0 - alpha) * M
        mr = -tens / epsilon
        T_new, div_g = _sinkhorn_super(
            mr, logp, logq, q, Sg, STg, R, n, G, sinkhorn_iters, sinkhorn_thr
        )
        # a non-finite plan also counts as a numerical failure per graph
        nf = jnp.sum(
            jnp.where(jnp.isfinite(T_new), 0.0, 1.0).reshape(R, n, gn), axis=1
        )  # (R, GN)
        bad_g = jnp.minimum(jnp.maximum(div_g, _dot(nf, STg)), 1.0)  # (R, G)
        if it % 10 == 0:  # reference check cadence (unrolled: skip the
            # update-error reduction entirely on non-check iterations)
            d2 = jnp.sum(((T_new - T) ** 2).reshape(R, n, gn), axis=1)
            err_g = jnp.sqrt(_dot(d2, STg))  # (R, G)
            newly_frozen = jnp.maximum(
                jnp.where(err_g <= pgd_tol, 1.0, 0.0), bad_g
            )
        else:
            newly_frozen = bad_g
        keep = _dot(jnp.maximum(frozen, bad_g), Sg)  # (R, GN)
        T = jnp.where(
            keep[:, None, :] > 0.5, g3(T), g3(T_new)
        ).reshape(R * n, gn)
        frozen = jnp.maximum(frozen, newly_frozen)
        diverged = jnp.maximum(diverged, bad_g)
    T_out[0] = T

    # per-graph diverged flags: row r of the (R8, 128) block carries row-group
    # r's G flags in its first G lanes, via an iota-built one-hot placement
    lane_sel = (
        jax.lax.broadcasted_iota(jnp.int32, (G, 128), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (G, 128), 1)
    ).astype(f32)
    flags = _dot(diverged, lane_sel)  # (R, 128)
    if R8 != R:
        flags = jnp.concatenate(
            [flags, jnp.zeros((R8 - R, 128), f32)], axis=0
        )
    div_out[0] = flags


def pallas_fgw_couplings_flat(Ms, C1s, C2s, ps, qs, T0s, *, alpha, epsilon,
                              pgd_iters, pgd_tol, sinkhorn_iters, sinkhorn_thr,
                              interpret=None, tile_graphs=None,
                              tile_rows=None):
    """Solve ``S`` independent FGW couplings, ``R*G`` per grid instance.

    Args: ``Ms``/``C1s``/``C2s``/``T0s`` ``(S, N, N)``, ``ps``/``qs``
    ``(S, N)`` — one row per solve (the caller flattens batch x conformer).
    Returns ``(T (S, N, N) f32, diverged (S,) int32 per-solve flags)``.
    Forward-only (see module doc). Inputs are upcast to f32: the solve
    exponentiates its inputs, matching the XLA path's
    ``default_matmul_precision("highest")`` (coupling.py:93-95).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    S, n, _ = Ms.shape
    if tile_graphs is not None:
        G = int(tile_graphs)
    else:
        G = max(1, min(128 // n if n <= 128 else 1, 16))
    # ~32 solves per instance: enough independent Sinkhorn chains to hide
    # VPU latency, small enough to keep VMEM and program size bounded
    if tile_rows is not None:
        R = int(tile_rows)
    else:
        R = max(1, min(32 // G, -(-S // G)))
        # VMEM budget: per row-group the instance holds 2 block-diagonal
        # (GN, GN) operands + ~6 live (N, GN) wides, double-buffered across
        # the grid — R=16 at N=64 buckets overflowed the v5e's VMEM when
        # compiled alongside the cfconv kernel (protocol r5 OOM), R=8 is the
        # chip-validated envelope. Deep solver budgets (large unrolls) keep
        # more temporaries live; halve again.
        R = min(R, 8)
        if pgd_iters * sinkhorn_iters > 30:
            R = max(1, R // 2)
    per_inst = R * G
    f32 = jnp.float32
    Ms, C1s, C2s, T0s, ps, qs = (
        x.astype(f32) for x in (Ms, C1s, C2s, T0s, ps, qs)
    )

    # pad the solve list to a multiple of R*G by wrapping (real, well-posed
    # problems — their outputs are dropped below)
    n_inst = -(-S // per_inst)
    Sp = n_inst * per_inst
    if Sp != S:
        idx = jnp.arange(Sp) % S
        Ms, C1s, C2s, T0s, ps, qs = (
            x[idx] for x in (Ms, C1s, C2s, T0s, ps, qs)
        )

    # host-side (XLA) prep: constC is constant across the solve, so compute
    # it per solve and ship it wide; pre-assemble the block-diagonal matmul
    # operands and pre-transpose hC2 so the kernel never transposes
    c1p = jnp.einsum("sij,sj->si", C1s * C1s, ps, precision=_HI)
    c2q = jnp.einsum("sij,sj->si", C2s * C2s, qs, precision=_HI)
    constC = c1p[:, :, None] + c2q[:, None, :]  # (Sp, n, n)
    hC2T = 2.0 * C2s.transpose(0, 2, 1)

    gn = G * n

    def to_wide(x):  # (Sp, n, n) -> (n_inst, R*n, GN)
        return (
            x.reshape(n_inst, R, G, n, n)
            .transpose(0, 1, 3, 2, 4)
            .reshape(n_inst, R * n, gn)
        )

    def to_bd(x):  # (Sp, n, n) -> (n_inst, R*GN, GN) block-diag per group
        x5 = x.reshape(n_inst * R, G, n, n)
        eye = jnp.eye(G, dtype=x.dtype)
        bd = jnp.einsum("tgij,gh->tgihj", x5, eye).reshape(
            n_inst * R, gn, gn
        )
        return bd.reshape(n_inst, R * gn, gn)

    constC_w, M_w, T0_w = map(to_wide, (constC, Ms, T0s))
    C1_bd, hC2T_bd = map(to_bd, (C1s, hC2T))
    p_in = (
        ps.reshape(n_inst, R, G, n).transpose(0, 1, 3, 2).reshape(
            n_inst, R * n, G
        )
    )
    q_in = qs.reshape(n_inst, R, gn)

    R8 = -(-R // 8) * 8
    kern = functools.partial(
        _super_kernel, alpha=float(alpha), epsilon=float(epsilon),
        pgd_iters=int(pgd_iters), pgd_tol=float(pgd_tol),
        sinkhorn_iters=int(sinkhorn_iters), sinkhorn_thr=float(sinkhorn_thr),
        n=n, G=G, R=R, R8=R8,
    )
    spec = lambda a, b: pl.BlockSpec((1, a, b), lambda i: (i, 0, 0))
    T_w, div = pl.pallas_call(
        kern,
        grid=(n_inst,),
        in_specs=[
            spec(R * n, gn),   # constC
            spec(R * gn, gn),  # BD(C1)
            spec(R * gn, gn),  # BD(2*C2^T)
            spec(R * n, gn),   # M
            spec(R * n, G),    # p
            spec(R, gn),       # q
            spec(R * n, gn),   # T0
        ],
        out_specs=[
            spec(R * n, gn),
            spec(R8, 128),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_inst, R * n, gn), f32),
            jax.ShapeDtypeStruct((n_inst, R8, 128), f32),
        ],
        interpret=interpret,
    )(constC_w, C1_bd, hC2T_bd, M_w, p_in, q_in, T0_w)

    T = (
        T_w.reshape(n_inst, R, n, G, n)
        .transpose(0, 1, 3, 2, 4)
        .reshape(Sp, n, n)[:S]
    )
    flags = div[:, :R, :G].reshape(Sp)[:S]
    return T, (flags > 0.5).astype(jnp.int32)


def pallas_fgw_couplings(Ms, Cb, Cks, p, qs, T0s, *, alpha, epsilon, pgd_iters,
                         pgd_tol, sinkhorn_iters, sinkhorn_thr, interpret=None):
    """Solve the K couplings of one barycenter step (one molecule).

    Args: ``Ms``/``Cks``/``T0s`` ``(K, N, N)``, ``Cb`` ``(N, N)`` (shared
    barycenter structure), ``p`` ``(N,)``, ``qs`` ``(K, N)``. Returns
    ``(T (K, N, N), diverged int32 scalar)`` — the *count* of the K solves
    that hit a Sinkhorn numerical failure. Thin wrapper over the tiled flat
    solver; kept for the unbatched ``fgw_barycenter`` path and tests. The
    batched training path (``fgw_barycenter_batch``) flattens all B*K solves
    into one call instead.
    """
    K = Ms.shape[0]
    C1s = jnp.broadcast_to(Cb[None], Cks.shape)
    ps = jnp.broadcast_to(p[None], qs.shape)
    T, flags = pallas_fgw_couplings_flat(
        Ms, C1s, Cks, ps, qs, T0s, alpha=alpha, epsilon=epsilon,
        pgd_iters=pgd_iters, pgd_tol=pgd_tol, sinkhorn_iters=sinkhorn_iters,
        sinkhorn_thr=sinkhorn_thr, interpret=interpret,
    )
    return T, jnp.sum(flags)
