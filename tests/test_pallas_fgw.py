"""Fused Pallas FGW coupling solver vs the XLA solver (interpret mode on CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from conan_fgw_tpu.ops.fgw import FGWConfig
from conan_fgw_tpu.ops.fgw.barycenter import fgw_barycenter_batch
from conan_fgw_tpu.ops.fgw.coupling import fgw_coupling
from conan_fgw_tpu.ops.pallas.fgw import pallas_fgw_couplings


def _problem(k=4, n=16, d=3, seed=0):
    rng = np.random.default_rng(seed)
    Ys = rng.random((k, n, d)).astype(np.float32) + 0.1
    Cs = rng.random((k, n, n)).astype(np.float32)
    Cs = ((Cs + Cs.transpose(0, 2, 1)) > 1.2).astype(np.float32)  # sym 0/1 adj
    Y0 = rng.random((n, d)).astype(np.float32)
    Ms = np.stack(
        [
            ((Y0[:, None, :] - Ys[s][None, :, :]) ** 2).sum(-1)
            for s in range(k)
        ]
    ).astype(np.float32)
    p = np.full((n,), 1.0 / n, np.float32)
    qs = np.full((k, n), 1.0 / n, np.float32)
    T0 = np.einsum("i,kj->kij", p, qs).astype(np.float32)
    return map(jnp.asarray, (Ms, Cs[0], Cs, p, qs, T0))


KW = dict(alpha=0.1, epsilon=0.1, pgd_iters=5, pgd_tol=1e-4,
          sinkhorn_iters=5, sinkhorn_thr=1e-2)


def test_couplings_match_xla():
    Ms, Cb, Cs, p, qs, T0 = _problem()
    T_pallas, div = pallas_fgw_couplings(Ms, Cb, Cs, p, qs, T0, **KW)
    T_xla = jax.vmap(
        lambda M, Ck, q, t0: fgw_coupling(
            M, Cb, Ck, p, q, t0, loss_fun="square_loss", symmetric=True, **KW
        )
    )(Ms, Cs, qs, T0)
    assert int(div) == 0
    np.testing.assert_allclose(
        np.asarray(T_pallas), np.asarray(T_xla), atol=2e-5, rtol=1e-4
    )
    # plans satisfy the row marginal
    np.testing.assert_allclose(
        np.asarray(T_pallas.sum(-1)), np.asarray(qs * 0 + 1.0 / 16), atol=1e-3
    )


def test_barycenter_batch_pallas_matches_xla():
    """The full batched barycenter (vmapped over molecules) with the Pallas
    coupling path matches the XLA path — including under an outer vmap,
    which exercises pallas_call's batching rule."""
    rng = np.random.default_rng(3)
    B, K, N, D = 3, 4, 16, 5
    Ys = jnp.asarray(rng.random((B, K, N, D)), jnp.float32) + 0.1
    Cs = (rng.random((B, K, N, N)) > 0.6).astype(np.float32)
    Cs = jnp.asarray(np.maximum(Cs, Cs.transpose(0, 1, 3, 2)))

    cfg_xla = FGWConfig()
    cfg_pal = dataclasses.replace(cfg_xla, use_pallas_coupling=True)
    Yx, Cx = fgw_barycenter_batch(Ys, Cs, config=cfg_xla)
    Yp, Cp = fgw_barycenter_batch(Ys, Cs, config=cfg_pal)
    np.testing.assert_allclose(np.asarray(Yp), np.asarray(Yx), atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(Cp), np.asarray(Cx), atol=1e-4, rtol=1e-3)


def test_gradients_flow_and_match():
    """stop_grad_couplings semantics: gradients w.r.t. Ys flow through the
    final re-applied feature update only — identical for both solvers."""
    rng = np.random.default_rng(5)
    B, K, N, D = 2, 3, 8, 4
    Ys = jnp.asarray(rng.random((B, K, N, D)), jnp.float32) + 0.1
    Cs = (rng.random((B, K, N, N)) > 0.5).astype(np.float32)
    Cs = jnp.asarray(np.maximum(Cs, Cs.transpose(0, 1, 3, 2)))

    def loss(ys, cfg):
        Y, _ = fgw_barycenter_batch(ys, Cs, config=cfg)
        return jnp.sum(Y**2)

    g_xla = jax.grad(loss)(Ys, FGWConfig())
    g_pal = jax.grad(loss)(Ys, FGWConfig(use_pallas_coupling=True))
    assert np.isfinite(np.asarray(g_pal)).all()
    np.testing.assert_allclose(
        np.asarray(g_pal), np.asarray(g_xla), atol=1e-4, rtol=1e-3
    )


def test_couplings_match_xla_other_tile_shapes():
    """The protocol buckets hit N=64 (G=2 lane-graphs) and DimeNet N=96
    (G=1, wide==tall degenerate path) — parity at both tilings."""
    for n, s in ((64, 5), (96, 3)):
        rng = np.random.default_rng(n)
        Ms = jnp.asarray(rng.random((s, n, n)) * 2, jnp.float32)
        Cs = (rng.random((s, n, n)) > 0.7).astype(np.float32)
        Cs = jnp.asarray(np.maximum(Cs, Cs.transpose(0, 2, 1)))
        p = jnp.full((s, n), 1.0 / n, jnp.float32)
        T0 = jnp.einsum("si,sj->sij", p, p)
        from conan_fgw_tpu.ops.pallas.fgw import pallas_fgw_couplings_flat

        Tp, flags = pallas_fgw_couplings_flat(Ms, Cs, Cs, p, p, T0, **KW)
        Tx = jax.vmap(
            lambda M, c2, q, t0, c1: fgw_coupling(
                M, c1, c2, q, q, t0, loss_fun="square_loss", symmetric=True,
                **KW,
            )
        )(Ms, Cs, p, T0, Cs)
        assert int(flags.sum()) == 0
        np.testing.assert_allclose(
            np.asarray(Tp), np.asarray(Tx), atol=2e-5, rtol=1e-4
        )
