"""Alternative OT solvers: marginal feasibility + reference parity for BAPG."""

import numpy as np
import pytest
import jax.numpy as jnp

from conan_fgw_tpu.ops.fgw import variants


@pytest.fixture
def problem():
    rng = np.random.default_rng(0)
    cost = (rng.random((9, 9)) * 2).astype(np.float32)
    p = np.full((9,), 1.0 / 9, np.float32)
    q = np.full((9,), 1.0 / 9, np.float32)
    return p, q, cost


@pytest.mark.parametrize(
    "solver,kw,atol",
    [
        (variants.sinkhorn_knopp, {}, 2e-3),
        (variants.sinkhorn_stabilized, {}, 2e-3),
        # annealing converges slowly by design; looser tolerance
        (variants.sinkhorn_epsilon_scaling, {"num_iters": 400}, 5e-3),
        (variants.greenkhorn, {"num_iters": 3000}, 2e-3),
    ],
)
def test_marginals(problem, solver, kw, atol):
    p, q, cost = problem
    T = np.asarray(solver(p, q, cost, 0.1, **kw))
    np.testing.assert_allclose(T.sum(1), p, atol=atol)
    np.testing.assert_allclose(T.sum(0), q, atol=atol)


def test_knopp_matches_log(problem):
    from conan_fgw_tpu.ops.fgw import sinkhorn_log

    p, q, cost = problem
    a = np.asarray(variants.sinkhorn_knopp(p, q, cost, 0.1, num_iters=300))
    b = np.asarray(sinkhorn_log(p, q, cost, 0.1, num_iters=300, stop_thr=0.0))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_bapg_against_reference(reference_fgw):
    import torch
    from conan_fgw.src.model.fgw.barycenter import fused_ACC_torch

    rng = np.random.default_rng(1)
    N = 8
    M = rng.random((N, N)).astype(np.float32)
    A = (rng.random((N, N)) < 0.4).astype(np.float32)
    B = (rng.random((N, N)) < 0.4).astype(np.float32)
    p = np.full((N,), 1.0 / N, np.float32)
    ours = variants.fgw_coupling_bapg(
        jnp.asarray(M), jnp.asarray(A), jnp.asarray(B), jnp.asarray(p), jnp.asarray(p),
        alpha=0.3, rho=0.1, num_iters=40,
    )
    ref, _ = fused_ACC_torch(
        torch.tensor(M), torch.tensor(A), torch.tensor(B),
        torch.tensor(p), torch.tensor(p), alpha=0.3, epoch=40, eps=0.0, rho=0.1,
    )
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-4)


def test_bapg_barycenter_runs():
    rng = np.random.default_rng(2)
    K, N, D = 3, 8, 4
    Ys = rng.random((K, N, D)).astype(np.float32)
    Cs = (rng.random((K, N, N)) < 0.4).astype(np.float32)
    Cs = np.maximum(Cs, Cs.transpose(0, 2, 1))
    p = np.full((N,), 1.0 / N, np.float32)
    ps = np.full((K, N), 1.0 / N, np.float32)
    lam = np.full((K,), 1.0 / K, np.float32)
    Y, C = variants.fgw_barycenter_bapg(
        jnp.asarray(Ys), jnp.asarray(Cs), jnp.asarray(ps), jnp.asarray(p),
        jnp.asarray(lam), alpha=0.5, rho=1.0, outer_iters=3, coupling_iters=30,
    )
    assert np.isfinite(np.asarray(Y)).all() and np.isfinite(np.asarray(C)).all()
