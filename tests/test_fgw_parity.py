"""Numerical parity of the batched JAX FGW stack against the reference solver.

The reference solver (pure torch, ``conan_fgw/src/model/fgw/``) is imported
read-only from ``/root/reference`` as a golden oracle and compared against the
TPU-native batched implementation on identical random inputs and on the
repo's captured real-solver fixture ``notebooks/data/cfm_log.pt``
(K=10 conformer graphs, N=22 nodes, d=3).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from conan_fgw_tpu.ops.fgw import (
    FGWConfig,
    fgw_barycenter,
    fgw_barycenter_batch,
    fgw_coupling,
    sinkhorn_log,
)

CFM_FIXTURE = "/root/reference/notebooks/data/cfm_log.pt"


def _rand_problem(rng, K=4, N=10, D=3):
    Ys = rng.standard_normal((K, N, D)).astype(np.float32) * 0.5 + 1.0
    Cs = (rng.random((K, N, N)) < 0.3).astype(np.float32)
    Cs = np.maximum(Cs, Cs.transpose(0, 2, 1))  # symmetric adjacency
    for k in range(K):
        np.fill_diagonal(Cs[k], 0.0)
    ps = np.full((K, N), 1.0 / N, np.float32)
    p = np.full((N,), 1.0 / N, np.float32)
    lam = np.full((K,), 1.0 / K, np.float32)
    return Ys, Cs, ps, p, lam


class TestSinkhorn:
    def test_marginals(self):
        rng = np.random.default_rng(0)
        cost = rng.random((8, 12)).astype(np.float32)
        p = np.full((8,), 1.0 / 8, np.float32)
        q = np.full((12,), 1.0 / 12, np.float32)
        T = sinkhorn_log(p, q, cost, 0.1, num_iters=200, stop_thr=1e-9)
        np.testing.assert_allclose(np.asarray(T).sum(axis=1), p, atol=1e-5)
        np.testing.assert_allclose(np.asarray(T).sum(axis=0), q, atol=1e-5)

    def test_against_reference(self, reference_fgw):
        import torch
        from conan_fgw.src.model.fgw.sinkhorn import sinkhorn_log as ref_sinkhorn

        rng = np.random.default_rng(1)
        cost = rng.random((7, 9)).astype(np.float32) * 3.0
        p = np.full((7,), 1.0 / 7, np.float32)
        q = np.full((9,), 1.0 / 9, np.float32)
        for iters in (5, 37):
            ours = sinkhorn_log(p, q, cost, 0.1, num_iters=iters, stop_thr=1e-2)
            ref = ref_sinkhorn(
                torch.tensor(p), torch.tensor(q), torch.tensor(cost), 0.1,
                numItermax=iters, stopThr=1e-2, warn=False,
            )
            np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-5)


class TestCoupling:
    def test_against_reference(self, reference_fgw):
        import torch
        from conan_fgw.src.model.fgw.bregman import fgw as ref_fgw

        rng = np.random.default_rng(2)
        Ys, Cs, ps, p, _ = _rand_problem(rng, K=2, N=9)
        M = np.sum((Ys[0][:, None, :] - Ys[1][None, :, :]) ** 2, -1).astype(np.float32)
        ours = fgw_coupling(
            M, Cs[0], Cs[1], p, ps[1], None,
            alpha=0.1, epsilon=0.1, pgd_iters=5, pgd_tol=1e-4,
            sinkhorn_iters=5, sinkhorn_thr=1e-2,
        )
        ref = ref_fgw(
            torch.tensor(M), torch.tensor(Cs[0]), torch.tensor(Cs[1]),
            torch.tensor(p), torch.tensor(ps[1]),
            "square_loss", 0.1, True, 0.1, None, 5, 1e-4,
            solver="PGD", method="sinkhorn_log", numItermax=5, stopThr=1e-2,
        )
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-4)

    def test_ppa_against_reference(self, reference_fgw):
        """PPA proximal-point variant: extra ``-eps*log(T)`` gradient term
        (``bregman.py:131-132``)."""
        import torch
        from conan_fgw.src.model.fgw.bregman import fgw as ref_fgw

        rng = np.random.default_rng(5)
        Ys, Cs, ps, p, _ = _rand_problem(rng, K=2, N=9)
        M = np.sum((Ys[0][:, None, :] - Ys[1][None, :, :]) ** 2, -1).astype(np.float32)
        ours = fgw_coupling(
            M, Cs[0], Cs[1], p, ps[1], None,
            alpha=0.1, epsilon=0.1, pgd_iters=5, pgd_tol=1e-4,
            sinkhorn_iters=5, sinkhorn_thr=1e-2, solver="PPA",
        )
        ref = ref_fgw(
            torch.tensor(M), torch.tensor(Cs[0]), torch.tensor(Cs[1]),
            torch.tensor(p), torch.tensor(ps[1]),
            "square_loss", 0.1, True, 0.1, None, 5, 1e-4,
            solver="PPA", method="sinkhorn_log", numItermax=5, stopThr=1e-2,
        )
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-4)


class TestBarycenter:
    def test_against_reference_random(self, reference_fgw):
        import torch

        rng = np.random.default_rng(3)
        Ys, Cs, ps, p, lam = _rand_problem(rng, K=4, N=11)
        cfg = FGWConfig()
        Y, C = fgw_barycenter(
            jnp.asarray(Ys), jnp.asarray(Cs), jnp.asarray(ps), jnp.asarray(p),
            jnp.asarray(lam), cfg,
        )
        Y_ref, C_ref, _ = reference_fgw.fgw_barycenters(
            N=11,
            Ys=[torch.tensor(y) for y in Ys],
            Cs=[torch.tensor(c) for c in Cs],
            ps=[torch.tensor(w) for w in ps],
            lambdas=torch.tensor(lam),
            warmstartT=True, symmetric=True, method="sinkhorn_log",
            alpha=cfg.alpha, solver="PGD", epsilon=cfg.epsilon, p=None,
            loss_fun="square_loss", max_iter=cfg.outer_iters, tol=cfg.outer_tol,
            numItermax=cfg.sinkhorn_iters, stopThr=cfg.sinkhorn_thr,
            verbose=False, log=True, init_C=torch.tensor(Cs[0]),
        )
        np.testing.assert_allclose(np.asarray(Y), Y_ref.numpy(), atol=2e-3)
        np.testing.assert_allclose(np.asarray(C), C_ref.numpy(), atol=2e-3)

    def test_cfm_fixture_parity(self, reference_fgw):
        """Replicate the captured real solver input from the reference notebook."""
        import os
        import torch

        if not os.path.exists(CFM_FIXTURE):
            pytest.skip("cfm_log.pt fixture not available")
        d = torch.load(CFM_FIXTURE, map_location="cpu", weights_only=False)
        Ys = np.stack([y.numpy() for y in d["Ys"]]).astype(np.float32)
        Cs = np.stack([c.numpy() for c in d["Cs"]]).astype(np.float32)
        ps = np.stack([w.numpy() for w in d["ps"]]).astype(np.float32)
        lam = d["lambdas"].numpy().astype(np.float32)
        N = int(d["N"])
        p = np.full((N,), 1.0 / N, np.float32)

        cfg = FGWConfig()
        Y, C = fgw_barycenter(
            jnp.asarray(Ys), jnp.asarray(Cs), jnp.asarray(ps), jnp.asarray(p),
            jnp.asarray(lam), cfg,
        )
        Y_ref, C_ref, _ = reference_fgw.fgw_barycenters(
            N=N,
            Ys=[torch.tensor(y) for y in Ys],
            Cs=[torch.tensor(c) for c in Cs],
            ps=[torch.tensor(w) for w in ps],
            lambdas=torch.tensor(lam),
            warmstartT=True, symmetric=True, method="sinkhorn_log",
            alpha=cfg.alpha, solver="PGD", epsilon=cfg.epsilon, p=None,
            loss_fun="square_loss", max_iter=cfg.outer_iters, tol=cfg.outer_tol,
            numItermax=cfg.sinkhorn_iters, stopThr=cfg.sinkhorn_thr,
            verbose=False, log=True, init_C=torch.tensor(Cs[0]),
        )
        np.testing.assert_allclose(np.asarray(Y), Y_ref.numpy(), atol=2e-3)
        np.testing.assert_allclose(np.asarray(C), C_ref.numpy(), atol=2e-3)

    def test_batch_matches_single(self):
        rng = np.random.default_rng(4)
        probs = [_rand_problem(rng, K=3, N=8) for _ in range(4)]
        Ys = jnp.asarray(np.stack([pr[0] for pr in probs]))
        Cs = jnp.asarray(np.stack([pr[1] for pr in probs]))
        Yb, Cb = fgw_barycenter_batch(Ys, Cs)
        for i, (y, c, ps, p, lam) in enumerate(probs):
            Y1, C1 = fgw_barycenter(
                jnp.asarray(y), jnp.asarray(c), jnp.asarray(ps),
                jnp.asarray(p), jnp.asarray(lam),
            )
            np.testing.assert_allclose(np.asarray(Yb[i]), np.asarray(Y1), atol=1e-5)
            np.testing.assert_allclose(np.asarray(Cb[i]), np.asarray(C1), atol=1e-5)

    def test_permutation_equivariance_over_conformers(self):
        """Barycenter must be invariant to the order of the K conformers."""
        rng = np.random.default_rng(5)
        Ys, Cs, ps, p, lam = _rand_problem(rng, K=4, N=9)
        cfg = FGWConfig(warmstart=False)  # init_C = Cs[0] breaks order-invariance
        Y1, _ = fgw_barycenter(
            jnp.asarray(Ys), jnp.asarray(Cs), jnp.asarray(ps), jnp.asarray(p),
            jnp.asarray(lam), cfg, init_C=jnp.eye(9),
        )
        perm = [2, 0, 3, 1]
        Y2, _ = fgw_barycenter(
            jnp.asarray(Ys[perm]), jnp.asarray(Cs[perm]), jnp.asarray(ps[perm]),
            jnp.asarray(p), jnp.asarray(lam), cfg, init_C=jnp.eye(9),
        )
        np.testing.assert_allclose(np.asarray(Y1), np.asarray(Y2), atol=1e-4)

    def test_gradient_flows_to_features(self):
        import jax

        rng = np.random.default_rng(6)
        Ys, Cs, ps, p, lam = _rand_problem(rng, K=3, N=8)

        def loss(y):
            Y, _ = fgw_barycenter(
                y, jnp.asarray(Cs), jnp.asarray(ps), jnp.asarray(p), jnp.asarray(lam)
            )
            return jnp.sum(Y**2)

        g = jax.grad(loss)(jnp.asarray(Ys))
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0

    def test_gradient_matches_reference(self, reference_fgw):
        """dL/dYs must equal torch autograd through the reference solver
        (whose couplings are computed under no_grad)."""
        import jax
        import torch

        rng = np.random.default_rng(7)
        Ys, Cs, ps, p, lam = _rand_problem(rng, K=3, N=9)
        cfg = FGWConfig()

        def loss(y):
            Y, _ = fgw_barycenter(
                y, jnp.asarray(Cs), jnp.asarray(ps), jnp.asarray(p),
                jnp.asarray(lam), cfg,
            )
            return jnp.sum(Y**2)

        g_jax = np.asarray(jax.grad(loss)(jnp.asarray(Ys)))

        ys_t = [torch.tensor(y, requires_grad=True) for y in Ys]
        Y_ref, _, _ = reference_fgw.fgw_barycenters(
            N=9, Ys=ys_t, Cs=[torch.tensor(c) for c in Cs],
            ps=[torch.tensor(w) for w in ps], lambdas=torch.tensor(lam),
            warmstartT=True, symmetric=True, method="sinkhorn_log",
            alpha=cfg.alpha, solver="PGD", epsilon=cfg.epsilon, p=None,
            loss_fun="square_loss", max_iter=cfg.outer_iters, tol=cfg.outer_tol,
            numItermax=cfg.sinkhorn_iters, stopThr=cfg.sinkhorn_thr, log=True,
            init_C=torch.tensor(Cs[0]),
        )
        torch.sum(Y_ref**2).backward()
        g_ref = np.stack([y.grad.numpy() for y in ys_t])
        np.testing.assert_allclose(g_jax, g_ref, atol=5e-3)
