"""Sinkhorn numerical-failure detection + rollback (reference
``conan_fgw/src/model/fgw/sinkhorn.py:262-274,434-438,646-652``)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from conan_fgw_tpu.ops.fgw.coupling import fgw_coupling
from conan_fgw_tpu.ops.fgw.sinkhorn import sinkhorn_log


def _uniform(n):
    return jnp.full((n,), 1.0 / n)


def test_sinkhorn_rolls_back_on_nonfinite():
    n = 8
    p, q = _uniform(n), _uniform(n)
    cost = jnp.ones((n, n))
    # an all-inf cost column drives the potentials non-finite on the first
    # update; the solver must keep the previous (zero) potentials and flag it
    cost = cost.at[:, 0].set(jnp.inf)
    T, diverged = sinkhorn_log(p, q, cost, 0.1, num_iters=5, return_diverged=True)
    assert bool(diverged)
    assert np.all(np.isfinite(np.asarray(T)))


def test_sinkhorn_clean_solve_not_flagged():
    n = 8
    p, q = _uniform(n), _uniform(n)
    rng = np.random.default_rng(0)
    cost = jnp.asarray(rng.random((n, n)), jnp.float32)
    T, diverged = sinkhorn_log(p, q, cost, 0.1, num_iters=50, return_diverged=True)
    assert not bool(diverged)
    np.testing.assert_allclose(np.asarray(T).sum(0), np.asarray(q), atol=1e-3)


def test_coupling_propagates_divergence():
    n = 6
    p, q = _uniform(n), _uniform(n)
    rng = np.random.default_rng(1)
    C1 = jnp.asarray(rng.random((n, n)), jnp.float32)
    C2 = jnp.asarray(rng.random((n, n)), jnp.float32)
    M_bad = jnp.full((n, n), jnp.inf)
    T, diverged = fgw_coupling(M_bad, C1, C2, p, q, return_diverged=True)
    assert bool(diverged)
    assert np.all(np.isfinite(np.asarray(T)))

    M_ok = jnp.asarray(rng.random((n, n)), jnp.float32)
    T, diverged = fgw_coupling(M_ok, C1, C2, p, q, return_diverged=True)
    assert not bool(diverged)


def test_train_step_surfaces_counter():
    from conan_fgw_tpu.data.loader import pack
    from conan_fgw_tpu.data.packing import PackedBatch
    from conan_fgw_tpu.data.synthetic import random_dataset
    from conan_fgw_tpu.models.heads import ConanModel
    from conan_fgw_tpu.train import loop as loop_lib

    recs = random_dataset(3, 4, num_conformers=2, heavy_range=(4, 6))
    pb = pack(recs, max_atoms=32, batch_size=4)
    batch = PackedBatch(**jax.tree.map(jnp.asarray, dataclasses.asdict(pb)))
    model = ConanModel(hidden_channels=32, num_filters=32, num_gaussians=10)
    settings = loop_lib.TrainSettings(use_barycenter=True, batch_size=4)
    state = loop_lib.init_state(model, settings, batch)
    train_step, eval_step = loop_lib.make_step_fns(model, settings)
    state, loss, n_div = train_step(state, batch)
    assert np.isfinite(float(loss))
    assert int(n_div) == 0  # healthy solve: nothing rolled back
    loss, pred, n_div = eval_step(state.params, batch)
    assert pred.shape == (4, 1)
    assert int(n_div) == 0
