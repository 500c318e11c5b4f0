"""Checkpoint backends, LR finder, profiling utilities, collectives."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from conan_fgw_tpu.data.packing import PackedBatch, pack_batch
from conan_fgw_tpu.data.synthetic import random_dataset
from conan_fgw_tpu.models.heads import ConanModel
from conan_fgw_tpu.train import loop as loop_lib
from conan_fgw_tpu.train.checkpoints import RunCheckpointer, merge_params

SMALL = dict(hidden_channels=32, num_filters=32, num_gaussians=10, num_interactions=2)


def _state_and_batch():
    recs = random_dataset(0, 4, num_conformers=2, heavy_range=(4, 6))
    pb = pack_batch(recs, max_atoms=32)
    batch = PackedBatch(**jax.tree.map(jnp.asarray, dataclasses.asdict(pb)))
    model = ConanModel(**SMALL)
    settings = loop_lib.TrainSettings(batch_size=4, max_atoms=32)
    state = loop_lib.init_state(model, settings, batch)
    return model, settings, state, batch, recs


class TestOrbaxBackend:
    def test_roundtrip(self, tmp_path):
        _, _, state, _, _ = _state_and_batch()
        ck = RunCheckpointer(str(tmp_path / "run"), backend="orbax")
        ck.save_best(state, 3, {"val_mse": 1.0})
        assert ck.has("best")
        restored = ck.restore_params(state.params, "best")
        same = jax.tree.map(
            lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
            state.params, restored,
        )
        assert all(jax.tree.leaves(same))


class TestMergeParams:
    def test_partial_merge(self):
        tgt = {"a": 1, "b": {"c": 2, "d": 3}}
        src = {"b": {"c": 99}}
        out = merge_params(tgt, src)
        assert out == {"a": 1, "b": {"c": 99, "d": 3}}


class TestLRFinder:
    def test_suggestion_in_range(self):
        from conan_fgw_tpu.train.lr_finder import lr_find

        model, settings, _, _, recs = _state_and_batch()
        out = lr_find(model, settings, recs, min_lr=1e-5, max_lr=1e-1, num_steps=12)
        assert 1e-6 < out["suggestion"] <= 1e-1
        assert len(out["losses"]) >= 3


class TestProfiling:
    def test_step_timer_and_csv(self, tmp_path):
        from conan_fgw_tpu.utils.profiling import PhaseCSVLogger, StepTimer

        t = StepTimer()
        for _ in range(4):
            with t:
                pass
        s = t.summary()
        assert s["steps"] == 3 and s["mean_s"] >= 0
        logger = PhaseCSVLogger(str(tmp_path / "phases.csv"))
        logger.log({"step": 0, "fwd_s": 0.1})
        logger.log({"step": 1, "fwd_s": 0.2})
        assert os.path.getsize(tmp_path / "phases.csv") > 0


class TestCollectives:
    def test_gather_single_host(self):
        from conan_fgw_tpu.parallel.collectives import all_hosts_mean, gather_to_host

        x = jnp.arange(8.0)
        np.testing.assert_array_equal(gather_to_host(x), np.arange(8.0))
        assert all_hosts_mean(3.5) == 3.5

    def test_gather_sharded(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from conan_fgw_tpu.parallel.collectives import gather_to_host
        from conan_fgw_tpu.parallel.mesh import create_mesh

        mesh = create_mesh(8)
        x = jax.device_put(jnp.arange(16.0), NamedSharding(mesh, P("data")))
        np.testing.assert_array_equal(gather_to_host(x), np.arange(16.0))


class TestAsyncCheckpointer:
    """The async writer must overlap device->host fetch with training yet be
    transparent: every read path flushes first."""

    def test_roundtrip_and_flush(self, tmp_path):
        _, _, state, _, _ = _state_and_batch()
        ck = RunCheckpointer(str(tmp_path / "run"), async_writes=True)
        ck.save_best(state, 1, {"val_mse": 0.5})
        ck.save_last(state, 1)
        ck.save_state(state, 1, {"plateau": 2})
        # has()/restore flush the queue before touching disk
        assert ck.has("best") and ck.has("last")
        restored = ck.restore_params(state.params, "best")
        same = jax.tree.map(
            lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
            state.params, restored,
        )
        assert all(jax.tree.leaves(same))
        st2, meta = ck.restore_state(state)
        assert meta["epoch"] == 1 and meta["loop"] == {"plateau": 2}
        assert int(st2.step) == int(state.step)

    def test_writer_error_surfaces(self, tmp_path):
        ck = RunCheckpointer(str(tmp_path / "run"), async_writes=True)

        def boom():
            raise RuntimeError("disk full")

        ck._submit("best", [(boom, ())])
        try:
            ck.flush()
        except RuntimeError as e:
            assert "disk full" in str(e)
        else:
            raise AssertionError("writer error was swallowed")

    def test_snapshot_detaches_from_donation(self, tmp_path):
        # a save issued right before the train step donates its buffers must
        # still write the pre-step values
        model, settings, state, batch, _ = _state_and_batch()
        vals = jax.tree.map(lambda x: np.asarray(x), state.params)
        ck = RunCheckpointer(str(tmp_path / "run"), async_writes=True)
        ck.save_best(state, 0, {})
        train_step, _ = loop_lib.make_step_fns(model, settings)
        state = train_step(state, batch)  # donates the old params
        restored = ck.restore_params(vals, "best")
        same = jax.tree.map(
            lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)), vals, restored
        )
        assert all(jax.tree.leaves(same))

    def test_pending_saves_coalesce(self, tmp_path):
        """600 queued epoch saves must collapse to a bounded backlog: the
        writer observes only the newest save per checkpoint name."""
        import threading
        import time

        ck = RunCheckpointer(str(tmp_path / "run"), async_writes=True)
        gate = threading.Event()
        written = []

        def slow_write(tag):
            gate.wait(30)
            written.append(tag)

        # occupy the writer so subsequent submits pile up in _pending
        ck._submit("warmup", [(slow_write, ("warmup",))])
        deadline = time.time() + 10
        while "warmup" in ck._pending and time.time() < deadline:
            time.sleep(0.005)  # wait for the writer to pick the job up
        for epoch in range(50):
            ck._submit("last", [(slow_write, (f"last{epoch}",))])
            ck._submit("last_state", [(slow_write, (f"state{epoch}",))])
        assert len(ck._pending) <= 2  # coalesced, not 100 deep
        gate.set()
        ck.flush()
        # exactly one (the newest) per name actually hit the writer
        assert written.count("last49") == 1 and written.count("state49") == 1
        assert not any(w.startswith("last") and w != "last49" for w in written if w != "warmup")
