"""Orbax checkpointing with the reference's best/last policy.

Mirrors Lightning ``ModelCheckpoint`` usage in the reference
(``conan_fgw/src/trainer.py:227-296``): keep the best state by the monitored
metric (``val_mse`` min for regression, ``val_auroc``/``val_mean`` max for
classification) plus the last state, and support the two-stage warm start
(stage-2 ``conan_fgw`` restores stage-1 ``conan_fgw_pre``'s best parameters,
``train_val.py:177-192``). Because both stages share one parameter tree here
(the barycenter branch is a call-time flag), warm start is a plain restore;
``merge_params`` additionally supports partial/surgical loads.
"""

from __future__ import annotations

import atexit
import json
import logging
import os
import threading
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger("conan_fgw_tpu")


def jnp_copy(x):
    """Device-side copy (stays on device; detaches from donated buffers)."""
    return jnp.copy(x) if isinstance(x, jax.Array) else x


def _save_pytree(path: str, tree: Any) -> None:
    """Path-keyed .npz + structure JSON — dependency-light and fork-safe.

    Leaves are stored under their pytree key-path (e.g.
    ``['params']['backbone']['blocks_0']['filter_w1']``), so a restore matches
    by *name*, tolerating leaf-order changes as the model evolves.
    """
    leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(tree)
    np.savez(
        path + ".npz",
        **{jax.tree_util.keystr(kp): np.asarray(x) for kp, x in leaves_with_path},
    )
    with open(path + ".tree.json", "w") as f:
        json.dump({"structure": str(treedef), "num_leaves": len(leaves_with_path)}, f)


def _restore_pytree(path: str, template: Any) -> Any:
    data = np.load(path + ".npz")
    leaves_t, treedef = jax.tree_util.tree_flatten_with_path(template)
    if data.files and data.files[0].startswith("leaf_"):
        # legacy order-keyed format (pre path-keyed checkpoints)
        leaves = [data[f"leaf_{i}"] for i in range(len(leaves_t))]
    else:
        missing = [jax.tree_util.keystr(kp) for kp, _ in leaves_t
                   if jax.tree_util.keystr(kp) not in data]
        if missing:
            raise ValueError(
                f"checkpoint at {path} is missing {len(missing)} leaves, e.g. "
                f"{missing[:3]} (stage/architecture mismatch?)"
            )
        leaves = [data[jax.tree_util.keystr(kp)] for kp, _ in leaves_t]
    for (kp, want), got in zip(leaves_t, leaves):
        if hasattr(want, "shape") and tuple(got.shape) != tuple(np.shape(want)):
            raise ValueError(
                f"leaf {jax.tree_util.keystr(kp)}: shape {got.shape} != "
                f"template {np.shape(want)}"
            )
    return jax.tree.unflatten(treedef, [x for x in leaves])


def merge_params(target: Any, source: Any) -> Any:
    """Copy every leaf present (by path) in ``source`` into ``target``.

    The analog of loading a smaller ``state_dict`` into a larger model:
    overlapping parameters are restored, new ones keep their fresh init —
    the stage-1 → stage-2 semantics of the reference.
    """

    def _merge(t, s):
        if isinstance(t, dict) and isinstance(s, dict):
            return {k: (_merge(t[k], s[k]) if k in s else t[k]) for k in t}
        return s

    return _merge(target, source)


class RunCheckpointer:
    """best/last checkpoints for one training run.

    ``backend="npz"`` (default) writes flat ``.npz`` + tree metadata —
    dependency-light and fast for small models. ``backend="orbax"`` uses
    Orbax's StandardCheckpointer (sharding-aware; preferred for multi-host
    or large states).

    ``async_writes=True`` (the default) hands each save to a single writer
    thread: the training loop only dispatches a device-side copy of the
    state (microseconds) while the device→host fetch and file write — which
    cost seconds per epoch over a tunneled TPU — overlap the next epoch's
    compute. The device copy means donated train-step buffers are never
    aliased by an in-flight save. ``flush()`` (called automatically by every
    restore and at interpreter exit) drains the queue and re-raises writer
    errors; ``has()`` only drains — a pure query never raises for an earlier
    unrelated save.

    Pending saves are **coalesced by checkpoint name**: when the training
    loop produces saves faster than the writer can fetch+write them (0.6s
    epochs vs multi-second tunneled fetches), a newer ``last``/``last_state``/
    ``best`` simply replaces the not-yet-started older one. That bounds both
    the flush backlog and the number of device-side snapshots alive at once
    to the number of distinct checkpoint names (≤3), instead of growing by
    two per epoch — the semantics are unchanged because only the newest save
    per name can ever be observed after a flush, and ``save_best`` is only
    called on metric improvement (the newest *is* the best).
    """

    def __init__(
        self,
        directory: str,
        monitor: str = "val_mse",
        backend: str = "npz",
        async_writes: bool = True,
    ):
        self.directory = directory
        self.monitor = monitor
        self.backend = backend
        os.makedirs(directory, exist_ok=True)
        self._orbax = None
        if backend == "orbax":
            import orbax.checkpoint as ocp

            self._orbax = ocp.StandardCheckpointer()
        self._async = async_writes and backend == "npz"
        # pending jobs keyed by checkpoint name; a re-save of the same name
        # replaces the queued (not-yet-started) one
        self._pending: dict[str, list] = {}
        self._cond = threading.Condition()
        self._busy = False  # a job is being written right now
        self._writer: threading.Thread | None = None
        self._write_error: BaseException | None = None
        if self._async:
            atexit.register(self.flush)

    # -- async writer ------------------------------------------------------
    def _writer_loop(self):
        while True:
            with self._cond:
                while not self._pending:
                    self._cond.wait()
                key = next(iter(self._pending))
                steps = self._pending.pop(key)
                self._busy = True
            try:
                for fn, args in steps:
                    fn(*args)
            except BaseException as e:  # logged now; re-raised by flush()
                log.error("checkpoint write %r failed: %s", key, e)
                self._write_error = e
            finally:
                with self._cond:
                    self._busy = False
                    self._cond.notify_all()

    def _submit(self, key: str, steps: list):
        """steps: list of (fn, args) written as one unit (payload + meta)."""
        if not self._async:
            for fn, args in steps:
                fn(*args)
            return
        with self._cond:
            if self._writer is None or not self._writer.is_alive():
                self._writer = threading.Thread(
                    target=self._writer_loop, daemon=True,
                    name=f"ckpt-writer:{self.directory}",
                )
                self._writer.start()
            self._pending[key] = steps  # coalesce: newest save wins
            self._cond.notify_all()

    def _drain(self):
        """Block until all queued saves finish (success or logged failure)."""
        if self._async and self._writer is not None and self._writer.is_alive():
            with self._cond:
                while self._pending or self._busy:
                    self._cond.wait()

    def flush(self):
        """Block until all queued saves hit disk; re-raise any writer error.

        Called by every restore (a failed save must not be silently read
        around) and at interpreter exit. ``has()`` only drains: a pure
        existence query should not raise for an unrelated earlier save —
        the error was logged when it happened and still surfaces here."""
        self._drain()
        if self._write_error is not None:
            err, self._write_error = self._write_error, None
            raise err

    @staticmethod
    def _device_snapshot(tree):
        """A device-side copy detached from donation: the train step may
        donate/invalidate the original buffers while this copy is still being
        fetched by the writer thread.

        The copies are forced to EXECUTE before this returns (one element
        fetched per leaf — a few hundred bytes — as a hard completion
        barrier): defensive hardening against donation outrunning the async
        copy on backends with weak ordering. (A round-4 ViSNet anomaly was
        initially attributed to this race; the checkpoint turned out to be
        clean — the model itself produced a divergent prediction for one
        molecule — but the barrier stays: it is nearly free and removes the
        hazard class on the tunneled backend, where block_until_ready is
        known not to imply completion.)"""
        copied = jax.tree.map(
            lambda x: jnp_copy(x) if hasattr(x, "devices") else x, tree
        )
        leaves = [x for x in jax.tree.leaves(copied) if hasattr(x, "devices")]
        if leaves:
            jax.device_get([x.ravel()[:1] for x in leaves])
        return copied

    def _save(self, name: str, params):
        if self.backend == "orbax":
            import shutil

            path = os.path.abspath(os.path.join(self.directory, f"{name}.orbax"))
            if os.path.exists(path):
                shutil.rmtree(path)
            self._orbax.save(path, jax.device_get(params))
            self._orbax.wait_until_finished()
        else:
            _save_pytree(os.path.join(self.directory, name), params)

    def _meta_write(self, name: str, payload: dict):
        with open(os.path.join(self.directory, f"{name}.meta.json"), "w") as f:
            json.dump(payload, f)

    def save_best(self, state, epoch: int, metrics: dict | None = None):
        self._submit("best", [
            (self._save, ("best", self._device_snapshot(state.params))),
            (self._meta_write, ("best", {"epoch": epoch, "metrics": metrics or {}})),
        ])

    def save_last(self, state, epoch: int):
        self._submit("last", [
            (self._save, ("last", self._device_snapshot(state.params))),
            (self._meta_write, ("last", {"epoch": epoch, "metrics": {}})),
        ])

    def save_state(self, state, epoch: int, loop_state: dict | None = None):
        """Full train state (params + optimiser + step) for mid-run resume.

        The reference has no training-time fault tolerance (a DDP rank
        failure kills the job, SURVEY §5); here an interrupted run restarts
        from the last epoch boundary, including the plateau/early-stopping
        schedule state carried in ``loop_state``.
        """
        snap = self._device_snapshot((state.params, state.opt_state, state.step))
        self._submit("last_state", [
            (self._save, ("last_state", snap)),
            (self._meta_write, ("last_state", {"epoch": epoch, "loop": loop_state or {}})),
        ])

    def restore_state(self, state_template, which: str = "last_state"):
        """Returns ``(restored_state, meta_dict)``; template supplies structure."""
        self.flush()
        tpl = (state_template.params, state_template.opt_state, state_template.step)
        if self.backend == "orbax":
            path = os.path.abspath(os.path.join(self.directory, f"{which}.orbax"))
            shapes = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype), tpl
            )
            params, opt_state, step = self._orbax.restore(path, shapes)
        else:
            params, opt_state, step = _restore_pytree(
                os.path.join(self.directory, which), tpl
            )
        with open(os.path.join(self.directory, f"{which}.meta.json")) as f:
            meta = json.load(f)
        state = state_template.replace(
            params=params, opt_state=opt_state, step=int(np.asarray(step))
        )
        return state, meta

    def restore_params(self, template, which: str = "best"):
        self.flush()
        if self.backend == "orbax":
            path = os.path.abspath(os.path.join(self.directory, f"{which}.orbax"))
            tpl = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype), template
            )
            return self._orbax.restore(path, tpl)
        return _restore_pytree(os.path.join(self.directory, which), template)

    def has(self, which: str = "best") -> bool:
        self._drain()
        if self.backend == "orbax":
            return os.path.exists(os.path.join(self.directory, f"{which}.orbax"))
        return os.path.exists(os.path.join(self.directory, f"{which}.npz"))


def find_pre_stage_dir(models_dir: str, run_name: str, run_id: str, run_idx: int) -> str:
    """Stage-1 checkpoint discovery, mirroring ``src/utils.py:55-63`` layout:
    ``{models_dir}/{run_name}/{run_id}/run_conan_fgw_pre:{run_idx}``."""
    return os.path.join(models_dir, run_name, str(run_id), f"run_conan_fgw_pre:{run_idx}")
