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

import json
import os
from typing import Any

import jax
import numpy as np


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
    """

    def __init__(self, directory: str, monitor: str = "val_mse", backend: str = "npz"):
        self.directory = directory
        self.monitor = monitor
        self.backend = backend
        os.makedirs(directory, exist_ok=True)
        self._orbax = None
        if backend == "orbax":
            import orbax.checkpoint as ocp

            self._orbax = ocp.StandardCheckpointer()

    def _meta(self, name: str, epoch: int, metrics: dict | None = None):
        with open(os.path.join(self.directory, f"{name}.meta.json"), "w") as f:
            json.dump({"epoch": epoch, "metrics": metrics or {}}, f)

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

    def save_best(self, state, epoch: int, metrics: dict | None = None):
        self._save("best", state.params)
        self._meta("best", epoch, metrics)

    def save_last(self, state, epoch: int):
        self._save("last", state.params)
        self._meta("last", epoch)

    def save_state(self, state, epoch: int, loop_state: dict | None = None):
        """Full train state (params + optimiser + step) for mid-run resume.

        The reference has no training-time fault tolerance (a DDP rank
        failure kills the job, SURVEY §5); here an interrupted run restarts
        from the last epoch boundary, including the plateau/early-stopping
        schedule state carried in ``loop_state``.
        """
        self._save("last_state", (state.params, state.opt_state, state.step))
        with open(os.path.join(self.directory, "last_state.meta.json"), "w") as f:
            json.dump({"epoch": epoch, "loop": loop_state or {}}, f)

    def restore_state(self, state_template, which: str = "last_state"):
        """Returns ``(restored_state, meta_dict)``; template supplies structure."""
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
        if self.backend == "orbax":
            path = os.path.abspath(os.path.join(self.directory, f"{which}.orbax"))
            tpl = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype), template
            )
            return self._orbax.restore(path, tpl)
        return _restore_pytree(os.path.join(self.directory, which), template)

    def has(self, which: str = "best") -> bool:
        if self.backend == "orbax":
            return os.path.exists(os.path.join(self.directory, f"{which}.orbax"))
        return os.path.exists(os.path.join(self.directory, f"{which}.npz"))


def find_pre_stage_dir(models_dir: str, run_name: str, run_id: str, run_idx: int) -> str:
    """Stage-1 checkpoint discovery, mirroring ``src/utils.py:55-63`` layout:
    ``{models_dir}/{run_name}/{run_id}/run_conan_fgw_pre:{run_idx}``."""
    return os.path.join(models_dir, run_name, str(run_id), f"run_conan_fgw_pre:{run_idx}")
