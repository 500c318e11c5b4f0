"""Data-parallel device mesh utilities.

The reference's only parallelism is single-node DDP over NCCL
(``conan_fgw/src/trainer.py:308-325``). The TPU-native equivalent: a
``jax.sharding.Mesh`` with a ``data`` axis spanning every chip (single host,
pod slice, or multi-slice), the batch sharded on its leading axis, parameters
replicated, and XLA inserting the gradient ``psum`` over ICI during the
backward pass of the jitted train step. For multi-host runs call
``initialize_distributed()`` first (JAX's analog of NCCL process groups).
"""

from __future__ import annotations

import logging
import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"

log = logging.getLogger("conan_fgw_tpu")


def initialize_distributed(**kwargs) -> None:
    """Multi-host bring-up (no-op on a single host without env config).

    On Cloud TPU/Slurm, ``jax.distributed.initialize`` auto-detects the
    topology. For manual bring-up (e.g. multi-process CPU testing) the
    coordinator can be passed via ``JAX_COORDINATOR_ADDRESS`` /
    ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``.
    """
    env = os.environ
    for kw, var, cast in (
        ("coordinator_address", "JAX_COORDINATOR_ADDRESS", str),
        ("num_processes", "JAX_NUM_PROCESSES", int),
        ("process_id", "JAX_PROCESS_ID", int),
    ):
        if kw not in kwargs and env.get(var):
            kwargs[kw] = cast(env[var])
    # explicit multi-process topology must not silently fall back to N
    # independent single-process runs sharing checkpoint/log paths: a real
    # init failure (bad coordinator address, port clash) is fatal then. The
    # lenient path stays for auto-detect/single-host/already-initialised.
    explicit_multi = int(kwargs.get("num_processes") or 0) > 1
    try:
        jax.distributed.initialize(**kwargs)
    except Exception as e:  # already initialised or single-process
        already = getattr(jax.distributed, "is_initialized", lambda: False)()
        if explicit_multi and not already:
            raise
        log.warning("jax.distributed.initialize skipped: %s", e)


def create_mesh(num_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (molecule) axis sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def chunk_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a scan-chunk stacked batch ``(chunk, B, ...)``: the scan
    axis stays whole on every device, the molecule axis (axis 1) shards over
    the data axis — the stacked analogue of ``batch_sharding``."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def shard_chunk_batch(batch_dict, mesh: Mesh):
    """Device-put a stacked ``(chunk, B, ...)`` batch with axis 1 sharded.

    Only reachable on single-host meshes (``train/loop.py`` gates the
    scan-chunk + mesh combination to ``process_count() == 1``), so a plain
    ``device_put`` suffices — no process-local assembly needed.
    """
    sh = chunk_batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(np.asarray(x), sh), batch_dict)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _local_row_block(sh: NamedSharding, shape) -> tuple[int, int]:
    """[start, stop) of the leading-axis rows owned by this process's devices
    (contiguous for a 1-D ``data`` mesh in device order)."""
    starts, stops, total = [], [], 0
    for idx in sh.addressable_devices_indices_map(tuple(shape)).values():
        s = idx[0]
        start = s.start or 0
        stop = shape[0] if s.stop is None else s.stop
        starts.append(start)
        stops.append(stop)
        total += stop - start
    lo, hi = min(starts), max(stops)
    if total != hi - lo:
        # with a non-default device ordering this process's shards could
        # interleave with another host's; slicing [lo:hi] would then hand
        # make_array_from_process_local_data rows this process does not own
        raise ValueError(
            f"process-local leading-axis shards are not contiguous: rows "
            f"[{lo}, {hi}) cover {hi - lo} rows but this process owns {total} "
            "— reorder the mesh so each process's devices form one block"
        )
    return lo, hi


def shard_batch(batch_dict, mesh: Mesh):
    """Device-put every array in the batch with its leading axis sharded.

    Every process passes the **same global batch** (hosts consume an
    identical, identically-shuffled batch stream — the seeded epoch rng makes
    this deterministic); each process device-puts only the leading-axis row
    block its devices own, and the global array is assembled with
    ``make_array_from_process_local_data``. Compared to per-host dataset
    shards this keeps multi-host training bit-identical to single-host (same
    global batches) and makes bucketed batching safe: every host sees the
    same batch shapes in the same order, so no host can fall out of step with
    a collective.
    """
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:

        def put(x):
            x = np.asarray(x)
            lo, hi = _local_row_block(sh, x.shape)
            return jax.make_array_from_process_local_data(sh, x[lo:hi])

        return jax.tree.map(put, batch_dict)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch_dict)
