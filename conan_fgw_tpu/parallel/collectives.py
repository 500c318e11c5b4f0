"""Cross-host collective helpers for evaluation and metrics.

The reference gathers full validation/test prediction tensors across DDP
ranks with ``self.all_gather`` under a single-node world-size assumption
(``conan_fgw/src/model/common.py:307-333``). The TPU-native generalisation:
on-device arrays produced by a sharded eval step are already *global* jax
Arrays; for host-side metric code (sklearn AUROC etc.) we gather per-host
shards with ``multihost_utils.process_allgather``, which works for any number
of hosts and degrades to a no-op on a single process.
"""

from __future__ import annotations

import jax
import numpy as np


def gather_to_host(x) -> np.ndarray:
    """Global numpy view of a (possibly sharded, possibly multi-host) array."""
    x = jax.device_get(x) if _is_fully_addressable(x) else _allgather(x)
    return np.asarray(x)


def _is_fully_addressable(x) -> bool:
    try:
        return x.is_fully_addressable
    except AttributeError:
        return True


def _allgather(x):
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(x, tiled=True)


def host_concat(x: np.ndarray) -> np.ndarray:
    """Concatenate each host's numpy rows in process order (no-op on one)."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(np.asarray(x), tiled=True))


def all_hosts_mean(value: float) -> float:
    """Mean of a python scalar across hosts (no-op single-process)."""
    if jax.process_count() == 1:
        return float(value)
    from jax.experimental import multihost_utils

    arr = multihost_utils.process_allgather(np.asarray([value]))
    return float(np.mean(arr))
