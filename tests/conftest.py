"""Test harness: force an 8-device virtual CPU mesh before JAX initialises.

Multi-chip sharding paths are validated on a faked host-platform mesh
(``--xla_force_host_platform_device_count=8``); real-TPU benchmarking happens
in ``bench.py``, not the test suite.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override any ambient TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402
import jax  # noqa: E402

# The container's sitecustomize registers a TPU plugin and *forces*
# jax_platforms at interpreter start; env vars alone cannot override it.
# Re-pin to CPU before any backend initialises.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: XLA CPU compiles are expensive on small hosts
# and the suite re-traces identical programs across runs.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

REFERENCE_ROOT = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "conan_fgw"))


@pytest.fixture(scope="session")
def reference_fgw():
    """Import the reference's pure-torch FGW solver as a golden oracle.

    Used strictly as a numerical parity target; skipped when the reference
    checkout is not present.
    """
    if not has_reference():
        pytest.skip("reference repo not available")
    import sys

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from conan_fgw.src.model.fgw import barycenter as ref_barycenter

    return ref_barycenter
