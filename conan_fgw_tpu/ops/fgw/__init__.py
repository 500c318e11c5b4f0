"""Batched Fused Gromov-Wasserstein solvers (entropic Sinkhorn / PGD).

TPU-native rewrite of the reference's pure-PyTorch OT stack
(``conan_fgw/src/model/fgw/{sinkhorn,bregman,barycenter,utils}.py``):
everything is expressed as fixed-shape batched matmuls and logsumexp
reductions under ``lax.scan`` with *fixed trip counts*, so one compiled
program solves the barycenter for every molecule in the batch at once.
"""

from conan_fgw_tpu.ops.fgw.sinkhorn import sinkhorn_log
from conan_fgw_tpu.ops.fgw.coupling import fgw_coupling
from conan_fgw_tpu.ops.fgw.barycenter import (
    FGWConfig,
    fgw_barycenter,
    fgw_barycenter_batch,
    normalize_minmax,
)

__all__ = [
    "sinkhorn_log",
    "fgw_coupling",
    "FGWConfig",
    "fgw_barycenter",
    "fgw_barycenter_batch",
    "normalize_minmax",
]
