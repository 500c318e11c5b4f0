"""conan_fgw_tpu — a TPU-native molecular conformer aggregation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``duyhominhnguyen/conan-fgw`` (ConAN, ICML 2024): structure-aware E(3)-invariant
molecular conformer aggregation networks with a Fused Gromov-Wasserstein (FGW)
barycenter aggregator solved *inside* the forward pass.

Design principles (TPU-first, not a port):

* Fixed-shape padded tensors ``(B, K, N, ...)`` with atom masks instead of
  PyG ragged flat-batches + scatter/gather.
* The per-molecule Python FGW loop of the reference
  (``schnet_no_sum.py:259``) becomes one batched, fixed-iteration
  ``lax.scan`` solve over the whole batch.
* Data parallelism over a ``jax.sharding.Mesh`` with XLA collectives,
  not DDP/NCCL.
* Host-side chemistry (SMILES parsing, conformer embedding) lives in
  ``conan_fgw_tpu.data`` and is kept off the training hot path.
"""

__version__ = "0.1.0"
