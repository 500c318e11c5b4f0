"""FGW barycenter parity + speed demo (the reference notebook, as a script).

Mirrors ``/root/reference/notebooks/fgw.ipynb``: load the captured real
solver input (K=10 conformer graphs, N=22 atoms, d=3), solve the barycenter
with this framework's batched JAX solver, compare against the reference's
captured output, and time both the single solve and a batch of 256
simultaneous solves.

    python examples/fgw_parity_demo.py [--fixture PATH] [--platform cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fixture", default="/root/reference/notebooks/data/cfm_log.pt")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from conan_fgw_tpu.ops.fgw import FGWConfig, fgw_barycenter, fgw_barycenter_batch



    if os.path.exists(args.fixture):
        import torch

        d = torch.load(args.fixture, map_location="cpu", weights_only=False)
        Ys = np.stack([y.numpy() for y in d["Ys"]]).astype(np.float32)
        Cs = np.stack([c.numpy() for c in d["Cs"]]).astype(np.float32)
        ps = np.stack([w.numpy() for w in d["ps"]]).astype(np.float32)
        lam = d["lambdas"].numpy().astype(np.float32)
        ref_Y = d["F_bary"].numpy()
        print(f"loaded fixture: K={Ys.shape[0]} graphs, N={Ys.shape[1]}, d={Ys.shape[2]}")
    else:
        rng = np.random.default_rng(0)
        K, N, D = 10, 22, 3
        Ys = (rng.standard_normal((K, N, D)) * 0.5 + 1).astype(np.float32)
        Cs = np.maximum(a := (rng.random((K, N, N)) < 0.3).astype(np.float32), a.transpose(0, 2, 1))
        ps = np.full((K, N), 1 / N, np.float32)
        lam = np.full((K,), 1 / K, np.float32)
        ref_Y = None
        print("fixture not found; using random graphs")

    N = Ys.shape[1]
    p = np.full((N,), 1.0 / N, np.float32)
    cfg = FGWConfig()

    Y, C = jax.block_until_ready(
        fgw_barycenter(jnp.asarray(Ys), jnp.asarray(Cs), jnp.asarray(ps),
                       jnp.asarray(p), jnp.asarray(lam), cfg)
    )
    t0 = time.perf_counter()
    for _ in range(10):
        Y, C = fgw_barycenter(jnp.asarray(Ys), jnp.asarray(Cs), jnp.asarray(ps),
                              jnp.asarray(p), jnp.asarray(lam), cfg)
    jax.block_until_ready(Y)
    single_ms = (time.perf_counter() - t0) / 10 * 1e3
    print(f"single barycenter solve: {single_ms:.2f} ms "
          f"(reference notebook: 5201 ms torch-CPU, 58 ms POT-CG)")
    if ref_Y is not None:
        # the fixture's captured F_bary was produced with the notebook's solver
        # settings (not the training hot path's hardcoded 5/5/5 config); exact
        # parity against a re-run of the reference solver is asserted in
        # tests/test_fgw_parity.py::test_cfm_fixture_parity
        print(f"max |Y - captured notebook Y|: {np.abs(np.asarray(Y) - ref_Y).max():.2e}")

    B = 256
    Yb = jnp.broadcast_to(jnp.asarray(Ys), (B, *Ys.shape))
    Cb = jnp.broadcast_to(jnp.asarray(Cs), (B, *Cs.shape))
    out = jax.block_until_ready(fgw_barycenter_batch(Yb, Cb, config=cfg)[0])
    t0 = time.perf_counter()
    out = fgw_barycenter_batch(Yb, Cb, config=cfg)[0]
    jax.block_until_ready(out)
    batch_ms = (time.perf_counter() - t0) * 1e3
    print(f"{B} simultaneous solves: {batch_ms:.1f} ms "
          f"({batch_ms / B:.3f} ms/molecule)")


if __name__ == "__main__":
    main()
