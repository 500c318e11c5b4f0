"""True multi-process data-parallel training through the runner CLI.

The reference's stage 2 is single-node multi-GPU DDP (NCCL); the TPU-native
analog is ``jax.distributed`` + a global mesh. This spawns two real
processes, each owning two virtual CPU devices, and drives the production
``conan_fgw_tpu.train.runner`` CLI end-to-end: per-host dataset sharding,
global batch assembly via ``make_array_from_process_local_data``, gradient
psum inside the jitted step, and the cross-host eval gather.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from conan_fgw_tpu.data import conformers as conf_lib
from conan_fgw_tpu.data.datasets import write_csv

SMILES = [
    "CCO", "CCC", "CCN", "COC", "CCCl", "CC(C)C", "CCOC", "CNC",
    "CCCO", "CC(=O)O", "c1ccccc1", "c1ccncc1", "CCCC", "CCCN", "COCC", "CCF",
    "CC(C)O", "CCSC", "CC#N", "CCBr",
]


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_dp_runner(tmp_path):
    root = tmp_path
    ddir = root / "data" / "mhmini"
    rows = [
        {"smiles": s, "y": 0.37 * i - 1.0, "mol_id": f"m{i}"}
        for i, s in enumerate(SMILES)
    ]
    # 13 train molecules: an odd count whose per-host record shards would
    # have produced unequal batch counts (a collective deadlock) under
    # shard-by-records; the global-batch-stream design must not care
    splits = [("train", slice(0, 13)), ("valid", slice(13, 16)), ("test", slice(16, 20))]
    for mode, sl in splits:
        write_csv(str(ddir / f"{mode}.csv"), rows[sl], target="target")
    # pre-generate every conformer store: two processes featurising the same
    # molecules concurrently would race on the npz writes
    for mode, sl in splits:
        cdir = str(ddir / f"conformers_{mode}")
        failed = conf_lib.generate_store(
            [r["smiles"] for r in rows[sl]], [r["mol_id"] for r in rows[sl]],
            cdir, 2, max_workers=2,
        )
        assert not failed

    cfg = root / "mh.yaml"
    cfg.write_text(
        "dataset_name: ['mhmini']\n"
        "target: ['target']\n"
        "num_conformers: 2\n"
        "batch_size: 4\n"
        "experiment: regression\n"
        "num_epochs: 2\n"
        "learning_rate: 0.001\n"
        "model_name: schnet\n"
        "max_atoms: 32\n"
    )

    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            CONAN_FGW_TPU_JAX_CACHE="",  # isolate from the shared compile cache
        )
        out_json = root / f"summary_p{pid}.json"
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, "-m", "conan_fgw_tpu.train.runner",
                    "--config", str(cfg), "--stage", "conan_fgw_pre",
                    "--data_root", str(root), "--run_name", "mh", "--run_id", str(pid),
                    "--models_dir", str(root / f"models_p{pid}"),
                    "--logs_dir", str(root / f"logs_p{pid}"),
                    "--metrics_dir", str(root / f"metrics_p{pid}"),
                    "--platform", "cpu", "--distributed",
                    "--out_json", str(out_json),
                ],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"

    # the mesh really spanned both processes
    log0 = (root / "logs_p0" / "mh" / "0" / "run_conan_fgw_pre" / "log.txt").read_text()
    assert "4 devices, 2 process(es)" in log0

    # training is replicated: both processes computed identical global metrics
    s0 = json.loads((root / "summary_p0.json").read_text())
    s1 = json.loads((root / "summary_p1.json").read_text())
    assert np.isfinite(s0["test_rmse"]["mean"])
    np.testing.assert_allclose(
        s0["test_rmse"]["mean"], s1["test_rmse"]["mean"], rtol=1e-5
    )

    # and matches a single-process run over the same 4-device mesh: the
    # global batch stream makes multi-host DP numerically equivalent
    env = dict(os.environ)
    env.update(XLA_FLAGS="--xla_force_host_platform_device_count=4",
               CONAN_FGW_TPU_JAX_CACHE="")
    out_sp = root / "summary_sp.json"
    res = subprocess.run(
        [
            sys.executable, "-m", "conan_fgw_tpu.train.runner",
            "--config", str(cfg), "--stage", "conan_fgw_pre",
            "--data_root", str(root), "--run_name", "sp", "--run_id", "0",
            "--models_dir", str(root / "models_sp"),
            "--logs_dir", str(root / "logs_sp"),
            "--metrics_dir", str(root / "metrics_sp"),
            "--platform", "cpu", "--num_devices", "4",
            "--out_json", str(out_sp),
        ],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert res.returncode == 0, res.stdout[-4000:] + res.stderr[-2000:]
    sp = json.loads(out_sp.read_text())
    np.testing.assert_allclose(
        s0["test_rmse"]["mean"], sp["test_rmse"]["mean"], rtol=1e-4
    )
