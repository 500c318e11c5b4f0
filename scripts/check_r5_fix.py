"""Chip validation for the r5 VMEM-OOM fix (R<=8 super-tiles + deep-budget
auto fallback): compile+run exactly the two programs that OOMed in the r5
queue — a classification stage-1/2-style init (cfconv + FGW kernels in one
program at filters=256, N=64) and an N=64-bucket stage-2 train step."""
import dataclasses, json, os, sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax, jax.numpy as jnp
from conan_fgw_tpu.data.loader import pack
from conan_fgw_tpu.data.packing import PackedBatch
from conan_fgw_tpu.data.synthetic import random_dataset
from conan_fgw_tpu.models.heads import ConanModel
from conan_fgw_tpu.train import loop as loop_lib

ok = True
for label, model, bs, heavy in [
    ("classification_n64",
     ConanModel(task="classification", hidden_channels=512, num_filters=256,
                num_gaussians=10), 18, (20, 28)),
    ("regression_n64", ConanModel(), 24, (20, 28)),
]:
    try:
        recs = random_dataset(1, bs, num_conformers=5, heavy_range=heavy)
        pb = pack(recs, max_atoms=64, batch_size=bs)
        batch = PackedBatch(**jax.tree.map(jnp.asarray, dataclasses.asdict(pb)))
        settings = loop_lib.TrainSettings(
            use_barycenter=True, batch_size=bs,
            task="classification" if "class" in label else "regression",
        )
        state = loop_lib.init_state(model, settings, batch)
        step, _ = loop_lib.make_step_fns(model, settings)
        state, loss, _ = step(state, batch)
        print(json.dumps({"check": label, "loss": float(loss)}), flush=True)
        assert np.isfinite(float(loss))
    except Exception as e:
        ok = False
        print(json.dumps({"check": label, "failed": str(e)[:300]}), flush=True)
sys.exit(0 if ok else 1)
