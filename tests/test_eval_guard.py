"""Opt-in eval-side prediction guard (TrainSettings.eval_guard).

Regression coverage for the ViSNet stage-2 run-2 divergence (RESULTS.md
round-4 †): a deterministic trunk-activation blow-up emitted one ~1.5e9
prediction for the largest test molecule while labels sat at ~N(0, 1) —
silent garbage that poisoned the split RMSE. The guard must flag exactly
that signature (and non-finite predictions) and report guarded metrics,
WITHOUT silently altering the unguarded ones.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from conan_fgw_tpu.data.synthetic import random_dataset
from conan_fgw_tpu.train import loop as loop_lib


def _stub_eval_step(blowup_index=None, nan_index=None):
    """An eval_step whose predictions equal the labels except for injected
    garbage — reproduces the divergence signature without retraining the
    bit-reproducible run."""
    calls = {"n": 0}

    def eval_step(params, batch):
        preds = np.asarray(batch.y, dtype=np.float32).reshape(-1, 1).copy()
        base = calls["n"] * preds.shape[0]
        for idx, val in ((blowup_index, 1.5e9), (nan_index, np.nan)):
            if idx is not None and base <= idx < base + preds.shape[0]:
                preds[idx - base, 0] = val
        calls["n"] += 1
        return jnp.float32(0.0), jnp.asarray(preds), jnp.int32(0)

    return eval_step


def _records():
    return random_dataset(3, 12, num_conformers=2, heavy_range=(3, 10))


def test_guard_flags_blowup_and_reports_guarded_metrics():
    records = _records()
    settings = loop_lib.TrainSettings(batch_size=4, eval_guard=True)
    max_atoms = loop_lib.dataset_max_atoms(records)
    metrics, pred, y = loop_lib.evaluate(
        _stub_eval_step(blowup_index=5), None, records, settings, max_atoms
    )
    assert metrics["pred_outliers"] == 1
    # the unguarded rmse keeps the garbage (honest headline)...
    assert metrics["rmse"] > 1e7
    # ...the guarded rmse excludes it, and the rest predict perfectly
    assert metrics["rmse_guarded"] < 1e-6


def test_guard_flags_nonfinite():
    records = _records()
    settings = loop_lib.TrainSettings(batch_size=4, eval_guard=True)
    max_atoms = loop_lib.dataset_max_atoms(records)
    metrics, _, _ = loop_lib.evaluate(
        _stub_eval_step(nan_index=2), None, records, settings, max_atoms
    )
    assert metrics["pred_outliers"] == 1
    assert metrics["rmse_guarded"] < 1e-6


def test_guard_quiet_on_clean_predictions():
    records = _records()
    settings = loop_lib.TrainSettings(batch_size=4, eval_guard=True)
    max_atoms = loop_lib.dataset_max_atoms(records)
    metrics, _, _ = loop_lib.evaluate(
        _stub_eval_step(), None, records, settings, max_atoms
    )
    assert metrics["pred_outliers"] == 0
    assert "rmse_guarded" not in metrics
    # ordinary bad fits (predictions within a few label sigmas) never trip
    # the 50-sigma threshold: guard off -> no key at all
    off = dataclasses.replace(settings, eval_guard=False)
    m2, _, _ = loop_lib.evaluate(
        _stub_eval_step(blowup_index=5), None, records, off, max_atoms
    )
    assert "pred_outliers" not in m2
