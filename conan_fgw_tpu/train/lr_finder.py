"""Learning-rate range finder (the ``use_lr_finder`` config feature).

The reference delegates to Lightning's ``Tuner.lr_find``
(``train_val.py:196-198``): exponentially sweep the LR over a short run,
record the loss curve, and pick the steepest-descent point. Same algorithm
here over the jitted train step.
"""

from __future__ import annotations

import numpy as np

from conan_fgw_tpu.train import loop as loop_lib


def lr_find(
    model,
    settings,
    records,
    *,
    min_lr: float = 1e-6,
    max_lr: float = 1.0,
    num_steps: int = 60,
    mesh=None,
) -> dict:
    """Returns {"suggestion": lr, "lrs": [...], "losses": [...]}"""
    max_atoms = settings.max_atoms or loop_lib.dataset_max_atoms(records)
    lrs = np.exp(np.linspace(np.log(min_lr), np.log(max_lr), num_steps))

    def batch_stream():
        """Endless stream over the dataset, one device batch at a time —
        never materialises the full dataset on device."""
        while True:
            for pb in loop_lib.batch_iterator(
                records, settings.batch_size, max_atoms, prefetch=False
            ):
                yield loop_lib._to_device_batch(pb, mesh)

    stream = batch_stream()
    first = next(stream)
    state = loop_lib.init_state(model, settings, first, settings.seed)
    train_step, _ = loop_lib.make_step_fns(model, settings)

    losses = []
    batch = first
    for lr in lrs:
        state = loop_lib.set_learning_rate(state, float(lr))
        state, loss, _ = train_step(state, batch)
        loss = float(loss)
        losses.append(loss)
        if not np.isfinite(loss) or (len(losses) > 5 and loss > 4 * min(losses)):
            lrs = lrs[: len(losses)]
            break
        batch = next(stream)

    # steepest negative slope of the smoothed loss curve
    lo = np.asarray(losses)
    if len(lo) >= 3:
        smooth = np.convolve(lo, np.ones(3) / 3, mode="valid")
        grads = np.gradient(smooth)
        idx = int(np.argmin(grads)) + 1
    else:
        idx = len(lo) - 1
    return {"suggestion": float(lrs[idx]), "lrs": list(map(float, lrs)), "losses": losses}
