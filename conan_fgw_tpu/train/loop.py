"""Jitted train/eval steps and the epoch loop.

Replaces the Lightning orchestration of the reference
(``conan_fgw/src/trainer.py`` + ``model/common.py``): one ``jax.jit``-ed
train step (forward, loss, grad, global-norm clip 1.0, Adam update) over a
data-parallel mesh; epoch-end metrics on the *globally gathered* prediction
set exactly like the reference's DDP ``all_gather`` path
(``common.py:307-333``); ``val_loss``-monitored early stopping and LR
plateau schedule; best/last checkpointing.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from functools import partial
from typing import Callable, Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from conan_fgw_tpu.data.packing import MoleculeRecord, PackedBatch, bucket_for
from conan_fgw_tpu.parallel import mesh as mesh_lib
from conan_fgw_tpu.train import metrics as metrics_lib

log = logging.getLogger("conan_fgw_tpu")

# eval-guard outlier threshold, in label standard deviations. The run-2
# ViSNet divergence emitted ~1.5e9 on ~N(0,1) labels (>1e9 sigmas); 50 is
# far outside anything a trained regressor produces legitimately while
# never triggering on ordinary bad fits (whose predictions stay within a
# few label sigmas).
GUARD_SIGMAS = 50.0


@dataclasses.dataclass
class TrainSettings:
    """Optimisation settings; defaults mirror the reference regression task."""

    learning_rate: float = 5e-4
    num_epochs: int = 80
    batch_size: int = 24
    grad_clip: float = 1.0
    plateau_patience: int = 10
    plateau_factor: float = 0.8
    es_patience: int = 50
    es_min_delta: float = 1e-4
    task: str = "regression"
    use_barycenter: bool = False
    loss_scale: float | None = None  # classification class-weight ratio
    trade_off: bool = False
    monitor: str = "val_mse"  # val_mse | val_auroc | val_mean
    seed: int = 5
    shuffle: bool = False  # reference DataLoaders do not shuffle
    max_atoms: int | None = None
    # atom-count-bucketed batching (SURVEY §7): group molecules by padded
    # size so each compiled step wastes minimal N²-padding work. At most
    # len(buckets) shapes reach XLA. Changes batch composition vs the
    # reference's sequential order (metrics are order-invariant).
    bucketed: bool = True
    # micro-batch accumulation (the reference defines but never registers its
    # GradientAccumulationScheduler; off by default for parity)
    accumulate_steps: int = 1
    # dispatch-amortised training: runs of same-shape batches are stacked and
    # executed as ONE ``lax.scan`` of this many train steps per device
    # dispatch. Same step order and math as the per-step path (the scan body
    # IS the train step) — numerically equivalent, though XLA may schedule
    # the scanned body with float-rounding differences at some weight values,
    # so scan_chunk=0 (the default) is the bit-exactness/parity mode.
    # Setting >1 removes per-step host→device dispatch latency, which
    # dominates wall time on remote/tunneled TPUs (~70ms dispatch vs ~4ms
    # device compute at the sol250 protocol shapes); the sol* protocol
    # configs enable 8 explicitly (`scan_chunk: 8` YAML key). 0/1 disables.
    # Composes with a single-host mesh (chunk sharded over axis 1);
    # multi-process runs always use per-step dispatch.
    scan_chunk: int = 0
    # opt-in eval-side prediction guard (ViSNet stage-2 run-2 divergence,
    # RESULTS.md round-4 †: one molecule deterministically emits a ~1.5e9
    # prediction through a 1e11 trunk activation). When on, evaluate()
    # flags non-finite predictions and regression predictions further than
    # GUARD_SIGMAS label-standard-deviations from the label mean, reports
    # the count as `pred_outliers` (+ guarded mse/rmse excluding them) in
    # the metrics, and warns with the offending indices — silent-garbage
    # detection, not silent exclusion: the unguarded rmse stays reported.
    eval_guard: bool = False
    # scan-chunking for the barycenter stage. Round 3 observed one anecdote
    # of a 2-step scanned stage-2 chunk taking 339s on the tunneled v5e and
    # gated this off; the round-4 probe (scripts/probe_scan_barycenter.py,
    # PARITY.md) could not reproduce it — measured scan8 = 8.9 ms/step vs
    # 10.0 ms/step per-step, compiles ~11 s — so the anecdote was transient
    # tunnel degradation and the barycenter stage now scans by default.
    # Set False to force the per-step dispatch path for stage 2 only.
    scan_barycenter: bool = True


class TrainState(train_state.TrainState):
    pass


def _to_device_batch(pb: PackedBatch, mesh=None) -> PackedBatch:
    arrays = dataclasses.asdict(pb)
    if mesh is not None:
        arrays = mesh_lib.shard_batch(arrays, mesh)
    else:
        arrays = jax.tree.map(jnp.asarray, arrays)
    return PackedBatch(**arrays)


def _to_device_chunk(pb: PackedBatch, mesh=None) -> PackedBatch:
    """Stacked ``(chunk, B, ...)`` batch: molecule axis (1) sharded, scan
    axis whole — the scan-chunk analogue of ``_to_device_batch``."""
    arrays = dataclasses.asdict(pb)
    if mesh is not None:
        arrays = mesh_lib.shard_chunk_batch(arrays, mesh)
    else:
        arrays = jax.tree.map(jnp.asarray, arrays)
    return PackedBatch(**arrays)


def batch_iterator(
    records: Sequence[MoleculeRecord],
    batch_size: int,
    max_atoms: int,
    *,
    shuffle: bool = False,
    rng: np.random.Generator | None = None,
    prefetch: bool = True,
    bucketed: bool = False,
) -> Iterable[PackedBatch]:
    from conan_fgw_tpu.data import loader as loader_lib

    if bucketed:
        buckets = bucket_boundaries(max_atoms)
        if prefetch:
            return loader_lib.prefetched_bucketed_batches(
                records, batch_size, buckets=buckets, shuffle=shuffle, rng=rng
            )
        return loader_lib.bucketed_batches(
            records, batch_size, buckets=buckets, shuffle=shuffle, rng=rng
        )
    if prefetch:
        return loader_lib.prefetched_batches(
            records, batch_size, max_atoms, shuffle=shuffle, rng=rng
        )
    return loader_lib.batches(records, batch_size, max_atoms, shuffle=shuffle, rng=rng)


def bucket_boundaries(max_atoms: int) -> tuple:
    """Bucket ladder capped at ``max_atoms`` (itself always a boundary)."""
    from conan_fgw_tpu.data.packing import DEFAULT_BUCKETS

    return tuple(b for b in DEFAULT_BUCKETS if b < max_atoms) + (max_atoms,)


def dataset_max_atoms(records: Sequence[MoleculeRecord]) -> int:
    return bucket_for(max(r.num_atoms for r in records))


def make_loss_fn(model, settings: TrainSettings) -> Callable:
    def loss_fn(params, batch: PackedBatch):
        pred, muts = model.apply(
            params, batch, use_barycenter=settings.use_barycenter,
            mutable=["diagnostics"],
        )
        # Sinkhorn numerical-failure counter from the FGW solver (rolled-back
        # coupling solves this batch; 0 when the barycenter branch is off)
        sown = muts.get("diagnostics", {}).get("fgw_diverged", (jnp.int32(0),))
        n_div = jnp.sum(jnp.asarray(sown[0]))
        y = batch.y[:, None]
        w = batch.mol_mask.astype(pred.dtype)[:, None]
        denom = jnp.maximum(jnp.sum(w), 1.0)
        if settings.task == "regression":
            sq = jnp.where(w > 0, (pred - y) ** 2, 0.0)
            loss = jnp.sum(sq) / denom
        else:
            # stable logit-space BCE (model outputs logits — heads.py): the
            # reference's prob-space F.binary_cross_entropy with its scalar
            # class-weight rescale (common.py:211-217, train_val.py:61-62)
            # equals scale * mean(bce); computing from logits keeps the
            # gradient alive where sigmoid saturates in f32
            z = pred
            bce = jnp.maximum(z, 0.0) - z * y + jnp.log1p(jnp.exp(-jnp.abs(z)))
            scale = settings.loss_scale if settings.loss_scale is not None else 1.0
            loss = scale * jnp.sum(jnp.where(w > 0, bce, 0.0)) / denom
        return loss, (pred, n_div)

    return loss_fn


def make_optimizer(settings: TrainSettings) -> optax.GradientTransformation:
    tx = optax.chain(
        optax.clip_by_global_norm(settings.grad_clip),
        optax.inject_hyperparams(optax.adam)(learning_rate=settings.learning_rate),
    )
    if settings.accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=settings.accumulate_steps)
    return tx


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    def update_chain(opt_state):
        parts = list(opt_state)
        inner = parts[1]
        parts[1] = inner._replace(
            hyperparams={**inner.hyperparams, "learning_rate": jnp.asarray(lr, jnp.float32)}
        )
        return tuple(parts)

    o = state.opt_state
    if isinstance(o, optax.MultiStepsState):
        return state.replace(opt_state=o._replace(inner_opt_state=update_chain(o.inner_opt_state)))
    return state.replace(opt_state=update_chain(o))


def make_step_fns(model, settings: TrainSettings):
    """Jitted (train_step, eval_step).

    ``train_step(state, batch) -> (state, loss, n_diverged)`` and
    ``eval_step(params, batch) -> (loss, pred, n_diverged)`` where
    ``n_diverged`` counts FGW coupling solves whose Sinkhorn iterations hit
    numerical failures and rolled back this batch (reference
    ``sinkhorn.py:262-274``; always 0 when the barycenter branch is off).
    """
    loss_fn = make_loss_fn(model, settings)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: PackedBatch):
        (loss, (_, n_div)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch
        )
        return state.apply_gradients(grads=grads), loss, n_div

    @jax.jit
    def eval_step(params, batch: PackedBatch):
        loss, (pred, n_div) = loss_fn(params, batch)
        return loss, pred, n_div

    return train_step, eval_step


def make_multi_step(model, settings: TrainSettings):
    """``multi_step(state, batches) -> (state, losses, n_divs)``: a
    ``lax.scan`` of the train step over a stacked batch (leading axis =
    steps). One device dispatch per chunk instead of per step; the scan body
    is exactly the single-step computation, so step order and math are
    unchanged (see ``TrainSettings.scan_chunk`` for the compiler-rounding
    caveat)."""
    loss_fn = make_loss_fn(model, settings)

    @partial(jax.jit, donate_argnums=(0,))
    def multi_step(state: TrainState, batches: PackedBatch):
        def body(st, batch):
            (loss, (_, n_div)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                st.params, batch
            )
            return st.apply_gradients(grads=grads), (loss, n_div)

        state, (losses, divs) = jax.lax.scan(body, state, batches)
        return state, losses, divs

    return multi_step


def _stack_batches(pbs: Sequence[PackedBatch]) -> PackedBatch:
    names = [f.name for f in dataclasses.fields(PackedBatch)]
    return PackedBatch(**{n: np.stack([getattr(pb, n) for pb in pbs]) for n in names})


def make_eval_scan(model, settings: TrainSettings):
    """``eval_scan(params, batches) -> (losses, preds, n_divs)`` over a
    stacked batch (leading axis = steps): the eval analogue of
    ``make_multi_step`` — one dispatch per chunk of eval batches."""
    loss_fn = make_loss_fn(model, settings)

    @jax.jit
    def eval_scan(params, batches: PackedBatch):
        def body(carry, batch):
            loss, (pred, n_div) = loss_fn(params, batch)
            return carry, (loss, pred, n_div)

        _, outs = jax.lax.scan(body, None, batches)
        return outs

    return eval_scan


def init_state(model, settings: TrainSettings, sample_batch: PackedBatch, rng_seed=0):
    # jit the init: eager tracing dispatches hundreds of tiny ops, which is
    # painfully slow on remote/tunneled devices
    init_fn = jax.jit(lambda rng, b: model.init(rng, b, use_barycenter=True))
    params = init_fn(jax.random.PRNGKey(rng_seed), sample_batch)
    # drop sown diagnostics (int counters) from the differentiated tree;
    # apply() re-creates the collection via mutable=["diagnostics"]
    params = {k: v for k, v in params.items() if k != "diagnostics"}
    tx = make_optimizer(settings)
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx)


def evaluate(
    eval_step, params, records, settings: TrainSettings, max_atoms: int, mesh=None,
    eval_scan=None,
):
    """Full-split predictions + loss (the reference's global-gather metric path).

    Device arrays are collected asynchronously and fetched once at the end —
    one host↔device sync per split instead of one per batch. When
    ``eval_scan`` is given (single-process runs), chunks of same-shape eval
    batches additionally collapse into one scanned dispatch each (the eval
    analogue of ``scan_chunk`` training).
    """
    multihost = jax.process_count() > 1
    use_scan = (
        eval_scan is not None and settings.scan_chunk > 1 and not multihost
    )
    entries, valids, ys = [], [], []  # entry: ("single", out) | ("chunk", outs)
    buf: list = []
    for pb in batch_iterator(
        records, settings.batch_size, max_atoms, bucketed=settings.bucketed
    ):
        valids.append(pb.mol_mask.copy())
        ys.append(pb.y.copy())
        if not use_scan:
            entries.append(("single", eval_step(params, _to_device_batch(pb, mesh))))
            continue
        if buf and buf[0].z.shape != pb.z.shape:
            for b in buf:
                entries.append(("single", eval_step(params, _to_device_batch(b, mesh))))
            buf = []
        buf.append(pb)
        if len(buf) == settings.scan_chunk:
            stacked = _to_device_chunk(_stack_batches(buf), mesh)
            entries.append(("chunk", eval_scan(params, stacked)))
            buf = []
    for b in buf:
        entries.append(("single", eval_step(params, _to_device_batch(b, mesh))))
    device_out = [e[1] for e in entries if e[0] == "single"]  # multihost: all
    if multihost:
        # predictions are global jax Arrays spanning all hosts; bring them to
        # every host (the reference's DDP all_gather, common.py:307-333,
        # generalised). Masks/labels are host-side copies of the global batch
        # every process already packed — no cross-host concat needed.
        # Batched fetch: every eval batch has the same padded (batch_size, 1)
        # prediction shape, so the whole split is stacked on device and
        # gathered in O(1) collective rounds — not one blocking
        # process_allgather per batch (a real bottleneck on GEOM-sized splits).
        from conan_fgw_tpu.parallel import collectives

        losses_h = collectives.gather_to_host(jnp.stack([l for l, _, _ in device_out]))
        preds_h = collectives.gather_to_host(jnp.stack([p for _, p, _ in device_out]))
        divs_h = collectives.gather_to_host(jnp.stack([d for _, _, d in device_out]))
        fetched = list(zip(losses_h, preds_h, divs_h))
    else:
        raw = jax.device_get([out for _, out in entries])
        fetched = []
        for (kind, _), out in zip(entries, raw):
            if kind == "single":
                fetched.append(out)
            else:  # flatten the scanned chunk back to per-batch tuples
                losses_c, preds_c, divs_c = out
                fetched.extend(zip(losses_c, preds_c, divs_c))
    preds = [np.asarray(p).reshape(-1)[v] for (_, p, _), v in zip(fetched, valids)]
    losses = [float(np.mean(l)) for l, _, _ in fetched]
    n_div = int(np.sum([np.asarray(d) for _, _, d in fetched]))
    pred = np.concatenate(preds)
    y = np.concatenate([yy[v] for yy, v in zip(ys, valids)])
    out = {"loss": float(np.mean(losses))}
    if n_div:
        log.warning("FGW solver: %d Sinkhorn-diverged coupling solves rolled "
                    "back during evaluation", n_div)
    if settings.eval_guard:
        bad = ~np.isfinite(pred)
        if settings.task == "regression":
            scale = max(float(np.std(y)), 1e-6)
            bad |= np.abs(pred - float(np.mean(y))) > GUARD_SIGMAS * scale
        out["pred_outliers"] = int(bad.sum())
        if bad.any():
            log.warning(
                "eval guard: %d outlier prediction(s) at split indices %s "
                "(max |pred| %.3e vs label scale %.3e) — guarded metrics "
                "exclude them, unguarded metrics keep them",
                int(bad.sum()), np.flatnonzero(bad)[:16].tolist(),
                float(np.max(np.abs(pred[bad]))), float(np.std(y)),
            )
            if settings.task == "regression" and (~bad).any():
                out["mse_guarded"] = metrics_lib.mse(pred[~bad], y[~bad])
                out["rmse_guarded"] = metrics_lib.rmse(pred[~bad], y[~bad])
    if settings.task == "regression":
        out["mse"] = metrics_lib.mse(pred, y)
        out["rmse"] = metrics_lib.rmse(pred, y)
    else:
        try:
            out.update(metrics_lib.classification_metrics(pred, y, settings.trade_off))
        except ValueError:  # single-class split
            log.warning(
                "eval split contains a single class (%d positives of %d); "
                "reporting auroc=prc=0.5 — check the split",
                int((y == 1).sum()), len(y),
            )
            out.update({"auroc": 0.5, "prc": 0.5})
    return out, pred, y


def _call_provider(provider: Callable, epoch: int):
    """Invoke a per-epoch records provider, passing the epoch when its
    signature accepts one (so datasets can key conformer resampling on it —
    deterministic and host-identical, see ``data.datasets.resample_rng``)."""
    import inspect

    try:
        takes_epoch = bool(inspect.signature(provider).parameters)
    except (TypeError, ValueError):
        takes_epoch = False
    return provider(epoch) if takes_epoch else provider()


@dataclasses.dataclass
class FitResult:
    best_metric: float
    best_epoch: int
    history: list
    state: TrainState


def fit(
    model,
    settings: TrainSettings,
    train_records: Sequence[MoleculeRecord] | Callable[[], Sequence[MoleculeRecord]],
    val_records: Sequence[MoleculeRecord],
    *,
    state: TrainState | None = None,
    mesh=None,
    checkpointer=None,
    log_every: int = 1,
    resume: bool = False,
) -> FitResult:
    """Epoch loop with plateau LR, early stopping, and best-checkpoint tracking.

    ``train_records`` may be a callable returning a fresh record list: it is
    invoked once per epoch, so datasets whose conformer stores hold more than
    K conformers re-draw the K-subset every epoch — the reference's
    per-``__getitem__`` resampling semantics (``datasets.py:150-168``).

    ``resume=True`` restarts an interrupted run from the checkpointer's last
    epoch boundary (optimiser + schedule state included) — the rebuild's
    fault-tolerance story (SURVEY §5: driver restarts + checkpoint resume).
    """
    epoch_records = (
        _call_provider(train_records, 0) if callable(train_records) else train_records
    )
    max_atoms = settings.max_atoms or dataset_max_atoms(list(epoch_records) + list(val_records))
    first = next(
        iter(
            batch_iterator(
                epoch_records, settings.batch_size, max_atoms, bucketed=settings.bucketed
            )
        )
    )
    if state is None:
        state = init_state(model, settings, _to_device_batch(first, mesh), settings.seed)
    train_step, eval_step = make_step_fns(model, settings)
    # dispatch-amortised chunked training (see TrainSettings.scan_chunk).
    # Composes with a single-host mesh since r5: the stacked chunk shards
    # its molecule axis (axis 1) over the data axis and the scan of sharded
    # steps compiles to one dispatch (VERDICT r4 #2 — the flagship stage-2
    # exists for multi-device runs). The multi-host global-batch stream
    # keeps the per-step path — its batches are globally-sharded jax Arrays
    # assembled per step with make_array_from_process_local_data.
    use_scan = (
        settings.scan_chunk > 1 and jax.process_count() == 1
        and (not settings.use_barycenter or settings.scan_barycenter)
    )
    multi_step = make_multi_step(model, settings) if use_scan else None
    eval_scan = make_eval_scan(model, settings) if use_scan else None

    plateau = metrics_lib.ReduceLROnPlateau(
        settings.learning_rate, settings.plateau_factor, settings.plateau_patience
    )
    stopper = metrics_lib.EarlyStopping(settings.es_patience, settings.es_min_delta)
    mode_max = settings.monitor in ("val_auroc", "val_mean", "val_prc")
    best = -np.inf if mode_max else np.inf
    best_epoch = -1
    history = []
    start_epoch = 0

    if resume and checkpointer is not None and checkpointer.has("last_state"):
        state, meta = checkpointer.restore_state(state)
        loop_meta = meta.get("loop", {})
        start_epoch = meta["epoch"] + 1
        plateau.lr = loop_meta.get("lr", plateau.lr)
        plateau.best = loop_meta.get("plateau_best", plateau.best)
        plateau.num_bad = loop_meta.get("plateau_num_bad", plateau.num_bad)
        stopper.best = loop_meta.get("stopper_best", stopper.best)
        stopper.num_bad = loop_meta.get("stopper_num_bad", stopper.num_bad)
        best = loop_meta.get("best", best)
        best_epoch = loop_meta.get("best_epoch", best_epoch)
        history = loop_meta.get("history", [])
        state = set_learning_rate(state, plateau.lr)
        log.info("resumed from epoch %d (lr=%.2e)", start_epoch, plateau.lr)

    for epoch in range(start_epoch, settings.num_epochs):
        t0 = time.time()
        if epoch != 0 and callable(train_records):
            # fresh K-subset of conformers, keyed on the epoch (so a resumed
            # run reproduces any epoch's draw without replaying the stream)
            epoch_records = _call_provider(train_records, epoch)
        train_losses = []
        train_divs = []

        def run_single(state, pb):
            state, loss, n_div = train_step(state, _to_device_batch(pb, mesh))
            train_losses.append(loss)
            train_divs.append(n_div)
            return state

        # data order keyed on (seed, epoch): resume reproduces the order of
        # any epoch without replaying the rng stream
        epoch_rng = np.random.default_rng([settings.seed, epoch])
        buf: list = []
        for pb in batch_iterator(
            epoch_records, settings.batch_size, max_atoms,
            shuffle=settings.shuffle, rng=epoch_rng, bucketed=settings.bucketed,
        ):
            if multi_step is None:
                state = run_single(state, pb)
                continue
            if buf and buf[0].z.shape != pb.z.shape:
                # bucket-shape change: drain the (sub-chunk) run per-step
                for b in buf:
                    state = run_single(state, b)
                buf = []
            buf.append(pb)
            if len(buf) == settings.scan_chunk:
                stacked = _to_device_chunk(_stack_batches(buf), mesh)
                state, losses, divs = multi_step(state, stacked)
                train_losses.append(losses)
                train_divs.append(divs)
                buf = []
        for b in buf:  # epoch tail shorter than one chunk
            state = run_single(state, b)
        train_loss = float(
            np.mean(np.concatenate([np.atleast_1d(np.asarray(l)) for l in train_losses]))
        )
        epoch_divs = int(
            np.sum(np.concatenate([np.atleast_1d(np.asarray(d)) for d in train_divs]))
        )
        if epoch_divs:
            # the reference warns per occurrence (sinkhorn.py:434-438); here
            # the jitted solver rolls back silently and we surface the count
            log.warning(
                "FGW solver: %d Sinkhorn-diverged coupling solves rolled back "
                "in epoch %d", epoch_divs, epoch,
            )

        val_metrics, _, _ = evaluate(
            eval_step, state.params, val_records, settings, max_atoms, mesh,
            eval_scan=eval_scan,
        )
        val_loss = val_metrics["loss"]
        row = {
            "epoch": epoch,
            "train_loss": train_loss,
            "lr": plateau.lr,
            "fgw_diverged": epoch_divs,
            "epoch_time_s": time.time() - t0,
            **{f"val_{k}": v for k, v in val_metrics.items() if k != "loss"},
            "val_loss": val_loss,
        }
        history.append(row)
        if epoch % log_every == 0:
            log.info(
                "epoch %d train_loss=%.5f val_loss=%.5f %s lr=%.2e (%.1fs)",
                epoch, train_loss, val_loss,
                " ".join(f"val_{k}={v:.5f}" for k, v in val_metrics.items() if k != "loss"),
                plateau.lr, row["epoch_time_s"],
            )

        monitored = row.get(settings.monitor)
        if monitored is not None:
            improved = monitored > best if mode_max else monitored < best
            if improved:
                best = monitored
                best_epoch = epoch
                if checkpointer is not None:
                    checkpointer.save_best(state, epoch, {settings.monitor: monitored})
        state = set_learning_rate(state, plateau.step(val_loss))
        should_stop = stopper.step(val_loss)
        if checkpointer is not None:
            checkpointer.save_last(state, epoch)
            checkpointer.save_state(
                state, epoch,
                {
                    "lr": plateau.lr,
                    "plateau_best": plateau.best,
                    "plateau_num_bad": plateau.num_bad,
                    "stopper_best": stopper.best,
                    "stopper_num_bad": stopper.num_bad,
                    "best": float(best),
                    "best_epoch": best_epoch,
                    "history": history,
                },
            )
        if should_stop:
            log.info("early stopping at epoch %d", epoch)
            break

    return FitResult(best_metric=float(best), best_epoch=best_epoch, history=history, state=state)
