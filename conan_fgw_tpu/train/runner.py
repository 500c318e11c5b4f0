"""Experiment runner: the two-stage N-run pipeline.

Equivalent of ``conan_fgw/src/train_val.py``: for each of ``number_of_runs``
runs, build the model, (stage ``conan_fgw``) warm-start from stage
``conan_fgw_pre``'s best checkpoint, fit with early stopping, evaluate the
best checkpoint on the test split, and aggregate mean±std across runs.

Usage (CLI):
    python -m conan_fgw_tpu.train.runner --config <yaml> --stage conan_fgw_pre ...
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import os
from typing import Callable, Sequence

import numpy as np

from conan_fgw_tpu.data.datasets import ConformerDataset, class_weight_ratio
from conan_fgw_tpu.models.heads import ConanModel
from conan_fgw_tpu.ops.fgw import FGWConfig
from conan_fgw_tpu.train import loop as loop_lib
from conan_fgw_tpu.train.checkpoints import RunCheckpointer
from conan_fgw_tpu.train.config import ExperimentConfig, load_config
from conan_fgw_tpu.utils.runlog import AverageRuns, build_logger

log = logging.getLogger("conan_fgw_tpu")

STAGE_PRE = "conan_fgw_pre"
STAGE_BC = "conan_fgw"


def build_aux_model(spec_model: str, hidden: int):
    """Non-conan head families (``ExperimentSpec.model``): the reference's
    GAT-only / baseline heads (``src/model/baseline_models.py:6-17``,
    ``schnet_based_models.py:48-81,420-474,495-533``) and ESAN variants."""
    from conan_fgw_tpu.models import aux_heads

    if spec_model.startswith("esan:"):
        return aux_heads.ESANAggregation(
            variant=spec_model.split(":", 1)[1], hidden_channels=hidden
        )
    heads = {
        "gat_only": aux_heads.EmbeddingsWithGAT,
        "scalars": aux_heads.ScalarsAggregation,
        "embeddings": aux_heads.EmbeddingsAggregation,
        "covalent": aux_heads.CovalentEmbeddingsAggregation,
        "attention": aux_heads.AttentionEmbeddingsAggregation,
    }
    try:
        return heads[spec_model](hidden_channels=hidden)
    except KeyError:
        raise ValueError(
            f"unknown experiment model family {spec_model!r}; "
            f"known: conan, esan:<variant>, {sorted(heads)}"
        )


def build_model(config: ExperimentConfig, stage: str):
    spec = config.spec
    hidden = 512 if spec.task == "classification" else 128
    if spec.model != "conan":
        return build_aux_model(spec.model, hidden)
    if config.fgw_from_config:
        # opt-in honor-config mode: the YAML's max_iter/epsilon actually
        # reach the solver (outer barycenter iterations + entropic epsilon)
        fgw = FGWConfig(outer_iters=config.max_iter, epsilon=config.epsilon)
    else:
        # parity default: the reference hardcodes 5/5/5 iterations and
        # epsilon=0.1 regardless of the YAML (schnet_no_sum.py:294-300)
        fgw = FGWConfig()
    if config.fgw_pgd_iters is not None:
        fgw = dataclasses.replace(fgw, pgd_iters=config.fgw_pgd_iters)
    if config.fgw_sinkhorn_iters is not None:
        fgw = dataclasses.replace(fgw, sinkhorn_iters=config.fgw_sinkhorn_iters)
    if config.use_pallas_fgw is not None:
        fgw = dataclasses.replace(fgw, use_pallas_coupling=config.use_pallas_fgw)
    common = dict(
        task=spec.task,
        hidden_channels=hidden,
        agg_weight=config.agg_weight,
        fgw=fgw,
        bary_pad_mode=config.bary_pad_mode,
        use_pallas_cfconv=config.use_pallas_cfconv,
        compute_dtype=config.compute_dtype,
    )
    if config.model_name == "visnet":
        # wrapper defaults: cutoff 5.0; bary branch shifts +1.0 and L2-column
        # normalises the barycenter features (visnet.py:50,233-241)
        return ConanModel(
            backbone_name="visnet", cutoff=5.0, bary_shift=1.0,
            bary_postnorm="l2col", **common,
        )
    if config.model_name == "dimenet":
        # DimeNet solves the barycenter with alpha=0.5 and a *fixed* structure
        # matrix (init_C = first conformer's adjacency) — dimenet.py:235-260
        common["fgw"] = dataclasses.replace(
            common["fgw"], alpha=0.5, fixed_structure=True
        )
        return ConanModel(
            backbone_name="dimenet", cutoff=5.0, bary_shift=0.5, **common
        )
    filters, gaussians = (256, 10) if spec.task == "classification" else (128, 50)
    return ConanModel(
        backbone_name="schnet", num_filters=filters, num_gaussians=gaussians,
        num_interactions=3, cutoff=10.0, **common,
    )


def build_settings(config: ExperimentConfig, stage: str, loss_scale=None) -> loop_lib.TrainSettings:
    spec = config.spec
    task = spec.task
    if task == "classification":
        plateau = dict(plateau_patience=5, plateau_factor=0.5)
        monitor = "val_mean" if config.trade_off else "val_auroc"
    else:
        plateau = dict(plateau_patience=10, plateau_factor=0.8)
        monitor = "val_mse"
    return loop_lib.TrainSettings(
        learning_rate=config.learning_rate,
        num_epochs=config.num_epochs,
        batch_size=config.batch_size,
        task=task,
        use_barycenter=spec.barycenter and stage == STAGE_BC,
        loss_scale=loss_scale,
        trade_off=config.trade_off,
        monitor=monitor,
        es_patience=config.es_patience,
        es_min_delta=config.es_min_delta,
        max_atoms=config.max_atoms,
        scan_chunk=config.scan_chunk,
        eval_guard=config.eval_guard,
        **plateau,
    )


def load_datasets(config: ExperimentConfig, data_dir: str):
    name = config.dataset_name[0]
    target = config.target[0]
    if config.spec.dataset == "geom":
        from conan_fgw_tpu.data.geom import GEOMDataset

        return {
            mode: GEOMDataset(mode, data_dir, name, target, config.num_conformers)
            for mode in ("train", "valid", "test")
        }
    return {
        mode: ConformerDataset(
            mode, data_dir, name, target, config.num_conformers,
            prune_conformers=config.prune_conformers,
        )
        for mode in ("train", "valid", "test")
    }


def run_experiment(
    config: ExperimentConfig,
    *,
    stage: str = STAGE_PRE,
    data_dir: str | None = None,
    number_of_runs: int = 1,
    run_name: str = "run",
    run_id: str = "0",
    models_dir: str = "outputs/models",
    datasets: dict | None = None,
    mesh=None,
    records_provider: Callable[[str], Sequence] | None = None,
    resume: bool = False,
    profile_dir: str | None = None,
    metrics_dir: str | None = None,
    pre_ckpt_dir: str | None = None,
    allow_scratch: bool = False,
):
    """Train/evaluate ``number_of_runs`` times; returns (summary, per-run list).

    ``datasets`` may inject pre-built record lists (tests/benchmarks);
    otherwise they are loaded from ``data_dir`` per the reference layout.
    """
    train_provider = None  # per-epoch record refresh (conformer resampling)
    if datasets is None:
        if records_provider is not None:
            datasets = {m: records_provider(m) for m in ("train", "valid", "test")}
        else:
            ds = load_datasets(config, data_dir)
            datasets = {m: ds[m].records() for m in ("train", "valid", "test")}

            # stores holding more than K conformers re-draw the K-subset every
            # epoch, matching the reference's per-__getitem__ resampling
            # (conan_fgw/src/data/datasets.py:150-168) — keyed on the epoch so
            # every host draws the identical subset (multi-host batches are
            # assembled from all hosts' locally-packed rows)
            def train_provider(epoch: int):
                ds["train"].set_epoch(epoch)
                return ds["train"].records()

    import jax

    if mesh is not None:
        n_dev = mesh.devices.size
        if config.batch_size % n_dev:
            new_bs = ((config.batch_size + n_dev - 1) // n_dev) * n_dev
            log.info(
                "batch_size %d not divisible by %d devices; padding to %d "
                "(extra rows are mol_mask-padded)", config.batch_size, n_dev, new_bs,
            )
            config = dataclasses.replace(config, batch_size=new_bs)
        if jax.process_count() > 1:
            # every host consumes the identical global batch stream (the
            # epoch rng is seeded, so shuffles agree) and device-puts only
            # its devices' row block (mesh.shard_batch). Unlike per-host
            # dataset shards this cannot deadlock on uneven shard sizes or
            # divergent bucket schedules, and training stays bit-identical
            # to single-host.
            log.info(
                "multi-host: global batch stream on %d processes "
                "(per-batch row sharding)", jax.process_count(),
            )

    loss_scale = None
    if config.spec.task == "classification":
        rows = [{"y": r.y} for r in datasets["train"]]
        loss_scale = class_weight_ratio(rows)

    avg = AverageRuns()
    per_run = []
    for run_idx in range(number_of_runs):
        model = build_model(config, stage)
        settings = build_settings(config, stage, loss_scale)
        settings.seed = settings.seed + run_idx
        ckpt_dir = os.path.join(models_dir, run_name, str(run_id), f"run_{stage}:{run_idx}")
        ckpt = RunCheckpointer(ckpt_dir, monitor=settings.monitor)

        state = None
        if stage == STAGE_BC:
            # warm-start checkpoint discovery: the reference's
            # --conan_fgw_pre_ckpt_dir override (train_val.py:175-192) maps to
            # pre_ckpt_dir here; by default stage 1 of the same run_name/run_id
            # is used. pre_ckpt_dir may be the base dir holding the per-run
            # `run_conan_fgw_pre:{i}` subdirs, or one checkpoint dir directly.
            if pre_ckpt_dir is not None:
                candidate = os.path.join(pre_ckpt_dir, f"run_{STAGE_PRE}:{run_idx}")
                pre_dir = candidate if os.path.isdir(candidate) else pre_ckpt_dir
            else:
                pre_dir = os.path.join(
                    models_dir, run_name, str(run_id), f"run_{STAGE_PRE}:{run_idx}"
                )
            pre_ckpt = RunCheckpointer(pre_dir)
            if not pre_ckpt.has("best") and not allow_scratch:
                # the reference hard-fails on a missing stage-1 checkpoint dir
                # (utils.py:55-63 raises on the glob); silent from-scratch
                # training is opt-in via allow_scratch
                raise FileNotFoundError(
                    f"stage-2 warm start: no stage-1 best checkpoint under {pre_dir} "
                    "(run conan_fgw_pre first, pass pre_ckpt_dir, or allow_scratch=True)"
                )
            if pre_ckpt.has("best"):
                max_atoms = settings.max_atoms or loop_lib.dataset_max_atoms(
                    list(datasets["train"]) + list(datasets["valid"])
                )
                settings.max_atoms = max_atoms
                first = next(
                    iter(
                        loop_lib.batch_iterator(
                            datasets["train"], settings.batch_size, max_atoms
                        )
                    )
                )
                state = loop_lib.init_state(
                    model, settings, loop_lib._to_device_batch(first, mesh), settings.seed
                )
                params = pre_ckpt.restore_params(state.params, "best")
                state = state.replace(params=params)
                log.info("warm-started run %d from %s", run_idx, pre_dir)
            else:
                log.warning("no stage-1 checkpoint at %s; training from scratch", pre_dir)

        if config.use_lr_finder and state is None:
            from conan_fgw_tpu.train.lr_finder import lr_find

            found = lr_find(model, settings, list(datasets["train"]), mesh=mesh)
            log.info("lr finder suggestion: %.2e", found["suggestion"])
            settings.learning_rate = found["suggestion"]

        if profile_dir:
            from conan_fgw_tpu.utils.profiling import device_trace

            with device_trace(os.path.join(profile_dir, f"run{run_idx}")):
                result = loop_lib.fit(
                    model, settings, train_provider or datasets["train"],
                    datasets["valid"],
                    state=state, mesh=mesh, checkpointer=ckpt, resume=resume,
                )
        else:
            result = loop_lib.fit(
                model, settings, train_provider or datasets["train"],
                datasets["valid"],
                state=state, mesh=mesh, checkpointer=ckpt, resume=resume,
            )

        # evaluate the best checkpoint on the test split (trainer.test(ckpt_path="best"))
        best_params = (
            ckpt.restore_params(result.state.params, "best")
            if ckpt.has("best")
            else result.state.params
        )
        _, eval_step = loop_lib.make_step_fns(model, settings)
        max_atoms = settings.max_atoms or loop_lib.dataset_max_atoms(
            list(datasets["train"]) + list(datasets["valid"]) + list(datasets["test"])
        )
        eval_scan = (
            loop_lib.make_eval_scan(model, settings)
            if settings.scan_chunk > 1 and mesh is None
            and (not settings.use_barycenter or settings.scan_barycenter)
            else None
        )
        test_metrics, _, _ = loop_lib.evaluate(
            eval_step, best_params, datasets["test"], settings, max_atoms, mesh,
            eval_scan=eval_scan,
        )
        run_metrics = {f"test_{k}": v for k, v in test_metrics.items()}
        run_metrics["best_epoch"] = result.best_epoch
        run_metrics[settings.monitor] = result.best_metric
        if metrics_dir:
            # per-epoch metrics CSV, the Lightning CSVLogger analog
            # (trainer.py:184-197; outputs/metrics layout)
            from conan_fgw_tpu.utils.profiling import PhaseCSVLogger

            csv_path = os.path.join(
                metrics_dir, run_name, str(run_id), f"run_{stage}:{run_idx}", "metrics.csv"
            )
            if os.path.exists(csv_path):  # full history is rewritten each fit
                os.remove(csv_path)
            csv_log = PhaseCSVLogger(csv_path)
            for row in result.history:
                csv_log.log(row)
        avg.register(run_metrics)
        per_run.append({"metrics": run_metrics, "history": result.history})
        log.info("run %d done: %s", run_idx, run_metrics)

    log.info("\n%s", avg.table())
    return avg.summary(), per_run


def main(argv=None):
    ap = argparse.ArgumentParser(description="conan_fgw_tpu experiment runner")
    ap.add_argument("--config", required=True)
    ap.add_argument("--stage", default=STAGE_PRE, choices=[STAGE_PRE, STAGE_BC])
    ap.add_argument("--data_root", default=".")
    ap.add_argument("--number_of_runs", type=int, default=1)
    ap.add_argument("--run_name", default="run")
    ap.add_argument("--run_id", default="0")
    ap.add_argument("--models_dir", default="outputs/models")
    ap.add_argument("--logs_dir", default="outputs/logs")
    ap.add_argument("--metrics_dir", default="outputs/metrics")
    ap.add_argument(
        "--model_name", default=None, choices=[None, "schnet", "visnet", "dimenet"]
    )
    ap.add_argument("--out_json", default=None)
    ap.add_argument(
        "--resume", action="store_true",
        help="continue an interrupted run from its last epoch checkpoint",
    )
    ap.add_argument(
        "--pre_ckpt_dir", default=None,
        help="stage-2 warm-start checkpoint dir override (the reference's "
        "--conan_fgw_pre_ckpt_dir): base dir holding run_conan_fgw_pre:{i} "
        "subdirs, or one checkpoint dir used for every run",
    )
    ap.add_argument(
        "--allow_scratch", action="store_true",
        help="let stage-2 train from scratch when no stage-1 checkpoint exists "
        "(default: hard error, matching the reference)",
    )
    ap.add_argument(
        "--eval_guard", action="store_true",
        help="flag non-finite/outlier predictions at eval time and report "
        "pred_outliers (+ guarded rmse) per run — the ViSNet stage-2 "
        "divergence detector (TrainSettings.eval_guard)",
    )
    ap.add_argument(
        "--profile_dir", default=None,
        help="capture a jax.profiler device trace of the fit into this directory",
    )
    ap.add_argument(
        "--platform",
        default=None,
        help="force a JAX platform (e.g. cpu); needed where a site hook pins TPU",
    )
    ap.add_argument(
        "--num_devices", type=int, default=0,
        help="data-parallel device count: 0 = all local devices (the "
        "reference's stage-2 multi-GPU DDP analog), 1 = single device",
    )
    ap.add_argument(
        "--distributed", action="store_true",
        help="multi-host: call jax.distributed.initialize() before building "
        "the mesh (coordinator from the standard JAX env vars)",
    )
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from conan_fgw_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    overrides = {"model_name": args.model_name} if args.model_name else {}
    if args.eval_guard:
        overrides["eval_guard"] = True
    config = load_config(args.config, **overrides)
    build_logger(
        os.path.join(args.logs_dir, args.run_name, args.run_id, f"run_{args.stage}", "log.txt")
    )

    from conan_fgw_tpu.parallel import mesh as mesh_lib

    if args.distributed:
        mesh_lib.initialize_distributed()
    n_dev = args.num_devices or len(jax.devices())
    mesh = mesh_lib.create_mesh(n_dev) if n_dev > 1 else None
    if mesh is not None:
        log.info(
            "data-parallel mesh: %d devices, %d process(es)",
            mesh.devices.size, jax.process_count(),
        )
    summary, _ = run_experiment(
        config,
        stage=args.stage,
        mesh=mesh,
        data_dir=os.path.join(args.data_root, "data"),
        number_of_runs=args.number_of_runs,
        run_name=args.run_name,
        run_id=args.run_id,
        models_dir=args.models_dir,
        resume=args.resume,
        profile_dir=args.profile_dir,
        metrics_dir=args.metrics_dir,
        pre_ckpt_dir=args.pre_ckpt_dir,
        allow_scratch=args.allow_scratch,
    )
    if args.out_json:
        os.makedirs(os.path.dirname(os.path.abspath(args.out_json)), exist_ok=True)
        with open(args.out_json, "w") as f:
            json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
