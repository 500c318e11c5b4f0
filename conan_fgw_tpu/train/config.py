"""YAML experiment configuration, compatible with the reference's config files.

The reference parses YAML with jsonargparse and instantiates the
``experiment:`` dotted class path into a registry dataclass binding
(dataset, datamodule, model) triples (``conan_fgw/src/config_parser.py:37-61``,
``src/experiments.py:20-80``). Here the same YAML files parse directly:
reference class paths map onto an experiment registry describing task type,
barycenter usage, and dataset flavour.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import yaml


@dataclasses.dataclass(frozen=True)
class ExperimentSpec:
    """What the reference's experiment dataclasses encode, TPU-side."""

    task: str  # "regression" | "classification"
    barycenter: bool  # stage-2 model uses the FGW branch
    dataset: str = "conformers"  # "conformers" | "geom" | "smiles"
    model: str = "conan"  # fusion head family


EXPERIMENTS: dict[str, ExperimentSpec] = {
    # reference dotted paths (config-file compatibility)
    "conan_fgw.src.experiments.SOTAExperiment": ExperimentSpec("regression", False),
    "conan_fgw.src.experiments.SOTAExperimentBaryCenter": ExperimentSpec("regression", True),
    "conan_fgw.src.experiments.SOTAClassificationExperiment": ExperimentSpec(
        "classification", False
    ),
    "conan_fgw.src.experiments.SOTAClassificationExperimentBaryCenter": ExperimentSpec(
        "classification", True
    ),
    "conan_fgw.src.experiments.SOTAClassificationGEOMExperiment": ExperimentSpec(
        "classification", False, dataset="geom"
    ),
    "conan_fgw.src.experiments.SOTAClassificationGEOMExperimentBaryCenter": ExperimentSpec(
        "classification", True, dataset="geom"
    ),
    "conan_fgw.src.experiments.TrialsExperiment": ExperimentSpec("regression", False),
    "conan_fgw.src.experiments.DimeNetGEOMExperiment": ExperimentSpec(
        "regression", False, dataset="geom"
    ),
    "conan_fgw.src.experiments.GATExperiment": ExperimentSpec(
        "regression", False, model="gat_only"
    ),
    # native short names
    "regression": ExperimentSpec("regression", False),
    "regression_bc": ExperimentSpec("regression", True),
    "classification": ExperimentSpec("classification", False),
    "classification_bc": ExperimentSpec("classification", True),
    # aux-head families (the reference reaches these through its model
    # registry, common.py:469-547 + baseline/schnet_based heads); each maps
    # to a head in models/aux_heads.py via runner.build_model
    "gat_only": ExperimentSpec("regression", False, model="gat_only"),
    "scalars": ExperimentSpec("regression", False, model="scalars"),
    "embeddings": ExperimentSpec("regression", False, model="embeddings"),
    "covalent": ExperimentSpec("regression", False, model="covalent"),
    "attention": ExperimentSpec("regression", False, model="attention"),
    "esan_avg_conf": ExperimentSpec("regression", False, model="esan:avg_conf_esan"),
    "esan_geometry": ExperimentSpec(
        "regression", False, model="esan:geometry_induced_esan"
    ),
    "esan_geometry_2d": ExperimentSpec(
        "regression", False, model="esan:geometry_2d_induced_esan"
    ),
}


@dataclasses.dataclass
class ExperimentConfig:
    """Typed view of one YAML config (keys per ``config_parser.py:37-61``)."""

    dataset_name: list
    target: list
    num_conformers: int
    batch_size: int
    experiment: str
    num_epochs: int
    learning_rate: float
    es_min_delta: float = 1e-4
    es_patience: int = 50
    disable_distribution: bool = False
    dummy_size: int = -1
    prune_conformers: bool = False
    use_lr_finder: bool = False
    use_wandb: bool = False
    agg_weight: float = 0.2
    max_iter: int = 100  # NOTE: the reference hardcodes 5 in the hot path
    epsilon: float = 0.1
    # opt-in: thread the YAML's max_iter/epsilon into the FGW solver. The
    # reference never does — its values are swallowed before reaching
    # _compute_barycenter (schnet_no_sum.py:294-300, SURVEY §5 config trap) —
    # so False (the hardcoded 5/5/5, eps=0.1 parity behaviour) is the default.
    fgw_from_config: bool = False
    # TPU-native solver-budget overrides (the reference has no knobs for the
    # inner loops at all — numItermax/sinkhorn iters are hardcoded 5): when
    # set, these override FGWConfig.pgd_iters / sinkhorn_iters directly.
    fgw_pgd_iters: Optional[int] = None
    fgw_sinkhorn_iters: Optional[int] = None
    trade_off: bool = False
    model_name: str = "schnet"
    # TPU-native extensions
    max_atoms: Optional[int] = None
    bary_pad_mode: str = "reference"
    neighbor_cap_mode: str = "index"
    # None = auto: fused Pallas cfconv on TPU f32/bf16 trunks, XLA elsewhere
    # (models/schnet.py:142-157); true/false forces
    use_pallas_cfconv: Optional[bool] = None
    # fused Pallas FGW coupling solver (ops/pallas/fgw.py; square-loss PGD
    # stop-grad path only — other solver configs keep XLA). None = auto:
    # on for TPU (1.69x the XLA solver), off elsewhere; true/false forces
    use_pallas_fgw: Optional[bool] = None
    # bfloat16 GNN trunk (params/FGW solver stay f32): full MXU rate on the
    # cfconv filter MLPs at ~0.6% output deviation
    compute_dtype: str = "float32"
    # dispatch-amortised scan-chunked training (TrainSettings.scan_chunk);
    # 0 = per-step bit-exact parity path, the default. Protocol configs set 8.
    scan_chunk: int = 0
    # opt-in eval-side non-finite/outlier prediction guard (the ViSNet
    # stage-2 run-2 divergence detector — TrainSettings.eval_guard)
    eval_guard: bool = False

    @property
    def spec(self) -> ExperimentSpec:
        try:
            return EXPERIMENTS[self.experiment]
        except KeyError:
            raise KeyError(
                f"unknown experiment {self.experiment!r}; known: {sorted(EXPERIMENTS)}"
            )


def load_config(path: str, **overrides) -> ExperimentConfig:
    with open(path) as f:
        raw = yaml.safe_load(f)
    es = raw.pop("early_stopping", {}) or {}
    raw.setdefault("es_min_delta", es.get("min_delta", 1e-4))
    raw.setdefault("es_patience", es.get("patience", 50))
    known = {f.name for f in dataclasses.fields(ExperimentConfig)}
    raw = {k: v for k, v in raw.items() if k in known}
    raw.update(overrides)
    return ExperimentConfig(**raw)
