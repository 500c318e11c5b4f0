"""Backbone factory mirroring the reference's ``EquivModelsHolder.get_model``
(``conan_fgw/src/model/common.py:469-547``) with the same names and
hyper-parameter presets, plus the task-model builders used by the runner."""

from __future__ import annotations

from conan_fgw_tpu.models.dimenet import DimeNet3D
from conan_fgw_tpu.models.esan import (
    AverageConformerESAN,
    Geometry2DInducedESAN,
    GeometryInducedESAN,
)
from conan_fgw_tpu.models.gat import GAT2D
from conan_fgw_tpu.models.schnet import SchNet3D
from conan_fgw_tpu.models.visnet import ViSNet3D


def get_model(name: str, *, feat_dim: int = 128, cutoff: float | None = None):
    """Backbone presets exactly as the reference registry wires them."""
    if name == "simple_schnet":
        return SchNet3D(hidden_channels=128, num_filters=128, num_gaussians=50,
                        num_interactions=6)
    if name == "schnet":
        if cutoff is not None:
            return SchNet3D(hidden_channels=feat_dim, cutoff=cutoff,
                            num_gaussians=10, num_filters=256, num_interactions=3)
        return SchNet3D(hidden_channels=feat_dim, num_interactions=3)
    if name == "schnet_covalent":
        return SchNet3D(use_covalent=True, num_interactions=6)
    if name == "simple_dimenet":
        return DimeNet3D(hidden_channels=3, out_channels=1, num_blocks=1,
                         num_bilinear=1, num_spherical=2, num_radial=1,
                         cutoff=5.0, envelope_exponent=1, num_before_skip=1,
                         num_after_skip=1, num_output_layers=1)
    if name == "dimenet":
        return DimeNet3D(hidden_channels=feat_dim, out_channels=feat_dim // 2,
                         num_blocks=6, num_bilinear=8, num_spherical=2,
                         num_radial=3, cutoff=5.0, envelope_exponent=5,
                         num_before_skip=1, num_after_skip=2, num_output_layers=3)
    if name == "gat":
        return GAT2D(out_channels=feat_dim // 2)
    if name == "visnet":
        return ViSNet3D(hidden_channels=feat_dim)
    if name == "avg_conf_esan":
        return AverageConformerESAN()
    if name == "geometry_induced_esan":
        return GeometryInducedESAN()
    if name == "geometry_2d_induced_esan":
        return Geometry2DInducedESAN()
    raise ValueError(f"unknown model {name!r}")
