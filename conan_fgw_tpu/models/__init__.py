"""Neural model zoo: 3D GNN backbones, 2D GAT branch, fusion heads."""
