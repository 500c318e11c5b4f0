"""Host-side data layer: featurisation, packing, datasets, loaders."""
