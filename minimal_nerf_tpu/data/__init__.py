"""Data layer: Blender-synthetic scenes, ray sampling, toy photo datasets."""

from minimal_nerf_tpu.data.synthetic import (  # noqa: F401
    SyntheticDataModule,
    SyntheticDataset,
    SyntheticScene,
    sample_random_coordinates,
)
from minimal_nerf_tpu.data.photo import PhotoDataset, ValDataset  # noqa: F401
