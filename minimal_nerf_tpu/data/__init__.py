"""Data layer: Blender-synthetic scenes, ray sampling, toy photo datasets."""

from minimal_nerf_tpu.data.synthetic import (  # noqa: F401
    SyntheticDataModule,
    SyntheticDataset,
    SyntheticScene,
    gather_pixels,
    getSyntheticDataloader,
    pack_images,
    sample_random_coordinates,
)
from minimal_nerf_tpu.data.photo import (  # noqa: F401
    PhotoDataset,
    ValDataset,
    getPhotoDataloader,
    getValDataloader,
)
