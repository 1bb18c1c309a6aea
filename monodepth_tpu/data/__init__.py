"""Host-side data pipeline: Mars image dataset, augmentation, synthetic data."""

from monodepth_tpu.data.dataset import (  # noqa: F401
    MarsImageDataset,
    get_mars_dataloaders,
    organize_dataset,
)
