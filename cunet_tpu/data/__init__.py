from cunet_tpu.data.augment import (
    color_jitter,
    crop,
    fliplr_image,
    load_image,
    sample_from_bounded_gaussian,
)
from cunet_tpu.data.face import FaceDataset, pts_file_to_landmarks
from cunet_tpu.data.loader import DataLoader, collate, prefetch_to_device
from cunet_tpu.data.mpii import MPIIDataset
from cunet_tpu.data.synthetic import SyntheticLandmarkDataset

__all__ = [
    "DataLoader",
    "FaceDataset",
    "MPIIDataset",
    "SyntheticLandmarkDataset",
    "collate",
    "color_jitter",
    "crop",
    "fliplr_image",
    "load_image",
    "prefetch_to_device",
    "pts_file_to_landmarks",
    "sample_from_bounded_gaussian",
]
