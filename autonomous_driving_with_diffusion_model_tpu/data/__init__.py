from .augment import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    augment_batch,
    augment_factors,
    normalize_images,
)
from .dataset import Loader, TrajDataset, get_loader

__all__ = [
    "TrajDataset",
    "Loader",
    "get_loader",
    "augment_batch",
    "augment_factors",
    "normalize_images",
    "IMAGENET_MEAN",
    "IMAGENET_STD",
]
