from .augment import normalize, train_augment
from .geometry import geometry_transform
from .preprocess import resize_for_inference

__all__ = [
    "normalize",
    "train_augment",
    "geometry_transform",
    "resize_for_inference",
]
