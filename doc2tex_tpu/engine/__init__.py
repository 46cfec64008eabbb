from .training import init_training, train
from .inferencing import validation

__all__ = ["init_training", "train", "validation"]
