from .loss import cross_entropy_loss, label_smoothing_loss, create_criterion
from .optim import create_optimizer
from .schedule import warmup_cosine_schedule

__all__ = [
    "cross_entropy_loss",
    "label_smoothing_loss",
    "create_criterion",
    "create_optimizer",
    "warmup_cosine_schedule",
]
