from .priors import MATH_GTDB_512, make_priors
from .ssd import SSD512
from .boxes import decode_boxes, nms_fixed, batched_detect
from .windows import rolling_windows, unmap_boxes

__all__ = [
    "MATH_GTDB_512",
    "make_priors",
    "SSD512",
    "decode_boxes",
    "nms_fixed",
    "batched_detect",
    "rolling_windows",
    "unmap_boxes",
]
