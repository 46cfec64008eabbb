from .buckets import (
    get_divisible_size,
    get_size,
    BucketTable,
    plan_buckets,
    pad_to_bucket,
)

__all__ = [
    "get_divisible_size",
    "get_size",
    "BucketTable",
    "plan_buckets",
    "pad_to_bucket",
]
