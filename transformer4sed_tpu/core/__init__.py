from transformer4sed_tpu.core.codec import LabelCodec
from transformer4sed_tpu.core.filters import median_filter, max_filter, apply_class_filter
from transformer4sed_tpu.core import losses, ramps, schedules
from transformer4sed_tpu.core.pooling_math import linear_softmax_pool
from transformer4sed_tpu.core.ema import ema_update

__all__ = [
    "LabelCodec",
    "median_filter",
    "max_filter",
    "apply_class_filter",
    "losses",
    "ramps",
    "schedules",
    "linear_softmax_pool",
    "ema_update",
]
