from bsdmg_tpu.utils.timing import Timer, block_and_time
from bsdmg_tpu.utils.logging import get_logger
from bsdmg_tpu.utils.containers import BitSet, BoundedArray, vec_maximum, vec_minimum
from bsdmg_tpu.utils.debug import assert_finite, checked_sdf, debug_mode

__all__ = [
    "Timer",
    "block_and_time",
    "get_logger",
    "BitSet",
    "BoundedArray",
    "vec_maximum",
    "vec_minimum",
    "assert_finite",
    "checked_sdf",
    "debug_mode",
]
