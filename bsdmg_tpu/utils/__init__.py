from bsdmg_tpu.utils.timing import Timer, block_and_time
from bsdmg_tpu.utils.logging import get_logger

__all__ = ["Timer", "block_and_time", "get_logger"]
