"""Structured logging (the reference uses Bevy ``info!`` lines for stage
transitions and voxel/vertex/triangle counts, src/cuda/mod.rs:132-135,197-201,301)."""

from __future__ import annotations

import logging
import sys


def get_logger(name: str = "bsdmg") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(
            logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s")
        )
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
    return logger
