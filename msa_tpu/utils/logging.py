"""Structured logging (replaces the reference's #ifdef DEBUG prints).

The reference compiled scheduling-decision prints in and out with
``#ifdef DEBUG`` (``parallel2.cpp`` onward, SURVEY.md §5); here logging is a
runtime switch with process-rank context for multi-host runs.
"""

from __future__ import annotations

import logging
import os
import sys


def get_logger(name: str = "msa_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    handler = logging.StreamHandler(sys.stderr)
    rank = ""
    try:
        import jax

        if jax.process_count() > 1:
            rank = f"[p{jax.process_index()}]"
    except Exception:
        pass
    handler.setFormatter(
        logging.Formatter(
            f"%(asctime)s %(levelname).1s {rank} %(name)s: %(message)s"
        )
    )
    logger.addHandler(handler)
    level = os.environ.get("MSA_TPU_LOG", "WARNING").upper()
    logger.setLevel(getattr(logging, level, logging.WARNING))
    return logger
