"""Experiment logging: file + console handlers, main-process gating.

Mirrors the reference's per-experiment logging setup
(/root/reference/nexar_train.py:826-855) with the rank-0 gating of the
distributed engine (/root/reference/distributed_video_classifier.py:263-292)
expressed as a process-index check.
"""

from __future__ import annotations

import logging
import os
import sys
from typing import Optional

import jax


def is_main_process() -> bool:
    return jax.process_index() == 0


def setup_logging(run_dir: Optional[str] = None, name: str = "vcd",
                  level: int = logging.INFO,
                  main_only: bool = True) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(level)
    logger.handlers.clear()
    logger.propagate = False

    if main_only and not is_main_process():
        logger.addHandler(logging.NullHandler())
        return logger

    fmt = logging.Formatter(
        "%(asctime)s [proc %(process)d] %(levelname)s %(message)s",
        datefmt="%H:%M:%S",
    )
    console = logging.StreamHandler(sys.stdout)
    console.setFormatter(fmt)
    logger.addHandler(console)
    if run_dir:
        os.makedirs(run_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(run_dir, "training.log"))
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger
