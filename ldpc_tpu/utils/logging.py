"""Structured logging.

Replaces the reference's bare prints (including the message-GNN forward
pass that prints debug state on every call,
``models/message_gnn_decoder.py:206-310`` — kept there as a deliberate
"debuggability" feature per its progress notes).  Here: a standard
`logging` logger with an opt-in debug-dump flag, so per-stage dumps exist
behind a switch instead of unconditionally.
"""
from __future__ import annotations

import logging
import os
import sys

_FORMAT = "%(asctime)s %(levelname)s %(name)s: %(message)s"


def get_logger(name: str = "ldpc_tpu", level: str | int | None = None) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter(_FORMAT, datefmt="%H:%M:%S"))
        logger.addHandler(handler)
        logger.propagate = False
    if level is None:
        level = os.environ.get("LDPC_TPU_LOG_LEVEL", "INFO")
    logger.setLevel(level)
    return logger


def debug_dumps_enabled() -> bool:
    """Per-stage tensor dumps (shapes/ranges) — the reference's always-on
    prints, gated behind LDPC_TPU_DEBUG_DUMPS=1."""
    return os.environ.get("LDPC_TPU_DEBUG_DUMPS", "0") == "1"
