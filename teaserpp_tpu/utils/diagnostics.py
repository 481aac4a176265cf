"""Diagnostic logging (reference macros.h:13-60 analog).

The reference compiles ``TEASER_INFO_MSG`` / ``TEASER_DEBUG_INFO_MSG`` /
``TEASER_DEBUG_ERROR_MSG`` / ``TEASER_INFO_MSG_THROTTLE`` in or out with the
``TEASER_DIAG_PRINT`` define. Here the equivalents are thin wrappers over
:mod:`logging` under the ``teaserpp_tpu`` logger — always importable, gated
at runtime by log level (set ``TEASERPP_TPU_DEBUG=1`` to enable debug
output, mirroring the compile flag).
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger("teaserpp_tpu")
if os.environ.get("TEASERPP_TPU_DEBUG"):
    logger.setLevel(logging.DEBUG)
    if not logger.handlers:
        logger.addHandler(logging.StreamHandler())

_throttle_counters: dict = {}


def info_msg(msg: str) -> None:
    """TEASER_INFO_MSG (macros.h:18)."""
    logger.info(msg)


def debug_info_msg(msg: str) -> None:
    """TEASER_DEBUG_INFO_MSG (macros.h:30) — no-op unless debug enabled."""
    logger.debug(msg)


def debug_error_msg(msg: str) -> None:
    """TEASER_DEBUG_ERROR_MSG (macros.h:42)."""
    logger.error(msg)


def info_msg_throttle(msg: str, skip: int, key: str = "") -> None:
    """TEASER_INFO_MSG_THROTTLE (macros.h:52): emit every ``skip``-th call."""
    k = key or msg
    n = _throttle_counters.get(k, 0)
    if n % max(skip, 1) == 0:
        logger.info(msg)
    _throttle_counters[k] = n + 1
