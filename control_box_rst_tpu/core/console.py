"""Console logging helpers.

Ref parity: the PRINT_DEBUG/INFO/WARNING/ERROR macro family with _ONCE and
_COND variants (ref: src/core/include/corbo-core/console.h:53-100), and the
global ok()/set_ok() cooperative-cancellation flag
(ref: src/core/include/corbo-core/global.h:43-50) used by long-running tasks.
"""
from __future__ import annotations

import logging
import threading

logger = logging.getLogger("control_box_rst_tpu")

_once_seen: set = set()
_ok_flag = threading.Event()
_ok_flag.set()


def print_debug(msg: str) -> None:
    logger.debug(msg)


def print_info(msg: str) -> None:
    logger.info(msg)


def print_warning(msg: str) -> None:
    logger.warning(msg)


def print_error(msg: str) -> None:
    logger.error(msg)


def _once(key, fn, msg):
    if key not in _once_seen:
        _once_seen.add(key)
        fn(msg)


def print_warning_once(msg: str) -> None:
    """(ref: PRINT_WARNING_ONCE, console.h)"""
    _once(("W", msg), print_warning, msg)


def print_info_once(msg: str) -> None:
    _once(("I", msg), print_info, msg)


def print_error_cond(cond: bool, msg: str) -> None:
    """(ref: PRINT_ERROR_COND, console.h)"""
    if cond:
        print_error(msg)


def print_warning_cond(cond: bool, msg: str) -> None:
    if cond:
        print_warning(msg)


# -- cooperative cancellation (ref: global.h ok()/setOk()) -----------------

def ok() -> bool:
    """True while tasks should keep running (ref: corbo::ok())."""
    return _ok_flag.is_set()


def set_ok(value: bool) -> None:
    """(ref: corbo::setOk) — clearing requests cancellation of host loops
    (sim/realtime.py checks this between control cycles)."""
    if value:
        _ok_flag.set()
    else:
        _ok_flag.clear()
