"""Logging and error handling.

Parity with reference src/base/kaldi-error.h (KALDI_ERR/WARN/LOG/VLOG/ASSERT):
stderr logging with file:line provenance, a fatal-error exception type, and a
verbosity level settable from the CLI (--verbose).
"""

from __future__ import annotations

import logging
import os
import sys
import time


class KaldiError(RuntimeError):
    """Fatal framework error (reference: KALDI_ERR throws std::runtime_error)."""


_FORMAT = "%(levelname).1s %(asctime)s %(name)s %(filename)s:%(lineno)d] %(message)s"
_configured = False
_verbose_level = int(os.environ.get("OKT_VERBOSE", "0"))


def _configure() -> None:
    global _configured
    if _configured:
        return
    handler = logging.StreamHandler(sys.stderr)
    handler.setFormatter(logging.Formatter(_FORMAT, datefmt="%H:%M:%S"))
    root = logging.getLogger("okt")
    root.addHandler(handler)
    root.setLevel(logging.INFO)
    root.propagate = False
    _configured = True


def get_logger(name: str = "okt") -> logging.Logger:
    _configure()
    if not name.startswith("okt"):
        name = "okt." + name
    return logging.getLogger(name)


def set_verbose_level(level: int) -> None:
    """--verbose=N: N>=1 enables DEBUG (reference KALDI_VLOG semantics)."""
    global _verbose_level
    _verbose_level = level
    _configure()
    logging.getLogger("okt").setLevel(logging.DEBUG if level >= 1 else logging.INFO)


def verbose_level() -> int:
    return _verbose_level


class Timer:
    """Wall-clock timer (reference src/base/timer.h)."""

    def __init__(self) -> None:
        self._start = time.perf_counter()

    def elapsed(self) -> float:
        return time.perf_counter() - self._start

    def reset(self) -> None:
        self._start = time.perf_counter()
