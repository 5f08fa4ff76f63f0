"""Leveled logging — the reference's ``Verbose`` class
(``/root/reference/include/System.h:47-72``): a process-wide verbosity
threshold and ``print_mess(msg, level)`` that prints only when the message
level is at or below it.  Default QUIET like the reference (System.cc:272).
"""
from __future__ import annotations

import sys

VERBOSITY_QUIET = 0
VERBOSITY_NORMAL = 1
VERBOSITY_VERBOSE = 2
VERBOSITY_VERY_VERBOSE = 3
VERBOSITY_DEBUG = 4

_level = VERBOSITY_QUIET


def set_verbosity(level: int):
    """Verbose::SetTh."""
    global _level
    _level = int(level)


def get_verbosity() -> int:
    return _level


def print_mess(msg: str, level: int = VERBOSITY_NORMAL):
    """Verbose::PrintMess: emit ``msg`` iff ``level`` <= current threshold."""
    if level <= _level:
        print(msg, file=sys.stderr, flush=True)
