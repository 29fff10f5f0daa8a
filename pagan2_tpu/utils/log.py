"""Priority-vs-noise logging (Log_output, src/utils/log_output.{h,cpp}).

The reference writes a message when its priority <= the global noise
level, indents by priority, and optionally tees to a log file
(log_output.cpp:58-133). Same scheme here, minus the backspace-based
status-line rewriting (useless under batch drivers).
"""
from __future__ import annotations

import sys

_noise = 0
_log_file = None


def set_noise(level: int, log_file: str | None = None) -> None:
    global _noise, _log_file
    _noise = int(level)
    if log_file:
        _log_file = open(log_file, "a")


def get_noise() -> int:
    return _noise


def log_out(msg: str, priority: int = 0) -> None:
    if priority > _noise:
        return
    text = " " * max(0, priority) + msg
    print(text, file=sys.stderr)
    if _log_file is not None:
        _log_file.write(text + "\n")
        _log_file.flush()
