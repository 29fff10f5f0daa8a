"""Priority-vs-noise logging (Log_output, src/utils/log_output.{h,cpp}).

The reference writes a message when its priority <= the global noise
level, indents by priority, optionally tees to a log file, and rewrites
an in-place status line with backspaces for progress messages
(log_output.cpp:58-133). Same scheme here; the status line uses \\r and
only engages when stderr is a TTY (batch drivers get plain lines).
"""
from __future__ import annotations

import sys

_noise = 0
_log_file = None
_status_open = 0   # width of the currently displayed status line


def set_noise(level: int, log_file: str | None = None) -> None:
    global _noise, _log_file
    _noise = int(level)
    if log_file:
        _log_file = open(log_file, "a")


def get_noise() -> int:
    return _noise


def _clear_status() -> None:
    global _status_open
    if _status_open:
        sys.stderr.write("\r" + " " * _status_open + "\r")
        _status_open = 0


def log_out(msg: str, priority: int = 0) -> None:
    if priority > _noise:
        return
    _clear_status()
    text = " " * max(0, priority) + msg
    print(text, file=sys.stderr)
    if _log_file is not None:
        _log_file.write(text + "\n")
        _log_file.flush()


def log_progress(msg: str, priority: int = 0) -> None:
    """In-place progress line (Log_output::write_out with the
    backspace rewrite, log_output.cpp:84-118). Non-TTY stderr degrades
    to a plain log_out at one priority higher so batch logs don't
    drown in per-node lines."""
    global _status_open
    if priority > _noise:
        return
    if not sys.stderr.isatty():
        log_out(msg, priority + 1)
        return
    pad = max(0, _status_open - len(msg))
    sys.stderr.write("\r" + msg + " " * pad)
    sys.stderr.flush()
    _status_open = len(msg)


def finish_progress() -> None:
    """End an in-place status line (newline) if one is open."""
    global _status_open
    if _status_open and sys.stderr.isatty():
        sys.stderr.write("\n")
        sys.stderr.flush()
    _status_open = 0
