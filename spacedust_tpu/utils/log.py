"""Leveled logging + TTY-aware progress bars.

Equivalent of the reference's Debug subsystem
(lib/mmseqs/src/commons/Debug.h:42-220): verbosity levels NOTHING(0) /
ERROR(1) / WARNING(2) / INFO(3), a TTY-aware ASCII progress bar
(Debug.h:116-220) that falls back to dot-printing on non-TTY streams,
and the SPACEDUST_TTY env override (the reference honors MMSEQS_TTY).

All output goes to stderr (the reference writes both levels to stderr;
stdout is reserved for data).
"""

from __future__ import annotations

import os
import sys
import time

NOTHING = 0
ERROR = 1
WARNING = 2
INFO = 3

_level = INFO


def set_verbosity(level: int) -> None:
    global _level
    _level = int(level)


def get_verbosity() -> int:
    return _level


def _emit(prefix: str, msg: str) -> None:
    sys.stderr.write(f"{prefix}{msg}\n")
    sys.stderr.flush()


def error(msg: str) -> None:
    if _level >= ERROR:
        _emit("Error: ", msg)


def warning(msg: str) -> None:
    if _level >= WARNING:
        _emit("Warning: ", msg)


def info(msg: str) -> None:
    if _level >= INFO:
        _emit("", msg)


def _is_tty() -> bool:
    override = os.environ.get("SPACEDUST_TTY")
    if override is not None:
        return override not in ("0", "", "false")
    try:
        return sys.stderr.isatty()
    except Exception:
        return False


class Progress:
    """ASCII progress bar on a TTY, percentage dots otherwise
    (Debug.h Progress::updateProgress semantics: 40-char bar with
    elapsed time; non-TTY prints milestone markers)."""

    BAR_WIDTH = 40

    def __init__(self, total: int, label: str = ""):
        self.total = max(int(total), 1)
        self.label = label
        self.current = 0
        self.start = time.time()
        self._tty = _is_tty()
        self._last_pct = -1
        self._enabled = _level >= INFO

    def update(self, n: int = 1) -> None:
        if not self._enabled:
            return
        self.current += n
        pct = min(self.current * 100 // self.total, 100)
        if pct == self._last_pct:
            return
        self._last_pct = pct
        if self._tty:
            filled = self.BAR_WIDTH * pct // 100
            bar = "=" * filled + " " * (self.BAR_WIDTH - filled)
            elapsed = time.time() - self.start
            sys.stderr.write(f"\r[{bar}] {pct:3d}% {elapsed:6.1f}s {self.label}")
            sys.stderr.flush()
        elif pct % 10 == 0:
            sys.stderr.write(".")
            sys.stderr.flush()

    def finish(self) -> None:
        if not self._enabled:
            return
        if self._tty:
            self.update(0)
            sys.stderr.write("\n")
        else:
            sys.stderr.write("\n")
        sys.stderr.flush()

    def __enter__(self) -> "Progress":
        return self

    def __exit__(self, *exc) -> None:
        self.finish()


class Timer:
    """Wall-clock timer (commons/Timer.h): Application.cpp:45-60 prints
    'Time for processing: Xh Ym Zs' per command."""

    def __init__(self):
        self.start = time.time()

    def elapsed(self) -> float:
        return time.time() - self.start

    def format(self) -> str:
        secs = self.elapsed()
        h, rem = divmod(int(secs), 3600)
        m, s = divmod(rem, 60)
        frac = secs - int(secs)
        return f"{h}h {m}m {s}s {int(frac * 1000)}ms"
