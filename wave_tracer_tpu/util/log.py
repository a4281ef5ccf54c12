"""Leveled logger with dual sinks and named progress bars.

Reference include/wt/util/logger/logger.hpp: 5 verbosity levels, stdout +
file sinks, ANSI colour, named progress bars for load/ADS/render phases.
"""

from __future__ import annotations

import sys
import time
from enum import IntEnum


class Verbosity(IntEnum):
    QUIET = 0
    IMPORTANT = 1
    NORMAL = 2
    INFO = 3
    DEBUG = 4


_COLOURS = {Verbosity.IMPORTANT: "\033[1;33m", Verbosity.DEBUG: "\033[2m"}
_RESET = "\033[0m"


class Logger:
    def __init__(self, verbosity: Verbosity = Verbosity.NORMAL,
                 file_path: str | None = None, colour: bool = True):
        self.verbosity = verbosity
        self.colour = colour and sys.stdout.isatty()
        self._file = open(file_path, "a") if file_path else None

    def log(self, level: Verbosity, msg: str):
        if level <= self.verbosity:
            if self.colour and level in _COLOURS:
                print(f"{_COLOURS[level]}{msg}{_RESET}")
            else:
                print(msg)
        if self._file:
            self._file.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")
            self._file.flush()

    def important(self, msg):
        self.log(Verbosity.IMPORTANT, msg)

    def info(self, msg):
        self.log(Verbosity.INFO, msg)

    def debug(self, msg):
        self.log(Verbosity.DEBUG, msg)

    def __call__(self, msg):
        self.log(Verbosity.NORMAL, msg)


class ProgressBar:
    """Named inline progress bar (logger/progressbar.hpp behaviour)."""

    def __init__(self, name: str, total: int, width: int = 36,
                 stream=sys.stdout):
        self.name = name
        self.total = max(total, 1)
        self.width = width
        self.stream = stream
        self.start = time.time()
        self._last = -1.0

    def update(self, done: int):
        frac = min(done / self.total, 1.0)
        if frac - self._last < 0.01 and frac < 1.0:
            return
        self._last = frac
        filled = int(self.width * frac)
        bar = "█" * filled + "·" * (self.width - filled)
        dt = time.time() - self.start
        eta = dt / max(frac, 1e-9) * (1 - frac)
        self.stream.write(f"\r{self.name:>12} [{bar}] "
                          f"{100 * frac:5.1f}%  {dt:6.1f}s"
                          + (f"  eta {eta:5.1f}s" if frac < 1 else " " * 12))
        self.stream.flush()
        if frac >= 1.0:
            self.stream.write("\n")


default_logger = Logger()
