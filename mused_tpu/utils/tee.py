"""Tee logging: duplicate stdout/stderr to console + timestamped file.

Rebuilds reference tee.py (Tee :6-26, setup_logging :28-52) with the same
behavior: write-through to every stream, swallow closed-stream errors,
atexit-safe close.  One deviation fixed: the reference logs to ``log/`` while
its metric dumps go to ``logs/`` (SURVEY.md §5.5 flags the inconsistency) —
default here is ``logs/`` with the directory configurable.
"""
from __future__ import annotations

import atexit
import os
import sys
from datetime import datetime


class Tee:
    """Write-through fan-out to multiple streams; closed streams are ignored."""

    def __init__(self, *streams):
        self.streams = streams

    def write(self, message):
        for stream in self.streams:
            try:
                stream.write(message)
                stream.flush()
            except (OSError, ValueError):
                pass

    def flush(self):
        for stream in self.streams:
            try:
                stream.flush()
            except (OSError, ValueError):
                pass

    def isatty(self):
        try:
            return self.streams[0].isatty()
        except (AttributeError, OSError, ValueError):
            return False


def setup_logging(log_dir: str = "logs"):
    """Redirect stdout+stderr through a Tee into a timestamped file.

    Returns the opened log file; close it (or rely on the atexit hook) when
    the experiment ends — mirrors the reference's usage at main.py:326-338.
    """
    os.makedirs(log_dir, exist_ok=True)
    log_filename = os.path.join(
        log_dir, f"{datetime.now().strftime('%Y-%m-%d_%H-%M-%S')}.txt")
    log_file = open(log_filename, "w")
    sys.stdout = Tee(sys.__stdout__, log_file)
    sys.stderr = Tee(sys.__stderr__, log_file)
    atexit.register(lambda: safe_close(log_file))
    return log_file


def teardown_logging(log_file=None):
    """Restore the original stdout/stderr (the reference never restores;
    provided so sweeps can be nested safely)."""
    sys.stdout = sys.__stdout__
    sys.stderr = sys.__stderr__
    if log_file is not None:
        safe_close(log_file)


def safe_close(file) -> None:
    try:
        if file and not file.closed:
            file.close()
    except Exception as e:      # noqa: BLE001 - mirror reference robustness
        print(f"Error closing log file: {e}", file=sys.__stderr__)
