"""Wedge forensics: append-only trace of python-level device calls.

The axon transport can leave a training process blocked forever inside one
device call (BASELINE.md transport-hazard note: ~1 event / 30-60 min of
sustained chip time, mechanism unresolved as of r4).  This module lets the
trainer bracket every python-level call that can block on the device with
``mark()`` / ``done()`` lines in an append-only, line-buffered file, so a
watchdog-killed process leaves an attribution: the last BEGIN without a
matching END names the wedged call and its arguments.

Activation: ``main.py`` sets ``SSLREC_TRACE_FILE`` for CLI runs (default
``runs/dispatch_trace_<pid>.log``); when the env var is unset every call here
is a no-op (tests, library use).  Each line costs ~µs against device calls
that run for seconds, so the trace is always-on for real runs.

Granularity note: dispatch is async — a jitted call can return before the
device executes it, so a wedge inside chunk N may only BLOCK python at the
next sync point (``device_get``).  The trace therefore attributes wedges to
python-level *blocking* sites; set ``train.trace_sync: true`` to block after
every chunk (serialises dispatch; forensic runs only) for chunk-exact
attribution.
"""

from __future__ import annotations

import os
import time

_file = None
_enabled = None


def _fh():
    global _file, _enabled
    if _enabled is None:
        path = os.environ.get("SSLREC_TRACE_FILE")
        _enabled = bool(path)
        if _enabled:
            d = os.path.dirname(path)
            if d:
                os.makedirs(d, exist_ok=True)
            _file = open(path, "a", buffering=1)
            _file.write(f"# pid {os.getpid()} start "
                        f"{time.strftime('%Y-%m-%d %H:%M:%S')}\n")
    return _file


def mark(tag: str, **info) -> None:
    f = _fh()
    if f is not None:
        extra = " ".join(f"{k}={v}" for k, v in info.items())
        f.write(f"{time.time():.3f} BEGIN {tag} {extra}\n")


def done(tag: str) -> None:
    f = _fh()
    if f is not None:
        f.write(f"{time.time():.3f} END {tag}\n")
