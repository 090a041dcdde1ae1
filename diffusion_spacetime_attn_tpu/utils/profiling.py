"""Profiling + structured logging (aux subsystems the reference lacks,
SURVEY §5: "The TPU build should add jax.profiler traces as a first-class
feature")."""
from __future__ import annotations

import contextlib
import json
import logging
import sys
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax_trace") -> Iterator[None]:
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named span inside a trace."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def timed(name: str, sink=None) -> Iterator[None]:
    """Wall-clock span; blocks on async dispatch at exit."""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    (sink or print)(f"[timed] {name}: {dt * 1000:.1f}ms")


class JsonLogger:
    """Line-JSON metric logger (replaces the reference's print statements and
    TensorBoard scalars with a machine-readable stream)."""

    def __init__(self, path: Optional[str] = None):
        self.f = open(path, "a") if path else sys.stdout

    def log(self, event: str, **fields):
        rec = {"event": event, "time": time.time(), **fields}
        self.f.write(json.dumps(rec) + "\n")
        self.f.flush()


def get_logger(name: str = "dsta") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(
            logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s")
        )
        logger.addHandler(h)
        logger.setLevel(logging.INFO)
    return logger
