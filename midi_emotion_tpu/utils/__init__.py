"""General utilities (the reference's src/utils.py surface, minus the
metric/logging pieces that live in training/metrics.py)."""

from __future__ import annotations

import contextlib
import os
import time
from typing import List, Optional, Sequence


def honor_jax_platforms_env() -> None:
    """Make ``JAX_PLATFORMS=cpu python -m ...cli...`` work everywhere.

    On machines whose sitecustomize registers an accelerator plugin and
    re-exports JAX_PLATFORMS at interpreter start, the env var a user sets is
    silently overridden; forcing it through jax.config after import is the
    only reliable path. Call before the first backend touch."""
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        import jax

        jax.config.update("jax_platforms", want)


def split_list(alist: Sequence, n_parts: int) -> List[Sequence]:
    """Even list partition (utils.py:8-13)."""
    if n_parts == 0:
        n_parts = 1
    length = len(alist)
    return [
        alist[i * length // n_parts : (i + 1) * length // n_parts]
        for i in range(n_parts)
    ]


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str]):
    """jax.profiler trace scope -- the tracing subsystem the reference
    lacks (SURVEY §5: only wall-clock ms/batch). View with TensorBoard or
    xprof. No-op when log_dir is None."""
    if not log_dir:
        yield
        return
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Per-step wall-clock accounting for the training log line
    (ms/batch, train.py:384-387)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.time()
        self._steps = 0

    def tick(self):
        self._steps += 1

    @property
    def ms_per_step(self) -> float:
        if self._steps == 0:
            return float("nan")
        return (time.time() - self._t0) * 1000 / self._steps
