"""Shared utilities: stage timing and jax.profiler integration.

The reference only has wall-clock stage timers (SURVEY §5.1); the TPU
framework adds proper device-side tracing: wrap any region in
``profile_trace`` and open the dump in TensorBoard / Perfetto, or annotate
hot spans with ``trace_span`` so they show up in the trace timeline.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Iterator, Optional


def setup_compilation_cache(cache_dir: Optional[str | Path] = None) -> None:
    """Enable JAX's persistent compilation cache.

    On the tunnelled TPU backend a cold compile of even a small program can
    take minutes; the on-disk cache turns every repeat compile (across
    processes) into ~seconds.  Called by every CLI, bench.py and the driver
    entry points.  Override the location with $GCNGC_CACHE_DIR.
    """
    import os
    import jax
    cache_dir = (cache_dir or os.environ.get("GCNGC_CACHE_DIR")
                 or str(Path.home() / ".cache" / "gcn_grabcut_tpu" / "jax"))
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


class StageTimer:
    """Accumulates named wall-clock stage timings (pipeline-style dict)."""

    def __init__(self) -> None:
        self.timing: dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.timing[name] = self.timing.get(name, 0.0) + (
                time.perf_counter() - t0)


@contextlib.contextmanager
def profile_trace(log_dir: str | Path | None) -> Iterator[None]:
    """jax.profiler trace over the wrapped region (no-op when dir is None).

    View with: tensorboard --logdir <dir>  (or load the .trace in Perfetto).
    """
    if log_dir is None:
        yield
        return
    import jax
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def trace_span(name: str) -> Iterator[None]:
    """Named span in the profiler timeline (TraceAnnotation)."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield
