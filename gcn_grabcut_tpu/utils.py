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


def _cache_generation_tag() -> str:
    """Fingerprint of the software/hardware generation AOT entries depend on.

    XLA:CPU AOT cache entries record the machine features they were compiled
    for; loading an entry written under a different container generation
    (different jaxlib, or a host with different CPU features) emits a
    machine-feature warning that XLA documents can escalate to SIGILL/segv.
    Namespacing the cache directory by this tag makes a new generation start
    a fresh, empty namespace instead of ingesting hazardous entries.
    """
    import hashlib
    import platform

    parts = [platform.machine()]
    try:
        import jax
        import jaxlib
        parts += [jax.__version__, jaxlib.__version__]
    except Exception:  # pragma: no cover - jax is a hard dep in practice
        pass
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith("flags"):
                    # CPU feature set decides which AOT code is runnable.
                    parts.append(" ".join(sorted(line.split(":", 1)[1].split())))
                    break
    except OSError:
        pass
    return hashlib.sha1("|".join(parts).encode()).hexdigest()[:12]


def setup_compilation_cache(cache_dir: Optional[str | Path] = None) -> None:
    """Enable JAX's persistent compilation cache.

    On the tunnelled TPU backend a cold compile of even a small program can
    take minutes; the on-disk cache turns every repeat compile (across
    processes) into ~seconds.  Called by every CLI, bench.py and the driver
    entry points.  Override the location with $GCNGC_CACHE_DIR.

    The cache is namespaced by a container-generation fingerprint
    (jax/jaxlib versions + host CPU features) so entries AOT-compiled by a
    previous container generation are never loaded — see
    :func:`_cache_generation_tag`.
    """
    import os
    import jax
    base = (cache_dir or os.environ.get("GCNGC_CACHE_DIR")
            or str(Path.home() / ".cache" / "gcn_grabcut_tpu" / "jax"))
    cache_dir = Path(base) / _cache_generation_tag()
    cache_dir.mkdir(parents=True, exist_ok=True)
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
