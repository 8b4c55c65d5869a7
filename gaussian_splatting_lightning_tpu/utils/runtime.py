"""Runtime setup + profiling hooks (aux subsystems the reference lacks —
SURVEY §5: no profiler, no traces, no persistent caches upstream)."""

from __future__ import annotations

import contextlib
import os
import time
from pathlib import Path


def setup_compilation_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache. On this hardware the first
    compile of the rasterizer goes through a remote AOT service and costs
    minutes; the cache drops warm starts to seconds."""
    import jax

    cache_dir = path or os.environ.get(
        "GS_TPU_CACHE_DIR", str(Path.home() / ".jax_cache")
    )
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


@contextlib.contextmanager
def trace(log_dir: str | None):
    """jax.profiler trace context; no-op when log_dir is None."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield


class StepTimer:
    """Wall-clock step statistics (p50/p95/mean) with warmup skipping."""

    def __init__(self, skip_first: int = 2):
        self.skip_first = skip_first
        self.samples: list[float] = []
        self._seen = 0
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._seen += 1
        if self._seen > self.skip_first:
            self.samples.append(dt)

    def summary(self) -> dict:
        if not self.samples:
            return {}
        s = sorted(self.samples)
        n = len(s)
        return {
            "steps": n,
            "mean_ms": 1e3 * sum(s) / n,
            "p50_ms": 1e3 * s[n // 2],
            "p95_ms": 1e3 * s[min(n - 1, int(n * 0.95))],
        }
