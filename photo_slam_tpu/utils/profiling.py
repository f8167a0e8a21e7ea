"""Tracing / profiling / memory observability.

TPU-native replacement for the reference's manual chrono spans + CUDA
caching-allocator stats (reference: src/gaussian_mapper.cpp:617,738-740,
1582-1597; examples/replica_rgbd.cpp:235-249 GpuPeakUsageMB): wall-clock
span timers with EMA summaries, device memory statistics via the PJRT
memory_stats API, and a jax.profiler trace context for deep dives.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from dataclasses import dataclass
from pathlib import Path


import jax


@dataclass
class SpanStats:
    count: int = 0
    total_s: float = 0.0
    ema_s: float = 0.0
    max_s: float = 0.0

    def record(self, dt: float) -> None:
        self.count += 1
        self.total_s += dt
        self.max_s = max(self.max_s, dt)
        self.ema_s = dt if self.count == 1 else 0.1 * dt + 0.9 * self.ema_s


class Profiler:
    """Named wall-clock spans (the reference's chrono blocks, structured)."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.spans: dict[str, SpanStats] = defaultdict(SpanStats)

    @contextlib.contextmanager
    def span(self, name: str, sync=None):
        """Time a block; pass `sync` (an array or pytree) to block on device
        completion first — the analog of torch::cuda::synchronize() around
        the reference's render timer (src/gaussian_mapper.cpp:1582-1597)."""
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        self.spans[name].record(time.perf_counter() - t0)

    def summary(self) -> dict[str, dict]:
        return {
            name: {
                "count": s.count,
                "mean_ms": 1000.0 * s.total_s / max(s.count, 1),
                "ema_ms": 1000.0 * s.ema_s,
                "max_ms": 1000.0 * s.max_s,
            }
            for name, s in self.spans.items()
        }

    def report(self) -> str:
        lines = [f"{'span':30s} {'count':>8s} {'mean ms':>10s} {'max ms':>10s}"]
        for name, s in sorted(self.spans.items()):
            lines.append(
                f"{name:30s} {s.count:8d} "
                f"{1000 * s.total_s / max(s.count, 1):10.2f} "
                f"{1000 * s.max_s:10.2f}")
        return "\n".join(lines)


def device_memory_stats(device=None) -> dict:
    """Device memory statistics incl. peak (GpuPeakUsageMB equivalent)."""
    dev = device or jax.local_devices()[0]
    stats = {}
    try:
        raw = dev.memory_stats() or {}
        for key in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit",
                    "largest_alloc_size"):
            if key in raw:
                stats[key.replace("bytes", "mb").replace("_size", "_mb")] = (
                    raw[key] / (1024 * 1024))
        stats.update({k: v for k, v in raw.items() if k not in stats})
    except Exception as e:  # pragma: no cover - platform-dependent
        stats["error"] = str(e)
    return stats


@contextlib.contextmanager
def trace(log_dir):
    """jax.profiler trace for tensorboard/xprof deep dives."""
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
