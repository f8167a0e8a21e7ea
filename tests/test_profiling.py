"""Profiler spans + device memory stats."""
import time

import jax.numpy as jnp

from photo_slam_tpu.utils.profiling import Profiler, device_memory_stats


class TestProfiler:
    def test_spans(self):
        p = Profiler()
        for _ in range(3):
            with p.span("work"):
                time.sleep(0.01)
        s = p.summary()["work"]
        assert s["count"] == 3
        assert 5.0 < s["mean_ms"] < 100.0
        assert "work" in p.report()

    def test_sync_span(self):
        p = Profiler()
        x = jnp.ones((256, 256))
        with p.span("matmul", sync=x):
            y = x @ x
        assert p.summary()["matmul"]["count"] == 1

    def test_disabled(self):
        p = Profiler(enabled=False)
        with p.span("nothing"):
            pass
        assert p.summary() == {}

    def test_device_memory_stats(self):
        stats = device_memory_stats()
        assert isinstance(stats, dict)  # contents platform-dependent
