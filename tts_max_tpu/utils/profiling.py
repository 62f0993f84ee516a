"""Profiling utilities — jax.profiler traces + first-class throughput counters.

The reference's observability is wall-clock timers only (SURVEY §5.1,
custom_logging.py:177-189). TPU-native upgrade: xprof trace capture around
training steps, plus the audio-seconds/s and tokens/s counters that are the
north-star metrics (BASELINE.json).
"""

from __future__ import annotations

import contextlib
import os
import time


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True):
    """Capture a jax.profiler trace viewable in XProf/TensorBoard."""
    if not enabled:
        yield
        return
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def fetch_rtt(iters: int = 5) -> float:
    """Round-trip time of a trivial jitted scalar fetch.

    On this environment's relayed TPU, ``block_until_ready`` does not block,
    so every benchmark times a jitted program by fetching an on-device
    scalar and subtracts this RTT (~28 ms through the relay)."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: jnp.sum(x))
    x = jnp.ones((8, 8))
    float(f(x))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(f(x))
    return (time.perf_counter() - t0) / iters


class Throughput:
    """Sliding-window tokens/s and audio-seconds/s tracker."""

    def __init__(self, window: int = 50):
        self._window = window
        self._events: list[tuple[float, int, float]] = []

    def record(self, tokens: int, audio_sec: float = 0.0) -> None:
        self._events.append((time.perf_counter(), tokens, audio_sec))
        if len(self._events) > self._window:
            self._events.pop(0)

    def rates(self) -> dict[str, float]:
        if len(self._events) < 2:
            return {"tokens_per_sec": 0.0, "audio_sec_per_sec": 0.0}
        dt = self._events[-1][0] - self._events[0][0]
        if dt <= 0:
            return {"tokens_per_sec": 0.0, "audio_sec_per_sec": 0.0}
        tokens = sum(e[1] for e in self._events[1:])
        audio = sum(e[2] for e in self._events[1:])
        return {"tokens_per_sec": tokens / dt, "audio_sec_per_sec": audio / dt}
