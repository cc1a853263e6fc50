"""Profiling + perf markers.

TPU-native equivalent of the reference's nested command-list perf markers
(beginMarker/endMarker around every pass, Sample.cpp:2304,2371,2404-2413,
consumed by Nsight/PIX) and the CPU frame timer
(DeviceManager::UpdateAverageFrameTime, accumulation benchmark
Sample.cpp:1556-1566):

  * `scope(name)`: wall-clock stage timer with device sync (materializes
    one element to force completion — on the axon TPU tunnel
    block_until_ready alone does not reliably synchronize).
  * `trace(path)`: jax.profiler trace context for TensorBoard-grade
    device timelines (the Nsight equivalent).
  * named_scope: re-export of jax.named_scope so stages are labeled in
    XLA/profiler output.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax
import numpy as np

named_scope = jax.named_scope


class FrameProfiler:
    """Per-stage wall-clock accumulation across frames."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def scope(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_on is not None:
                leaves = jax.tree_util.tree_leaves(sync_on)
                if leaves:
                    np.asarray(jax.device_get(leaves[0]))
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        lines = ["stage                          avg ms     calls"]
        for name, tot in sorted(self.totals.items(),
                                key=lambda kv: -kv[1]):
            c = self.counts[name]
            lines.append(f"{name:<28} {tot / max(c, 1) * 1e3:9.2f} {c:9d}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler device trace (view in TensorBoard / Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
