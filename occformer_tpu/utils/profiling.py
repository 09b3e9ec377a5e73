"""Profiling utilities: jax.profiler traces + per-stage wall timers.

TPU replacement for the reference's hand-rolled record_time +
cuda.synchronize timers (detectors/occupancyformer.py:19-57) and the
commented-out mmcv profiler hook (apis/mmdet_train.py:146-149).
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


class StageTimer:
    """Accumulating stage timer with device-sync boundaries.

    CAUTION (axon backend): `block_until_ready` returns on RPC ack, not
    device completion (NOTES.md "ROUND-3 CORRECTION") — inside a stage,
    force completion with `jax.device_get` of a small result instead.

    Usage:
        timer = StageTimer()
        with timer.stage("img_encoder"):
            feats = jitted_encoder(...)
            jax.device_get(feats[0].ravel()[0])  # fetch-force
        print(timer.report())
    """

    def __init__(self):
        self.times: Dict[str, list] = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        yield
        self.times[name].append(time.perf_counter() - t0)

    def report(self) -> str:
        rows = []
        total = sum(sum(v) / max(len(v), 1) for v in self.times.values())
        for k, v in self.times.items():
            avg = sum(v) / max(len(v), 1)
            frac = avg / total if total > 0 else 0.0
            rows.append(f"{k}: {avg * 1000:.2f} ms ({frac:.1%})")
        return ", ".join(rows)

    def reset(self):
        self.times.clear()


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/occformer_trace"):
    """Capture a jax profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> Dict[str, float]:
    """Per-device HBM usage in GiB (where the backend reports it)."""
    out = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
            out[str(d)] = {
                "bytes_in_use_gib": s.get("bytes_in_use", 0) / 2**30,
                "peak_bytes_gib": s.get("peak_bytes_in_use", 0) / 2**30,
            }
        except Exception:
            pass
    return out
