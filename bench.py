"""Benchmark: nuScenes R50 6x256x704 inference frames/sec on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no FPS (SURVEY.md §6); its local benchmark
tool (tools/analysis_tools/benchmark.py) measures ~4-5 FPS for OccFormer-R50
on a single A100-class GPU per community reports.  We use 4.5 FPS as the
A100 reference estimate; BASELINE.json's north star is >=2x that per chip.
vs_baseline = measured_fps / 4.5 (so 2.0 == the north-star target).

Measurement: FRAMES_PER_CALL forwards run inside ONE jitted lax.scan (a tiny
data dependency chains the iterations so XLA can't CSE them), so the per-call
tunnel dispatch overhead (5-10 ms over the remote-chip HTTP tunnel, NOTES.md)
is amortized and the number reflects device throughput; several timed windows,
best wins.
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

A100_BASELINE_FPS = 4.5
WARMUP = 2
FRAMES_PER_CALL = 10
CALLS_PER_WINDOW = 3


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import entry

    fn, (variables, batch) = entry()

    def fn_chained(variables, batch):
        # each iteration's input depends on the previous output (x * 1e-30
        # of it), forcing FRAMES_PER_CALL sequential executions on device
        def body(carry, _):
            b = dict(batch)
            b["imgs"] = batch["imgs"] + (carry * 1e-30).astype(batch["imgs"].dtype)
            out = fn(variables, b)
            return jnp.mean(out.astype(jnp.float32)), None

        carry, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                                length=FRAMES_PER_CALL)
        return carry

    jfn = jax.jit(fn_chained)

    # transient remote_compile HTTP failures happen over the tunnel
    # (NOTES.md); retry the first (compiling) call once
    for attempt in range(2):
        try:
            out = jfn(variables, batch)
            out.block_until_ready()
            break
        except Exception:
            if attempt == 1:
                raise
            time.sleep(5)
    for _ in range(WARMUP):
        jfn(variables, batch).block_until_ready()

    best_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(CALLS_PER_WINDOW):
            out = jfn(variables, batch)
        out.block_until_ready()
        best_dt = min(best_dt, time.perf_counter() - t0)

    frames = CALLS_PER_WINDOW * FRAMES_PER_CALL * batch["imgs"].shape[0]
    fps = frames / best_dt
    print(json.dumps({
        "metric": "nusc_r50_256x704_infer_frames_per_sec_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / A100_BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
