"""Benchmark: nuScenes R50 6x256x704 inference frames/sec on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no FPS (SURVEY.md §6); its local benchmark
tool (tools/analysis_tools/benchmark.py) measures ~4-5 FPS for OccFormer-R50
on a single A100-class GPU per community reports.  We use 4.5 FPS as the
A100 reference estimate; BASELINE.json's north star is >=2x that per chip.
vs_baseline = measured_fps / 4.5 (so 2.0 == the north-star target).

Measurement: a pipeline of async dispatches per timed window (block on the
last), best of several windows.  NOTE: wrapping the forward in a lax.scan to
amortize dispatches is NOT viable on this backend — a multi-iteration loop
over the full model runs ~500x slower than back-to-back dispatches
(NOTES.md "loop pathology"); the dispatch pipeline is the honest measure.
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

A100_BASELINE_FPS = 4.5
WARMUP = 3
ITERS = 30
WINDOWS = 5
# The axon tunnel has outage stretches (NOTES.md) during which ANY device
# call hangs with no error.  A hung bench records nothing for the round;
# the watchdog turns that into an explicit failure line instead.
DEADLINE_SECS = float(os.environ.get("BENCH_DEADLINE_SECS", 2700))


def _arm_watchdog():
    import threading

    def fire():
        print(json.dumps({
            "metric": "nusc_r50_256x704_infer_frames_per_sec_per_chip",
            "value": 0.0,
            "unit": "frames/s",
            "vs_baseline": 0.0,
            "error": f"TPU backend unresponsive for {DEADLINE_SECS:.0f}s "
                     "(axon tunnel outage; see NOTES.md) — no measurement",
        }), flush=True)
        os._exit(2)

    t = threading.Timer(DEADLINE_SECS, fire)
    t.daemon = True
    t.start()
    return t


def main():
    import jax

    watchdog = _arm_watchdog()

    from __graft_entry__ import entry

    fn, (variables, batch) = entry()
    jfn = jax.jit(fn)

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

    # several timed windows; report the best (the tunnel to the remote chip
    # adds occasional multi-ms stalls that aren't the model's cost)
    best_dt = float("inf")
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = jfn(variables, batch)
        out.block_until_ready()
        best_dt = min(best_dt, time.perf_counter() - t0)

    frames = ITERS * batch["imgs"].shape[0]
    fps = frames / best_dt
    watchdog.cancel()
    print(json.dumps({
        "metric": "nusc_r50_256x704_infer_frames_per_sec_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        # the reference publishes no FPS; 4.5 fps is an A100 community
        # ESTIMATE (see module docstring) — labeled as such
        "vs_baseline": round(fps / A100_BASELINE_FPS, 3),
        "baseline_kind": "estimated_a100_4.5fps_community",
        "ms_per_frame_device": round(1000.0 / fps, 3),
    }))


if __name__ == "__main__":
    main()
