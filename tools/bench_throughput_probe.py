#!/usr/bin/env python
"""Discriminate REAL device throughput from dispatch-pipeline artifacts.

Motivation (round 3): the flagship analytic FLOP count is 2.36 TFLOP/sample
(utils/flops.py, textbook formulas at traced shapes), so the round-2 headline
of 151-188 samples/s implies 357-443 TFLOP/s on a 197 TFLOP/s (bf16) v5e —
physically impossible.  Either the FLOP model over-counts or the pipelined
identical-input dispatch measurement over-counts executions (e.g. the axon
tunnel/server deduplicating identical (executable, args) executes, or
blocking on only the LAST output not implying the earlier ones ran).

This probe measures the same jitted flagship forward several ways:

  A. pipelined, identical input, block on last output        (bench.py r2)
  B. pipelined, identical input, block on EVERY output
  C. pipelined, k=8 DISTINCT pre-uploaded inputs round-robin, block all
  D. fully synchronous single dispatches (block each), minus the tunnel
     round-trip measured on a trivial jitted add at the same arg count
  E. depth sweep at identical inputs: executions/sec vs pipeline depth
     (a rate that keeps RISING with depth while C stays flat = artifact)

If C << A, the honest number is C and bench.py must switch to distinct
inputs.  Writes a JSON report to stdout and .probe_throughput.json.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _window(call_seq, block_all):
    """Time one window of len(call_seq) dispatches; return seconds."""
    import jax
    t0 = time.perf_counter()
    outs = [c() for c in call_seq]
    if block_all:
        for o in outs:
            jax.block_until_ready(o)
    else:
        jax.block_until_ready(outs[-1])
    return time.perf_counter() - t0


def _best_rate(make_seq, windows, block_all):
    best = float("inf")
    for _ in range(windows):
        seq = make_seq()
        best = min(best, _window(seq, block_all) / len(seq))
    return 1.0 / best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--depth", type=int, default=24)
    p.add_argument("--windows", type=int, default=3)
    p.add_argument("--distinct", type=int, default=8)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import entry

    fn, (variables, batch) = entry()
    jfn = jax.jit(fn)
    variables = jax.device_put(variables)

    # k distinct batches (perturb the image pixels; shapes identical)
    rng = np.random.RandomState(0)
    batches = []
    for i in range(args.distinct):
        b = dict(batch)
        b["imgs"] = np.asarray(b["imgs"]) + rng.randn(
            *np.shape(b["imgs"])).astype(np.float32) * 0.01
        batches.append(jax.device_put(b))
    b0 = batches[0]

    # warmup / compile (retry once for transient remote_compile failures)
    for attempt in range(2):
        try:
            jax.block_until_ready(jfn(variables, b0))
            break
        except Exception:
            if attempt == 1:
                raise
            time.sleep(5)
    for b in batches:
        jax.block_until_ready(jfn(variables, b))

    report = {"depth": args.depth, "distinct": args.distinct}

    # A: identical input, block last (the round-2 bench.py measurement)
    report["A_same_input_block_last_eps"] = round(_best_rate(
        lambda: [lambda: jfn(variables, b0)] * args.depth,
        args.windows, block_all=False), 2)
    # B: identical input, block all
    report["B_same_input_block_all_eps"] = round(_best_rate(
        lambda: [lambda: jfn(variables, b0)] * args.depth,
        args.windows, block_all=True), 2)
    # C: distinct inputs round-robin, block all
    report["C_distinct_block_all_eps"] = round(_best_rate(
        lambda: [(lambda b=batches[i % args.distinct]: jfn(variables, b))
                 for i in range(args.depth)],
        args.windows, block_all=True), 2)

    # D: synchronous singles, and tunnel RTT on a trivial program
    triv = jax.jit(lambda v, b: b["imgs"].sum())
    jax.block_until_ready(triv(variables, b0))
    sync, rtt = [], []
    for i in range(6):
        t0 = time.perf_counter()
        jax.block_until_ready(jfn(variables, batches[i % args.distinct]))
        sync.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.block_until_ready(triv(variables, b0))
        rtt.append(time.perf_counter() - t0)
    report["D_sync_sec_min"] = round(min(sync), 4)
    report["D_trivial_rtt_sec_min"] = round(min(rtt), 4)
    report["D_sync_minus_rtt_eps"] = round(
        1.0 / max(min(sync) - min(rtt), 1e-9), 2)

    # E: depth sweep, identical input, block last
    sweep = {}
    for depth in (4, 8, 16, 32, 64):
        sweep[depth] = round(_best_rate(
            lambda d=depth: [lambda: jfn(variables, b0)] * d,
            2, block_all=False), 2)
    report["E_depth_sweep_same_input_eps"] = sweep

    # F: speed-of-light — CHAINED bf16 matmuls (each consumes the previous
    # output, so no dedupe/reorder is possible) measure the chip's real
    # achievable TFLOP/s; compare against the device_kind's claimed peak.
    n, reps = 4096, 32
    a = jnp.ones((n, n), jnp.bfloat16)
    w = jnp.ones((n, n), jnp.bfloat16) * (1.0 / n)

    @jax.jit
    def chain(a, w):
        def body(x, _):
            return jnp.dot(x, w, preferred_element_type=jnp.bfloat16), ()
        y, _ = jax.lax.scan(body, a, None, length=reps)
        return y

    a, w = jax.device_put((a, w))
    jax.block_until_ready(chain(a, w))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(chain(a, w))
        best = min(best, time.perf_counter() - t0)
    flops = 2 * n**3 * reps
    report["F_chained_matmul_scan_tflops"] = round(flops / best / 1e12, 1)

    # F2: same chain via Python-level dispatches (each consumes the previous
    # output -> serialized by data dependence, immune to both dedupe AND the
    # backend's scan pathology, NOTES.md "loop pathology")
    jdot = jax.jit(lambda x, w: jnp.dot(x, w,
                                        preferred_element_type=jnp.bfloat16))
    jax.block_until_ready(jdot(a, w))
    best = float("inf")
    for _ in range(3):
        y = a
        t0 = time.perf_counter()
        for _ in range(reps):
            y = jdot(y, w)
        jax.block_until_ready(y)
        best = min(best, time.perf_counter() - t0)
    report["F2_chained_matmul_dispatch_tflops"] = round(
        flops / best / 1e12, 1)
    report["F_device_kind"] = jax.devices()[0].device_kind

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".probe_throughput.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
