#!/usr/bin/env python
"""Fetch-forced throughput measurement (probe 2).

Probe 1 result (.probe_throughput.json): on the axon backend
``block_until_ready`` returns WITHOUT waiting for device execution — a
data-dependence-chained 32-matmul program "completed" at 9.5 PFLOP/s and a
"synchronous" flagship forward in 1.1 ms (42 ms in round 1).  Every timing
in rounds 1-3 that only used block_until_ready (bench.py windows,
tools/benchmark.py, the train-trial step timings) therefore measured RPC
acks, not compute.  Only a VALUE FETCH (``device_get``) demonstrably forces
completion (the soaks fetch losses; their values are real).

Honest method: the timed jitted function RETURNS A SCALAR CHECKSUM of its
output; a window of N dispatches over k distinct device-resident inputs is
timed to the ``device_get`` of (a) only the last checksum — valid if the
device queue is FIFO — and (b) every checksum — valid even if the backend
lazily skips unfetched dispatches.  The trivial-program RTT is measured the
same way and reported for subtraction.

Also re-measures the chained-matmul speed-of-light with an in-program
checksum, giving the chip's REAL achievable TFLOP/s to use as the MFU
denominator.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import entry

    fn, (variables, batch) = entry()

    def fwd_sum(v, b):
        out = fn(v, b)
        return jax.tree_util.tree_reduce(
            lambda a, x: a + x.sum().astype(jnp.float32), out,
            jnp.float32(0))

    jfwd = jax.jit(fwd_sum)
    variables = jax.device_put(variables)

    rng = np.random.RandomState(0)
    k = 8
    batches = []
    for _ in range(k):
        b = dict(batch)
        b["imgs"] = np.asarray(b["imgs"]) + rng.randn(
            *np.shape(b["imgs"])).astype(np.float32) * 0.01
        batches.append(jax.device_put(b))

    for attempt in range(2):
        try:
            float(jax.device_get(jfwd(variables, batches[0])))
            break
        except Exception:
            if attempt == 1:
                raise
            time.sleep(5)
    for b in batches:
        float(jax.device_get(jfwd(variables, b)))

    report = {}

    # trivial-program RTT with a real fetch
    triv = jax.jit(lambda b: b["imgs"].sum())
    float(jax.device_get(triv(batches[0])))
    rtts = []
    for _ in range(10):
        t0 = time.perf_counter()
        float(jax.device_get(triv(batches[0])))
        rtts.append(time.perf_counter() - t0)
    report["trivial_fetch_rtt_sec_min"] = round(min(rtts), 4)

    def window(n, fetch_all):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [jfwd(variables, batches[i % k]) for i in range(n)]
            if fetch_all:
                vals = [float(x) for x in jax.device_get(outs)]
            else:
                vals = [float(jax.device_get(outs[-1]))]
            dt = time.perf_counter() - t0
            best = min(best, dt)
            assert all(np.isfinite(v) for v in vals)
        return best

    for n in (8, 24):
        dt_last = window(n, fetch_all=False)
        dt_all = window(n, fetch_all=True)
        report[f"win{n}_fetch_last_sec_per_exec"] = round(dt_last / n, 4)
        report[f"win{n}_fetch_all_sec_per_exec"] = round(dt_all / n, 4)

    # sync single-dispatch latency with fetch
    ts = []
    for i in range(6):
        t0 = time.perf_counter()
        float(jax.device_get(jfwd(variables, batches[i % k])))
        ts.append(time.perf_counter() - t0)
    report["sync_fetch_sec_min"] = round(min(ts), 4)

    # chained-matmul speed of light, fetch-forced
    n, reps = 4096, 32
    a = jnp.ones((n, n), jnp.bfloat16)
    w0 = jnp.ones((n, n), jnp.bfloat16) * (1.0 / n)

    @jax.jit
    def chain(a, w):
        def body(x, _):
            return jnp.dot(x, w, preferred_element_type=jnp.bfloat16), ()
        y, _ = jax.lax.scan(body, a, None, length=reps)
        return y.sum().astype(jnp.float32)

    a, w0 = jax.device_put((a, w0))
    float(jax.device_get(chain(a, w0)))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        v = float(jax.device_get(chain(a, w0)))
        best = min(best, time.perf_counter() - t0)
    report["matmul_chain_fetch_sec"] = round(best, 4)
    report["matmul_chain_fetch_tflops"] = round(
        2 * n**3 * reps / max(best - min(rtts), 1e-9) / 1e12, 1)
    report["device_kind"] = jax.devices()[0].device_kind

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".probe_throughput2.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
