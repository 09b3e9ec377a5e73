#!/usr/bin/env python
"""Probe 3: is the flagship's real 1.6 s/exec (probe 2) device compute or
per-execute overhead proportional to program/executable size?

Hypotheses for the fetch-forced 1.6 s/exec at 2.36 TFLOP/frame (0.7% MFU):
  H-compute : the program genuinely runs 1.6 s on device (layout/gather
              bound) -> B=2 should take ~2x as long.
  H-exesize : the tunnel/server pays a per-execute cost ~ executable size
              (the flagship binary is ~61 MB serialized; at tunnel bandwidth
              that's ~1-2 s) -> B=2 ~ same 1.6 s, and a huge-code/tiny-
              compute program times like a huge program.
  H-argship : device-resident args are re-shipped per execute -> a trivial
              reduction over the 147M-param tree times ~ param bytes.

Phases (all fetch-forced, distinct inputs where dedupe is conceivable):
  1. param-residency: jit(tree-sum)(flagship variables), repeated.
  2. code-size scaling: x -> tanh(x @ Wk) chains with K baked-in distinct
     constant 512x512 weights, K in {1, 64, 256}: compute is trivial
     (K * 0.5 GFLOP) but executable size scales ~K MB.
  3. flagship B=1 vs B=2 (fresh compile for B=2).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed_fetch(call, n=4):
    best = float("inf")
    vals = []
    for _ in range(n):
        t0 = time.perf_counter()
        vals.append(float(call()))
        best = min(best, time.perf_counter() - t0)
    assert all(v == v for v in vals)
    return best


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from occformer_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    report = {}

    from __graft_entry__ import entry

    fn, (variables, batch) = entry()
    variables = jax.device_put(variables)

    # 1. param residency
    psum = jax.jit(lambda v: jax.tree_util.tree_reduce(
        lambda a, x: a + x.sum().astype(jnp.float32), v, jnp.float32(0)))
    float(jax.device_get(psum(variables)))
    report["param_tree_sum_sec"] = round(
        _timed_fetch(lambda: jax.device_get(psum(variables)), 6), 4)

    # 2. code-size scaling.  NOTE: baking >~32 MB of constants fails with
    # HTTP 413 at remote_compile (the tunnel ships the full HLO, constants
    # included, in one request body) — so scale op COUNT with the weights
    # passed as arguments instead: K unrolled tanh(x @ w_k) stages, trivial
    # compute (K * 0.27 GFLOP), executable op count ~ K.
    rng = np.random.RandomState(0)
    x0 = jax.device_put(jnp.asarray(rng.randn(512, 512), jnp.float32))
    for K in (1, 64, 256):
        Ws = jax.device_put(jnp.asarray(
            rng.randn(K, 512, 512).astype(np.float32) * 0.01))

        def big(x, Ws):
            for k in range(Ws.shape[0]):  # unrolled: K distinct HLO ops
                x = jnp.tanh(x @ Ws[k])
            return x.sum()

        jbig = jax.jit(big)
        t0 = time.time()
        float(jax.device_get(jbig(x0, Ws)))
        compile_s = time.time() - t0
        report[f"K{K}_unrolled_chain_sec"] = round(
            _timed_fetch(lambda: jax.device_get(jbig(x0, Ws)), 4), 4)
        report[f"K{K}_compile_or_first_sec"] = round(compile_s, 1)

    # 3. flagship B=1 vs B=2
    def fwd_sum(v, b):
        out = fn(v, b)
        return jax.tree_util.tree_reduce(
            lambda a, x: a + x.sum().astype(jnp.float32), out,
            jnp.float32(0))

    jfwd = jax.jit(fwd_sum)
    b1 = dict(batch)
    b1["imgs"] = np.asarray(b1["imgs"])
    d1 = jax.device_put(b1)
    for attempt in range(2):
        try:
            float(jax.device_get(jfwd(variables, d1)))
            break
        except Exception:
            if attempt == 1:
                raise
            time.sleep(5)
    report["flagship_B1_sec"] = round(
        _timed_fetch(lambda: jax.device_get(jfwd(variables, d1)), 4), 4)

    b2 = {k: np.concatenate([np.asarray(v)] * 2, axis=0)
          for k, v in b1.items()}
    b2["imgs"][1] += 0.01
    d2 = jax.device_put(b2)
    t0 = time.time()
    float(jax.device_get(jfwd(variables, d2)))
    report["flagship_B2_compile_or_first_sec"] = round(time.time() - t0, 1)
    report["flagship_B2_sec"] = round(
        _timed_fetch(lambda: jax.device_get(jfwd(variables, d2)), 4), 4)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".probe_throughput3.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
