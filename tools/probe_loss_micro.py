#!/usr/bin/env python
"""Slope-time the non-gather primitives of the loss at exact flagship
shapes: argsort (the new sorted-readout cost), lax.top_k at k=37632,
gumbel_topk_sample over 35k lidar weights, the [G, S] take_along selection,
and the auction match.  Identifies which primitive makes the full-loss
program slow when the kernels themselves are ~20 ms/layer.  Writes
.probe_loss_micro.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

S_CAND = 150528
N_UNC = 37632
G, Q = 17, 100
N_LIDAR = 35000
K1, K2 = 4, 12


def _dump(rep):
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".probe_loss_micro.json")
    with open(out, "w") as f:
        json.dump(rep, f, indent=1)


def main():
    import numpy as np

    import jax
    import jax.numpy as jnp

    from occformer_tpu.losses.matching import auction_match
    from occformer_tpu.losses.point_sampling import (
        gumbel_topk_sample, uncertainty_topk)
    from occformer_tpu.ops.loss_gather import sort_points_by_row
    from occformer_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    rng = np.random.RandomState(0)
    rep = {"device_kind": jax.devices()[0].device_kind}

    pts = jnp.asarray(rng.rand(S_CAND, 3).astype(np.float32))
    logits = jnp.asarray(rng.randn(G, S_CAND).astype(np.float32))
    weights = jnp.asarray(rng.rand(N_LIDAR).astype(np.float32))
    cost = jnp.asarray(rng.randn(Q, G).astype(np.float32))
    valid = jnp.ones((G,), bool)
    rand_pts = jnp.asarray(rng.rand(G, 12544, 3).astype(np.float32))

    def _t(fn):
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    def slope(body1):
        def make(k):
            def f(x):
                def body(acc, i):
                    return acc + body1(x * (1.0 + 1e-6 * i)), 0
                return jax.lax.scan(body, jnp.float32(0),
                                    jnp.arange(k, dtype=jnp.float32))[0]
            return f
        ts = []
        for k in (K1, K2):
            jf = jax.jit(make(k))
            float(jax.device_get(jf(arg)))
            ts.append(min(_t(lambda: float(jax.device_get(jf(arg))))
                          for _ in range(3)))
        return round((ts[1] - ts[0]) / (K2 - K1) * 1e3, 2)

    arg = pts
    try:
        rep["argsort_150k_pts_ms"] = slope(
            lambda x: jnp.sum(sort_points_by_row(x, (128, 128, 16))))
    except Exception as e:  # noqa: BLE001
        rep["argsort_150k_pts_ms"] = f"FAIL {type(e).__name__}: {e}"
    _dump(rep)

    arg = rand_pts
    try:
        rep["argsort_g17_12k_pts_ms"] = slope(
            lambda x: jnp.sum(sort_points_by_row(x, (128, 128, 16))))
    except Exception as e:  # noqa: BLE001
        rep["argsort_g17_12k_pts_ms"] = f"FAIL {type(e).__name__}: {e}"
    _dump(rep)

    arg = logits
    try:
        rep["topk_37632_of_150k_x17_ms"] = slope(
            lambda x: jnp.sum(uncertainty_topk(x, N_UNC).astype(jnp.float32)))
    except Exception as e:  # noqa: BLE001
        rep["topk_37632_of_150k_x17_ms"] = f"FAIL {type(e).__name__}: {e}"
    _dump(rep)

    try:
        idx = uncertainty_topk(logits, N_UNC)

        def sel(x):
            return jnp.sum(jnp.take_along_axis(x, idx, axis=1))
        rep["take_along_g17_37k_ms"] = slope(sel)
    except Exception as e:  # noqa: BLE001
        rep["take_along_g17_37k_ms"] = f"FAIL {type(e).__name__}: {e}"
    _dump(rep)

    arg = weights
    try:
        rep["gumbel_topk_75k_of_35k_ms"] = slope(
            lambda x: jnp.sum(gumbel_topk_sample(
                jax.random.PRNGKey(0), x, 25088).astype(jnp.float32)))
    except Exception as e:  # noqa: BLE001
        rep["gumbel_topk_75k_of_35k_ms"] = f"FAIL {type(e).__name__}: {e}"
    _dump(rep)

    arg = cost
    try:
        rep["auction_q100_g17_ms"] = slope(
            lambda x: jnp.sum(auction_match(x, valid).astype(jnp.float32)))
    except Exception as e:  # noqa: BLE001
        rep["auction_q100_g17_ms"] = f"FAIL {type(e).__name__}: {e}"
    _dump(rep)

    print(json.dumps(rep, indent=1))


if __name__ == "__main__":
    main()
