#!/usr/bin/env python
"""TRUE trilerp kernel cost via slope timing (round 4).

Every per-call probe number on this backend sits on the ~31 ms dispatch+
fetch RTT floor (.probe_throughput.json), so 30 ms-scale kernels are
unmeasurable one call at a time — .probe_window_local.json's "L2 full =
0.0309 s" is ~100% RTT.  This probe chains K kernel invocations inside one
jit via lax.scan (fresh coords each step so nothing folds/CSEs), fetches a
scalar once, and reports the SLOPE (t(K2) - t(K1)) / (K2 - K1) — the honest
marginal cost per invocation, which is what the 18-gather-per-forward
production path actually pays.

Sweeps: per-level window sizes and s_block, fwd and fwd+bwd, at flagship
shapes with production-local coords.  Writes .probe_trilerp_amortized.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.probe_window_local import query_grid_coords  # noqa: E402

LEVELS = [(64, 64, 8), (32, 32, 4), (16, 16, 2)]
C = 24
G = 8
P = 4
K1, K2 = 4, 12


def _dump(report):
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".probe_trilerp_amortized.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)


def main():
    import numpy as np

    import jax
    import jax.numpy as jnp

    from occformer_tpu.ops.trilerp import trilerp_gather_slab

    rng = np.random.RandomState(0)
    report = {"device_kind": jax.devices()[0].device_kind,
              "noise_vox": 2.0, "K": [K1, K2],
              "method": "slope: (t_K2 - t_K1)/(K2 - K1), scan-chained, "
                        "scalar fetched once"}

    def slope(make_fn, tbl, coords):
        def timed(k):
            jf = jax.jit(make_fn(k))
            float(jax.device_get(jf(tbl, coords)))  # compile + warm
            best = min(
                _t(lambda: float(jax.device_get(jf(tbl, coords))))
                for _ in range(3))
            return best
        t1, t2 = timed(K1), timed(K2)
        return (t2 - t1) / (K2 - K1), t1, t2

    def _t(fn):
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    for lvl, target in enumerate(LEVELS):
        X, Y, Z = target
        XY = X * Y
        cnp = query_grid_coords(LEVELS, target, 2.0, P, rng)
        S = cnp.shape[0]
        tbl = jnp.asarray(rng.randn(G, XY, Z * C), jnp.bfloat16)
        coords = jnp.asarray(np.broadcast_to(cnp, (G, S, 3)))

        wins = {0: (0, 320, 640, 1024, 1280), 1: (0, 320, 640), 2: (0,)}[lvl]
        for w in wins:
            for sb in (256, 512):
                key = f"L{lvl}_w{w or 'full'}_sb{sb}"

                def make_fwd(k, win=w, s_block=sb):
                    def f(t, c):
                        def body(acc, i):
                            ci = c * (1.0 + 1e-6 * i)
                            out = trilerp_gather_slab(
                                t, target, C, ci, window=win, s_block=s_block)
                            return acc + jnp.sum(out.astype(jnp.float32)), 0
                        acc, _ = jax.lax.scan(
                            body, jnp.float32(0.0),
                            jnp.arange(k, dtype=jnp.float32))
                        return acc
                    return f

                try:
                    sl, t1, t2 = slope(make_fwd, tbl, coords)
                    report[f"{key}_fwd_ms"] = round(sl * 1e3, 3)
                except Exception as e:  # noqa: BLE001
                    report[f"{key}_fwd_ms"] = f"FAIL {type(e).__name__}: {e}"
                _dump(report)

                def make_fb(k, win=w, s_block=sb):
                    def f(t, c):
                        def body(acc, i):
                            def loss(tt, cc):
                                ci = cc * (1.0 + 1e-6 * i)
                                out = trilerp_gather_slab(
                                    tt, target, C, ci, window=win,
                                    s_block=s_block)
                                return jnp.sum(out.astype(jnp.float32))
                            gt, gc = jax.grad(loss, (0, 1))(t, c)
                            return acc + jnp.sum(gt.astype(jnp.float32)) \
                                + jnp.sum(gc.astype(jnp.float32)), 0
                        acc, _ = jax.lax.scan(
                            body, jnp.float32(0.0),
                            jnp.arange(k, dtype=jnp.float32))
                        return acc
                    return f

                try:
                    sl, t1, t2 = slope(make_fb, tbl, coords)
                    report[f"{key}_fwdbwd_ms"] = round(sl * 1e3, 3)
                except Exception as e:  # noqa: BLE001
                    report[f"{key}_fwdbwd_ms"] = (
                        f"FAIL {type(e).__name__}: {e}")
                _dump(report)

    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
