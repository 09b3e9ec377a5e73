#!/usr/bin/env python
"""Fetch-forced A/B of the fiction-calibrated levers (VERDICT r3 #4).

Round-2 set ``pack_windows=1`` and tuned ``query_chunks`` with the retracted
``block_until_ready`` methodology; this re-measures them with slope timing
(scan-chained, one fetch — NOTES.md "Windowed kernel + slope timing").

  pack_windows: occnet's dual-path windowed attention MXU-tiling lever —
    slope-times the S2b prefix (image encoder + LSS + bev backbone) with
    pack_windows 1 vs 4 on otherwise identical params.

Writes .probe_levers.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K1, K2 = 3, 9


def _dump(rep):
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".probe_levers.json")
    with open(out, "w") as f:
        json.dump(rep, f, indent=1)


def main():
    import numpy as np

    import jax
    import jax.numpy as jnp

    from occformer_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    rng = np.random.RandomState(0)
    rep = {"device_kind": jax.devices()[0].device_kind}

    def _t(fn):
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    def slope(jfn, *args):
        ts = []
        for k in (K1, K2):
            jf = jax.jit(lambda *a, kk=k: jfn(kk, *a))
            float(jax.device_get(jf(*args)))
            ts.append(min(_t(lambda: float(jax.device_get(jf(*args))))
                          for _ in range(3)))
        return round((ts[1] - ts[0]) / (K2 - K1) * 1e3, 3)

    from occformer_tpu.config import load_config
    from occformer_tpu.models.occnet import OccupancyEncoder

    cfg = load_config("occformer_tpu/configs/occformer_nusc_r50_256x704.py")
    bb = dict(cfg["model"]["img_bev_encoder_backbone"])
    bb.pop("type", None)
    rng_np = np.random.RandomState(0)
    # the LSS volume at flagship shape (the occnet's real input)
    vol = jnp.asarray(rng_np.randn(
        1, 128, 128, 16, bb.get("in_channels", 128)).astype(np.float32),
        jnp.bfloat16)

    # occnet-only slope: the K-chained FULL-prefix program of the first
    # version serialized past the compile service's request-body limit
    # (HTTP 413); pack_windows lives entirely in the occnet, so this is
    # the honest isolate anyway
    for pw in (1, 4):
        model = OccupancyEncoder(**bb, pack_windows=pw, train=False,
                                 dtype=jnp.bfloat16)
        key = jax.random.PRNGKey(0)
        variables = jax.jit(lambda m=model: m.init(key, vol))()
        vol_d = jax.device_put(vol)

        def run_k(k, v, m=model, va=variables):
            def body(acc, i):
                out = m.apply(va, v * (1.0 + 1e-6 * i))
                return acc + sum(jnp.sum(x.astype(jnp.float32))
                                 for x in jax.tree_util.tree_leaves(out)), 0
            return jax.lax.scan(body, jnp.float32(0),
                                jnp.arange(k, dtype=jnp.float32))[0]

        try:
            rep[f"occnet_pack{pw}_ms"] = slope(run_k, vol_d)
        except Exception as e:  # noqa: BLE001
            rep[f"occnet_pack{pw}_ms"] = f"FAIL {type(e).__name__}: {e}"
        _dump(rep)

    print(json.dumps(rep, indent=1))


if __name__ == "__main__":
    main()
