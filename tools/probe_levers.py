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

    from tools.tpu_train_trial import build_trial

    base_model, batch, _, _ = build_trial(
        "occformer_tpu/configs/occformer_nusc_r50_256x704.py")

    for pw in (1, 4):
        model = base_model.clone(  # flax module copy-with-overrides
            train=False,  # eval mode: frozen BN (no mutable batch_stats)
            img_bev_encoder_backbone={
                **dict(base_model.img_bev_encoder_backbone),
                "pack_windows": pw})
        key = jax.random.PRNGKey(0)

        def prefix(mod, b):
            x = mod.image_encoder(b["imgs"].astype(mod.dtype))
            volume, _ = mod.view_transformer(
                x, b["rots"], b["trans"], b["intrins"],
                b["post_rots"], b["post_trans"], b["bda"])
            return mod.bev_backbone(volume.astype(mod.bev_backbone.dtype))

        variables = jax.jit(
            lambda: model.init({"params": key, "dropout": key}, batch))()
        batch_d = jax.device_put(batch)

        def run_k(k, b):
            def body(acc, i):
                bi = dict(b)
                bi["imgs"] = b["imgs"] * (1.0 + 1e-6 * i)
                out = model.apply(variables, bi, method=prefix)
                leaves = jax.tree_util.tree_leaves(out)
                return acc + sum(jnp.sum(x.astype(jnp.float32))
                                 for x in leaves), 0
            return jax.lax.scan(body, jnp.float32(0),
                                jnp.arange(k, dtype=jnp.float32))[0]

        try:
            rep[f"s2b_prefix_pack{pw}_ms"] = slope(run_k, batch_d)
        except Exception as e:  # noqa: BLE001
            rep[f"s2b_prefix_pack{pw}_ms"] = f"FAIL {type(e).__name__}: {e}"
        _dump(rep)

    print(json.dumps(rep, indent=1))


if __name__ == "__main__":
    main()
