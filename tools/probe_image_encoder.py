#!/usr/bin/env python
"""Slope-timed decomposition of the flagship image encoder (round 4).

S1 (R50 backbone + SECONDFPN neck, 6 cams @ 256x704 bf16) measures 28 ms at
6.8 TFLOP/s — ~3.4% MFU where XLA ResNets typically reach 40%+.  This probe
slope-times backbone-only, neck-only, and per-stage prefixes to locate the
sink (stem? a layout boundary? the neck resizes?).  Writes
.probe_image_encoder.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K1, K2 = 4, 12


def _dump(rep):
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".probe_image_encoder.json")
    with open(out, "w") as f:
        json.dump(rep, f, indent=1)


def main():
    import numpy as np

    import jax
    import jax.numpy as jnp

    from occformer_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from tools.tpu_train_trial import build_trial

    model, _, _, _ = build_trial(
        "occformer_tpu/configs/occformer_nusc_r50_256x704.py")
    model = model.clone(train=False)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randn(1, 6, 256, 704, 3).astype(np.float32))

    import flax.linen as nn

    rep = {"device_kind": jax.devices()[0].device_kind}

    key = jax.random.PRNGKey(0)

    def ie(mod, b):
        return mod.image_encoder(b.astype(mod.dtype))

    def bb_only(mod, b):
        x = b.astype(mod.dtype).reshape(6, 256, 704, 3)
        return mod.backbone(x)

    def neck_only(mod, feats):
        return mod.neck(list(feats))

    variables = jax.jit(
        lambda: model.init({"params": key, "dropout": key},
                           method=ie, b=imgs))()

    feats_shape = jax.eval_shape(
        lambda v, b: model.apply(v, method=bb_only, b=b), variables, imgs)
    feats = tuple(jnp.asarray(rng.randn(*s.shape).astype(np.float32),
                              s.dtype) for s in feats_shape)

    def _t(fn):
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    def slope(make):
        ts = []
        for k in (K1, K2):
            jf = jax.jit(make(k))
            float(jax.device_get(jf()))
            ts.append(min(_t(lambda: float(jax.device_get(jf())))
                          for _ in range(3)))
        return round((ts[1] - ts[0]) / (K2 - K1) * 1e3, 3)

    def scan_over(fn):
        def make(k):
            def f():
                def body(acc, i):
                    out = fn(imgs * (1.0 + 1e-6 * i))
                    leaves = jax.tree_util.tree_leaves(out)
                    return acc + sum(jnp.sum(x.astype(jnp.float32))
                                     for x in leaves), 0
                return jax.lax.scan(body, jnp.float32(0),
                                    jnp.arange(k, dtype=jnp.float32))[0]
            return f
        return make

    for name, m in (("image_encoder", ie), ("backbone", bb_only)):
        try:
            rep[f"{name}_ms"] = slope(scan_over(
                lambda b, mm=m: model.apply(variables, method=mm, b=b)))
        except Exception as e:  # noqa: BLE001
            rep[f"{name}_ms"] = f"FAIL {type(e).__name__}: {e}"
        _dump(rep)

    # neck on fixed random feats (varied by i to defeat CSE)
    def make_neck(k):
        def f():
            def body(acc, i):
                fs = [x * (1.0 + 1e-6 * i) for x in feats]
                out = model.apply(variables, method=neck_only, feats=fs)
                return acc + jnp.sum(out.astype(jnp.float32)), 0
            return jax.lax.scan(body, jnp.float32(0),
                                jnp.arange(k, dtype=jnp.float32))[0]
        return f

    try:
        rep["neck_ms"] = slope(make_neck)
    except Exception as e:  # noqa: BLE001
        rep["neck_ms"] = f"FAIL {type(e).__name__}: {e}"
    _dump(rep)
    print(json.dumps(rep, indent=1))


if __name__ == "__main__":
    main()
