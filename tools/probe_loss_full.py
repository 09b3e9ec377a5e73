#!/usr/bin/env python
"""Slope-time THE WHOLE mask2former_loss grad at flagship shapes, A/B over
mxu_readout — isolates the loss program from the rest of the train step
(the 3-step trial measured 14.85 s/step with mxu_readout=on vs 4.22 s
before, while the kernel readouts alone are ~20 ms/layer: something else in
the loss program must dominate).  Also times matching-only and scoring
sub-pieces when the full A/B localizes there.  Writes .probe_loss_full.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K1, K2 = 2, 5


def _dump(rep):
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".probe_loss_full.json")
    with open(out, "w") as f:
        json.dump(rep, f, indent=1)


def main():
    import dataclasses

    import numpy as np

    import jax
    import jax.numpy as jnp

    from occformer_tpu.losses.mask2former_loss import mask2former_loss
    from occformer_tpu.utils.compile_cache import enable_compile_cache
    from tools.tpu_train_trial import build_trial

    enable_compile_cache()
    model, batch, loss_cfg, cfg = build_trial(
        "occformer_tpu/configs/occformer_nusc_r50_256x704.py")
    rng = np.random.RandomState(0)
    rep = {"device_kind": jax.devices()[0].device_kind}

    L, B, Q, Cq = 10, 1, 100, 256
    gt = jnp.asarray(batch["gt_occ"])
    rep["gt_shape"] = list(gt.shape)
    X, Y, Z, Cf = 128, 128, 16, 192
    cls = jnp.asarray(rng.randn(L, B, Q, loss_cfg.num_classes + 1)
                      .astype(np.float32))
    emb = jnp.asarray(rng.randn(L, B, Q, Cf).astype(np.float32) * 0.1)
    feat = jnp.asarray(rng.randn(B, X, Y, Z, Cf).astype(np.float32) * 0.1)
    lidar = jnp.asarray(batch["lidar_xyz"])
    lidar_valid = jnp.asarray(batch["lidar_valid"])
    rep["lidar_shape"] = list(lidar.shape)

    def _t(fn):
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    def slope(make):
        ts = []
        for k in (K1, K2):
            jf = jax.jit(make(k))
            t0 = time.perf_counter()
            float(jax.device_get(jf(emb, feat)))
            if k == K1:
                rep["first_compile_s"] = round(time.perf_counter() - t0, 1)
            ts.append(min(_t(lambda: float(jax.device_get(jf(emb, feat))))
                          for _ in range(2)))
        return round((ts[1] - ts[0]) / (K2 - K1) * 1e3, 1)

    for mode in ("on", "off"):
        lc = dataclasses.replace(loss_cfg, mxu_readout=mode)

        def loss_fn(e, f):
            out = mask2former_loss(
                jax.random.PRNGKey(0), cls, e, f, gt, lc,
                lidar_xyz=lidar, lidar_valid=lidar_valid)
            return sum(v for k, v in out.items() if "loss" in k)

        def make(k):
            def g(e, f):
                def body(acc, i):
                    gr = jax.grad(lambda ee: loss_fn(ee * (1 + 1e-6 * i),
                                                     f))(e)
                    return acc + jnp.sum(gr), 0
                return jax.lax.scan(body, jnp.float32(0),
                                    jnp.arange(k, dtype=jnp.float32))[0]
            return g

        try:
            rep[f"full_loss_grad_{mode}_ms"] = slope(make)
        except Exception as e:  # noqa: BLE001
            rep[f"full_loss_grad_{mode}_ms"] = f"FAIL {type(e).__name__}: {e}"
        _dump(rep)

    print(json.dumps(rep, indent=1))


if __name__ == "__main__":
    main()
