#!/usr/bin/env python
"""Slope-time the GT-GRID (256x256x32, XY=65536) loss kernel calls that
probe_loss_mxu.py never covered, plus a fwd-only full-loss slope — splits
the 7.56 s full-loss grad between the new detached gt readouts and the
differentiated path.  Writes .probe_gtgrid.json.
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

Xg, Yg, Zg = 256, 256, 32
G = 17
S_CAND = 150528
S_MATCH = 50176
N_RAND = 12544
K1, K2 = 3, 9


def _dump(rep):
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".probe_gtgrid.json")
    with open(out, "w") as f:
        json.dump(rep, f, indent=1)


def main():
    import numpy as np

    import jax
    import jax.numpy as jnp

    from occformer_tpu.losses.mask2former_loss import mask2former_loss
    from occformer_tpu.ops.loss_gather import (
        sample_per_slot, sample_volumes_packed, sort_points_by_row)
    from occformer_tpu.utils.compile_cache import enable_compile_cache
    from tools.tpu_train_trial import build_trial

    enable_compile_cache()
    rng = np.random.RandomState(0)
    rep = {"device_kind": jax.devices()[0].device_kind}

    gt = jnp.asarray((rng.rand(G, Xg, Yg, Zg) > 0.9).astype(np.float32))
    cand = jnp.asarray(rng.rand(S_CAND, 3).astype(np.float32))
    cand_s = jax.jit(
        lambda p: sort_points_by_row(p, (Xg, Yg, Zg)))(cand)
    match_s = cand_s[:S_MATCH]
    rand = jnp.asarray(rng.rand(G, N_RAND, 3).astype(np.float32))
    rand_s = jax.jit(
        lambda p: sort_points_by_row(p, (Xg, Yg, Zg)))(rand)

    def _t(fn):
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    def slope(body1, arg):
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

    try:
        rep["gt_cand_packed_fwd_ms"] = slope(
            lambda g: jnp.sum(sample_volumes_packed(
                g, cand_s, False, "border")), gt)
    except Exception as e:  # noqa: BLE001
        rep["gt_cand_packed_fwd_ms"] = f"FAIL {type(e).__name__}: {e}"
    _dump(rep)

    try:
        rep["gt_match_packed_fwd_ms"] = slope(
            lambda g: jnp.sum(sample_volumes_packed(
                g, match_s, False, "border")), gt)
    except Exception as e:  # noqa: BLE001
        rep["gt_match_packed_fwd_ms"] = f"FAIL {type(e).__name__}: {e}"
    _dump(rep)

    try:
        rep["gt_rand_perslot_fwd_ms"] = slope(
            lambda g: jnp.sum(sample_per_slot(
                g[..., None], rand_s, False, "border")), gt)
    except Exception as e:  # noqa: BLE001
        rep["gt_rand_perslot_fwd_ms"] = f"FAIL {type(e).__name__}: {e}"
    _dump(rep)

    # ---- full loss FWD-only slope (mode on), to split fwd vs bwd ----
    model, batch, loss_cfg, cfg = build_trial(
        "occformer_tpu/configs/occformer_nusc_r50_256x704.py")
    L, B, Q, Cf = 10, 1, 100, 192
    gt_occ = jnp.asarray(batch["gt_occ"])
    cls = jnp.asarray(rng.randn(L, B, Q, loss_cfg.num_classes + 1)
                      .astype(np.float32))
    emb = jnp.asarray(rng.randn(L, B, Q, Cf).astype(np.float32) * 0.1)
    feat = jnp.asarray(
        rng.randn(B, 128, 128, 16, Cf).astype(np.float32) * 0.1)
    lidar = jnp.asarray(batch["lidar_xyz"])
    lidar_valid = jnp.asarray(batch["lidar_valid"])

    for mode in ("on", "off"):
        lc = dataclasses.replace(loss_cfg, mxu_readout=mode)

        def loss_fn(e):
            out = mask2former_loss(
                jax.random.PRNGKey(0), cls, e, feat, gt_occ, lc,
                lidar_xyz=lidar, lidar_valid=lidar_valid)
            return sum(v for k, v in out.items() if "loss" in k)

        try:
            rep[f"full_loss_fwd_{mode}_ms"] = slope(
                lambda e: loss_fn(e), emb)
        except Exception as e:  # noqa: BLE001
            rep[f"full_loss_fwd_{mode}_ms"] = f"FAIL {type(e).__name__}: {e}"
        _dump(rep)

    print(json.dumps(rep, indent=1))


if __name__ == "__main__":
    main()
