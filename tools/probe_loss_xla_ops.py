#!/usr/bin/env python
"""Slope-timed costs of the XLA ops left in the batched MXU loss (round 5).

After the all-layer batched MXU readout, the train step is 2.34 s with the
model at ~0.88 s — what fills the remaining ~1.4 s of loss?  The pred-side
reads ride the kernel now; the suspects are the GT-side XLA gathers and the
selection machinery, each timed here at EXACT flagship shapes with the
scan-chain slope method (RTT-free):

  topk        uncertainty top-k (k=37632 of S=150528) x (L=10, G=17) rows
  argsort     sort_points_by_row keys (L=10, S=150528) + coord take
  gt_cand     [L*B, S] trilinear reads of the 17 one-hot GT channels
              (jnp one-hot path) at the 256x256x32 GT grid
  gt_labels   same reads via 8-corner LABEL gather + per-class compare
              (the candidate replacement: 17x less gather traffic)
  tgt_rand    per-slot random-fill GT reads [L*B*G, n_rand]
  take_sel    the take_along_axis selections of sup_pred/sup_tgt

Writes .probe_loss_xla_ops.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K1, K2 = 3, 9
L, B, G, S = 10, 1, 17, 150528
NUNC = 37632
NRAND = 12544
XG, YG, ZG = 256, 256, 32


def main():
    import numpy as np

    import jax
    import jax.numpy as jnp

    from occformer_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    from occformer_tpu.ops.sampling import point_sample_3d

    rng = np.random.RandomState(0)
    rep = {"device_kind": jax.devices()[0].device_kind}
    out_p = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".probe_loss_xla_ops.json")

    def dump():
        with open(out_p, "w") as f:
            json.dump(rep, f, indent=1)

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
        return round((ts[1] - ts[0]) / (K2 - K1) * 1e3, 2)

    def scan_over(fn, *args):
        def make(k):
            def f():
                def body(acc, i):
                    out = fn(*(a * (1.0 + 1e-6 * i) if a.dtype != jnp.int32
                               else a for a in args), i)
                    return acc + jnp.sum(out.astype(jnp.float32)), 0
                return jax.lax.scan(body, jnp.float32(0),
                                    jnp.arange(k, dtype=jnp.float32))[0]
            return f
        return make

    # ---- topk ----------------------------------------------------------
    logits = jnp.asarray(rng.randn(L, B, G, S), jnp.float32)

    def topk(lg, i):
        _, idx = jax.lax.top_k(-jnp.abs(lg), NUNC)
        return idx.astype(jnp.float32)[..., ::4096]

    rep["topk_LG_rows_ms"] = slope(scan_over(topk, logits))
    dump()

    # ---- argsort + coord take (sort_points_by_row) ---------------------
    pts = jnp.asarray(rng.rand(L, S, 3), jnp.float32)

    def srt(p, i):
        keys = jnp.floor(p[..., 0] * 128) * 128 + jnp.floor(p[..., 1] * 128)
        order = jnp.argsort(keys, axis=-1)
        return jnp.take_along_axis(p, order[..., None], axis=-2)[..., ::512, 0]

    rep["argsort_take_ms"] = slope(scan_over(srt, pts))
    dump()

    # ---- gt reads: one-hot channel trilinear vs label gather -----------
    gt = jnp.asarray(rng.randint(0, G, (XG, YG, ZG)), jnp.int32)
    cand = jnp.asarray(rng.rand(L, S, 3), jnp.float32)
    gt_ch = (gt[..., None] == jnp.arange(G)[None, None, None]).astype(
        jnp.float32)  # [XG, YG, ZG, G]

    def gt_onehot(c, i):
        o = jax.vmap(lambda p: point_sample_3d(
            gt_ch[None], p[None], align_corners=False,
            padding_mode="border")[0])(c)
        return o[..., ::512, :]

    rep["gt_onehot_channels_ms"] = slope(scan_over(gt_onehot, cand))
    dump()

    def gt_labels(c, i):
        # 8-corner label gather + per-class compare (exact same math:
        # trilerp of (gt == class) one-hots)
        cx = jnp.clip(c[..., 0] * XG - 0.5, 0.0, XG - 1)
        cy = jnp.clip(c[..., 1] * YG - 0.5, 0.0, YG - 1)
        cz = jnp.clip(c[..., 2] * ZG - 0.5, 0.0, ZG - 1)
        x0, y0, z0 = jnp.floor(cx), jnp.floor(cy), jnp.floor(cz)
        wx, wy, wz = cx - x0, cy - y0, cz - z0
        acc = jnp.zeros(c.shape[:-1] + (G,), jnp.float32)
        flat = gt.reshape(-1)
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    xi = jnp.clip(x0 + dx, 0, XG - 1).astype(jnp.int32)
                    yi = jnp.clip(y0 + dy, 0, YG - 1).astype(jnp.int32)
                    zi = jnp.clip(z0 + dz, 0, ZG - 1).astype(jnp.int32)
                    lab = flat[(xi * YG + yi) * ZG + zi]
                    w = (jnp.where(dx, wx, 1 - wx)
                         * jnp.where(dy, wy, 1 - wy)
                         * jnp.where(dz, wz, 1 - wz))
                    acc = acc + w[..., None] * (
                        lab[..., None] == jnp.arange(G)[None, None])
        return acc[..., ::512, :]

    rep["gt_label_gather_ms"] = slope(scan_over(gt_labels, cand))
    dump()

    # ---- per-slot rand-fill gt reads -----------------------------------
    rand_pts = jnp.asarray(rng.rand(L, G, NRAND, 3), jnp.float32)
    gt_b = (gt[None] == jnp.arange(G)[:, None, None, None]).astype(
        jnp.float32)  # [G, XG, YG, ZG] one-hot slot volumes

    def tgtrand(rp, i):
        o = jax.vmap(lambda r: point_sample_3d(
            gt_b[..., None], r, align_corners=False,
            padding_mode="border")[..., 0])(rp)
        return o[..., ::512]

    rep["tgt_rand_perslot_ms"] = slope(scan_over(tgtrand, rand_pts))
    dump()

    # ---- selection takes ------------------------------------------------
    csup = jnp.asarray(rng.randn(L, B, G, S), jnp.float32)
    idx = jnp.asarray(rng.randint(0, S, (L, B, G, NUNC)), jnp.int32)

    def take(cs, i):
        return jnp.take_along_axis(cs, idx, axis=-1)[..., ::1024]

    rep["take_selection_ms"] = slope(scan_over(take, csup))
    dump()
    print(json.dumps(rep, indent=1))


if __name__ == "__main__":
    main()
