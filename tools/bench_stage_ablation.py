#!/usr/bin/env python
"""Fetch-forced per-stage ablation of the flagship inference forward.

Round-3 probes established the flagship runs ~1.6 s/frame of GENUINE device
compute at ~0.7% MFU while the same chip does 207 TFLOP/s on matmul chains
(NOTES.md "ROUND-3 CORRECTION").  This locates where the time goes by
timing nested prefixes of the model, each as its own jitted program whose
scalar checksum is fetched (the only honest timing on this backend):

  S1  image_encoder            — R50 backbone + SECONDFPN neck, 6 cams
  S2  + view transformer       — DepthNet + LSS lift/scatter
  S3  + 3D encoder + bev neck  — dual-path transformer + MSDeformAttn3D
                                 pixel decoder (= extract_feat)
  S4  full model               — + Mask2Former head (= bench.py primary)

Stage time = t(Sk) - t(Sk-1).  Each stage also gets an analytic FLOP count
(utils/flops.py) so the report carries per-stage MFU.  Writes
.probe_stage_ablation.json at the repo root.

NOTE (round-1 claim, re-examined): "separately-jitted segments are
unreliable (executable thrash)" was itself measured with block_until_ready
acks; fetch-forced timings of distinct executables are as honest as any
other fetch.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed_fetch(call, n=5):
    """(min fetch-forced sec, first-call sec incl. compile)."""
    import jax

    t0 = time.time()
    for attempt in range(2):
        try:
            v = float(jax.device_get(call()))
            break
        except Exception:
            if attempt == 1:
                raise
            time.sleep(5)
    first = time.time() - t0
    assert v == v, "non-finite checksum"
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        float(jax.device_get(call()))
        best = min(best, time.perf_counter() - t0)
    return best, first


def main():
    import jax
    import jax.numpy as jnp

    from occformer_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from occformer_tpu.models.mask2former_head import (
        format_results, mask_logits_from_embeds)
    from occformer_tpu.utils.flops import count_flops
    from __graft_entry__ import _flagship_model_and_batch

    model, batch = _flagship_model_and_batch(jnp.bfloat16)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)

    def _ck(tree):
        return jax.tree_util.tree_reduce(
            lambda a, x: a + x.sum().astype(jnp.float32), tree,
            jnp.float32(0))

    def s1(v, b):
        return _ck(model.apply(
            v, b["imgs"].astype(model.dtype), method="image_encoder"))

    def s2(v, b):
        def m(mod, b):
            x = mod.image_encoder(b["imgs"].astype(mod.dtype))
            return mod.view_transformer(
                x, b["rots"], b["trans"], b["intrins"],
                b["post_rots"], b["post_trans"], b["bda"])

        return _ck(model.apply(v, b, method=m))

    def s2b(v, b):
        def m(mod, b):
            x = mod.image_encoder(b["imgs"].astype(mod.dtype))
            volume, depth_prob = mod.view_transformer(
                x, b["rots"], b["trans"], b["intrins"],
                b["post_rots"], b["post_trans"], b["bda"])
            return mod.bev_backbone(
                volume.astype(mod.bev_backbone.dtype)), depth_prob

        return _ck(model.apply(v, b, method=m))

    def s3(v, b):
        return _ck(model.apply(v, b, method="extract_feat"))

    def s4(v, b):
        out = model.apply(v, b)
        final = mask_logits_from_embeds(out["mask_embeds"][-1],
                                        out["mask_feature"])
        return _ck(format_results(out["cls_preds"][-1], final))

    variables, batch = jax.device_put((variables, batch))
    report = {"stages": {}, "device_kind": jax.devices()[0].device_kind}
    prev_t = 0.0
    prev_f = 0.0
    for name, fn in (("S1_image_encoder", s1),
                     ("S2_plus_view_transformer", s2),
                     ("S2b_plus_bev_backbone", s2b),
                     ("S3_extract_feat", s3),
                     ("S4_full_model", s4)):
        jf = jax.jit(fn)
        sec, first = _timed_fetch(lambda: jf(variables, batch))
        try:
            fl = count_flops(fn, variables, batch)["total"]
        except Exception as e:  # noqa: BLE001
            fl = prev_f
            report["stages"].setdefault("notes", []).append(
                f"{name}: flops uncounted: {type(e).__name__}")
        report["stages"][name] = {
            "cumulative_sec": round(sec, 4),
            "stage_sec": round(sec - prev_t, 4),
            "stage_TFLOP": round((fl - prev_f) / 1e12, 4),
            "stage_TFLOPs_rate": round(
                (fl - prev_f) / max(sec - prev_t, 1e-9) / 1e12, 3),
            "first_call_sec": round(first, 1),
        }
        print(name, json.dumps(report["stages"][name]), flush=True)
        prev_t, prev_f = sec, fl

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".probe_stage_ablation.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
