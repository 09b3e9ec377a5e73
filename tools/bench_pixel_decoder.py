#!/usr/bin/env python
"""Fetch-forced dissection of the pixel decoder (stage S3, the top inference
stage after the round-4 MXU kernel: 0.272 s of the 0.365 s flagship frame).

Variants, each its own jitted program (scalar checksum fetched):

  full          bev_neck forward at flagship shapes (gather_impl=mxu)
  full_bwd      + value_and_grad wrt params
  skip          same but every deform-attn gather replaced by zeros
                ('skip' debug impl) — everything-but-the-gather
  skip_bwd      its backward
  xla           the pre-kernel XLA gather path (regression reference)
  fpn           FPN tail only: lateral + trilinear x2 upsample + 3^3 conv +
                mask_feature conv at [128,128,16]

Usage: python tools/bench_pixel_decoder.py [variant ...] (default: all).
Appends results to .probe_pixel_decoder.json.
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, ".probe_pixel_decoder.json")


def _timed_fetch(call, n=5):
    import jax

    t0 = time.time()
    v = float(jax.device_get(call()))
    first = time.time() - t0
    assert v == v, "non-finite checksum"
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        float(jax.device_get(call()))
        best = min(best, time.perf_counter() - t0)
    return best, first


def main():
    variants = sys.argv[1:] or ["full", "full_bwd", "skip", "skip_bwd", "fpn"]

    import jax
    import jax.numpy as jnp
    import numpy as np

    from occformer_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from occformer_tpu.models.pixel_decoder import MSDeformAttnPixelDecoder3D

    dt = jnp.bfloat16
    # flagship: bev encoder scales fine->coarse, channels [128,256,512,1024]
    shapes = [(128, 128, 16, 128), (64, 64, 8, 256),
              (32, 32, 4, 512), (16, 16, 2, 1024)]
    rng = np.random.RandomState(0)
    feats = [jnp.asarray(rng.randn(1, X, Y, Z, C).astype(np.float32), dt)
             for (X, Y, Z, C) in shapes]

    def build(gather_impl):
        mod = MSDeformAttnPixelDecoder3D(
            in_channels=(128, 256, 512, 1024), strides=(2, 4, 8, 16),
            feat_channels=192, out_channels=192, num_encoder_levels=3,
            num_encoder_layers=6, num_heads=8, num_points=4,
            gather_impl=gather_impl, dtype=dt)
        variables = jax.jit(mod.init)(jax.random.PRNGKey(0), feats)
        return mod, variables

    def _ck(tree):
        return jax.tree_util.tree_reduce(
            lambda a, x: a + x.sum().astype(jnp.float32), tree,
            jnp.float32(0))

    report = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            report = json.load(f)
    report["device_kind"] = jax.devices()[0].device_kind

    for var in variants:
        impl = {"full": "mxu", "full_bwd": "mxu", "skip": "skip",
                "skip_bwd": "skip", "xla": "xla", "xla_bwd": "xla",
                "fpn": "mxu"}[var]
        mod, variables = build(impl)
        if var == "fpn":
            m2 = mod.clone(num_encoder_layers=0)
            v2 = jax.jit(m2.init)(jax.random.PRNGKey(0), feats)
            fn = jax.jit(lambda v: _ck(m2.apply(v, feats)))
            sec, first = _timed_fetch(lambda: fn(v2))
        elif var.endswith("_bwd"):
            fn = jax.jit(lambda p: jax.value_and_grad(
                lambda pp: _ck(mod.apply({"params": pp}, feats)))(p)[0])
            sec, first = _timed_fetch(lambda: fn(variables["params"]))
        else:
            fn = jax.jit(lambda v: _ck(mod.apply(v, feats)))
            sec, first = _timed_fetch(lambda: fn(variables))
        report[var] = {"sec": round(sec, 4), "first_call_sec": round(first, 1),
                       "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
        print(var, json.dumps(report[var]), flush=True)
        with open(OUT, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
