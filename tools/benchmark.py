#!/usr/bin/env python
"""Inference FPS benchmark with per-stage timing (fetch-forced).

Reference: tools/analysis_tools/benchmark.py:21-80 (warmup + synchronized
timing); per-stage breakdown analogous to the reference's record_time
cuda.synchronize timers (detectors/occupancyformer.py:19-57).

ROUND-3 METHODOLOGY: `block_until_ready` is a no-op on the axon backend
(NOTES.md "ROUND-3 CORRECTION") — every timed program here returns an
in-program scalar checksum and is timed to the `jax.device_get` of that
scalar, the only honest timing on this backend.  For the canonical driver
artifact use bench.py; for the nested-prefix stage ablation use
tools/bench_stage_ablation.py.

Usage: python tools/benchmark.py [config] [--iters 6] [--stage-breakdown]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config", nargs="?",
                   default="occformer_tpu/configs/occformer_nusc_r50_256x704.py")
    p.add_argument("--iters", type=int, default=6,
                   help="timed fetch-forced repeats (min is reported)")
    p.add_argument("--warmup", type=int, default=1)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--stage-breakdown", action="store_true")
    p.add_argument("--stage", choices=["img", "feat", "full"], default=None,
                   help="time ONE stage program in this process")
    p.add_argument("--cfg-options", nargs="*", default=[],
                   help="a.b.c=value model overrides (for A/B perf runs)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_model_and_batch
    from occformer_tpu.config import parse_override_value
    from occformer_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    overrides = {}
    for kv in args.cfg_options:
        k, v = kv.split("=", 1)
        overrides[k] = parse_override_value(v)
    model, batch = _flagship_model_and_batch(jnp.bfloat16, args.batch_size,
                                             cfg_overrides=overrides or None)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)

    from occformer_tpu.models.mask2former_head import (
        format_results, mask_logits_from_embeds,
    )

    def _ck(tree):
        return jax.tree_util.tree_reduce(
            lambda a, x: a + x.sum().astype(jnp.float32), tree,
            jnp.float32(0))

    def img_enc(variables, batch):
        return _ck(model.apply(variables, batch["imgs"].astype(model.dtype),
                               method=model.image_encoder))

    def feats(variables, batch):
        return _ck(model.apply(variables, batch, method=model.extract_feat))

    def full(variables, batch):
        out = model.apply(variables, batch)
        final_mask = mask_logits_from_embeds(out["mask_embeds"][-1],
                                             out["mask_feature"])
        return _ck(format_results(out["cls_preds"][-1], final_mask))

    variables, batch = jax.device_put((variables, batch))

    def timeit(fn):
        """Min fetch-forced seconds per execution."""
        jf = jax.jit(fn)
        for attempt in range(2):  # transient remote_compile HTTP failures
            try:
                v = float(jax.device_get(jf(variables, batch)))
                break
            except Exception:
                if attempt == 1:
                    raise
                time.sleep(5)
        assert v == v, "non-finite checksum"
        for _ in range(args.warmup):
            float(jax.device_get(jf(variables, batch)))
        best = float("inf")
        for _ in range(args.iters):
            t0 = time.perf_counter()
            float(jax.device_get(jf(variables, batch)))
            best = min(best, time.perf_counter() - t0)
        return best

    if args.stage:
        fn = {"img": img_enc, "feat": feats, "full": full}[args.stage]
        print(json.dumps({"stage": args.stage,
                          "ms_per_call": round(timeit(fn) * 1000, 3)}))
        return

    sec = timeit(full)
    report = {"fps_per_chip": round(args.batch_size / sec, 3),
              "sec_per_frame": round(sec / args.batch_size, 4),
              "method": "fetch-forced scalar checksum (round-3 correction)"}

    if args.stage_breakdown:
        # separately-jitted prefixes (upper bounds: cross-stage fusion lost)
        report["img_encoder_ms"] = round(timeit(img_enc) * 1000, 2)
        report["through_neck_ms"] = round(timeit(feats) * 1000, 2)
        report["full_ms"] = round(sec * 1000, 2)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
