#!/usr/bin/env python
"""Inference FPS benchmark with per-stage timing.

Reference: tools/analysis_tools/benchmark.py:21-80 (warmup + synchronized
timing).  Also reports a per-stage breakdown (image encoder / view transform /
3D encoder+neck / head) using block_until_ready boundaries — the TPU analogue
of the reference's record_time cuda.synchronize timers
(detectors/occupancyformer.py:19-57).

Usage: python tools/benchmark.py [config] [--iters 50] [--stage-breakdown]
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
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--stage-breakdown", action="store_true")
    p.add_argument("--stage", choices=["img", "feat", "full"], default=None,
                   help="time ONE stage program in this process (reliable "
                        "over the tunnel; run one process per stage)")
    p.add_argument("--cfg-options", nargs="*", default=[],
                   help="a.b.c=value model overrides (for A/B perf runs)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_model_and_batch
    from occformer_tpu.config import parse_override_value

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

    def full(variables, batch):
        out = model.apply(variables, batch)
        final_mask = mask_logits_from_embeds(out["mask_embeds"][-1],
                                             out["mask_feature"])
        return format_results(out["cls_preds"][-1], final_mask)

    if args.stage:
        # one program per process: pipelined windows, best-of-3 (see NOTES.md
        # — multiple resident executables thrash the remote server)
        if args.stage == "img":
            fn = lambda v, b: model.apply(
                v, b["imgs"].astype(model.dtype), method=model.image_encoder)
        elif args.stage == "feat":
            fn = lambda v, b: model.apply(v, b, method=model.extract_feat)
        else:
            fn = full
        jfn = jax.jit(fn)
        jax.block_until_ready(jfn(variables, batch))
        for _ in range(args.warmup):
            jax.block_until_ready(jfn(variables, batch))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                r = jfn(variables, batch)
            jax.block_until_ready(r)
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"stage": args.stage,
                          "ms_per_call": round(best / args.iters * 1000, 3)}))
        return

    jfull = jax.jit(full)
    jfull(variables, batch).block_until_ready()
    for _ in range(args.warmup):
        jfull(variables, batch).block_until_ready()

    t0 = time.perf_counter()
    out = None
    for _ in range(args.iters):
        out = jfull(variables, batch)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    fps = args.iters * args.batch_size / dt
    report = {"fps_per_chip": round(fps, 3), "ms_per_frame": round(1000 * dt / (args.iters * args.batch_size), 2)}

    if args.stage_breakdown:
        # stage timings via separately-jitted segments (upper bounds: fusion
        # across stages is lost, but relative cost is informative)
        def img_enc(variables, batch):
            return model.apply(variables, batch["imgs"].astype(model.dtype),
                               method=model.image_encoder)

        def feats(variables, batch):
            return model.apply(variables, batch, method=model.extract_feat)

        j1 = jax.jit(img_enc)
        j2 = jax.jit(feats)
        j1(variables, batch)[0].block_until_ready()
        vf, _ = j2(variables, batch)
        jax.block_until_ready(vf)

        def timeit(f, n=20):
            f()
            t0 = time.perf_counter()
            for _ in range(n):
                r = f()
            jax.block_until_ready(r)
            return (time.perf_counter() - t0) / n * 1000

        report["img_encoder_ms"] = round(timeit(lambda: j1(variables, batch)), 2)
        report["through_neck_ms"] = round(timeit(lambda: j2(variables, batch)), 2)
        report["full_ms"] = round(timeit(lambda: jfull(variables, batch)), 2)
        # Over the remote-chip tunnel, dispatching MULTIPLE programs thrashes
        # the resident executable and inflates these numbers wildly (a stage
        # can report 100x the full model measured above) — trust them only on
        # a locally-attached chip.  See NOTES.md "stage timing".
        report["stage_timing_caveat"] = (
            "unreliable over a remote-chip tunnel (executable thrash); "
            "compare against fps_per_chip above")

    print(json.dumps(report))


if __name__ == "__main__":
    main()
