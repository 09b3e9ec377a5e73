#!/usr/bin/env python
"""AOT HBM budget of a config's training step — without running it.

``jit(train_step).lower(...).compile().memory_analysis()`` gives XLA's exact
temp/argument/output/code byte counts for the compiled program.  This is the
cheap way to answer "does this config fit a chip?" (replacing the reference's
trial-and-error OOM loop): ~6 min of remote compile over the tunnel instead
of a 15+ min trial run, and usable before any data or checkpoint exists.
Model state is built abstractly (eval_shape + zeros), so no device memory is
touched until the compile itself.

Usage:
  python tools/memory_analysis.py [CONFIG] [--num-points N] [--batch-size B]
         [--accum-steps A] [--no-donate]

Prints one JSON line, e.g. (v5e has 15.75 GiB usable HBM; keep
temp+args+code comfortably under it — programs within ~0.5 GiB of the limit
run flaky on the tunnel backend, NOTES.md):
  {"config": "...", "temp_gib": 10.77, "argument_gib": 1.69, ...}
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_train_trial import build_trial  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config", nargs="?",
                   default="occformer_tpu/configs/occformer_nusc_r50_256x704.py")
    p.add_argument("--num-points", type=int, default=None)
    p.add_argument("--match-num-points", type=int, default=None)
    p.add_argument("--gt-chunks", type=int, default=None)
    p.add_argument("--point-chunks", type=int, default=None)
    p.add_argument("--feature-readout", action="store_true")
    p.add_argument("--max-lidar", type=int, default=35000)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--accum-steps", type=int, default=1)
    p.add_argument("--no-donate", action="store_true")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    p.add_argument("--mxu-readout", default=None,
                   choices=["auto", "on", "off", "interpret"])
    p.add_argument("--cfg-options", nargs="*", default=[],
                   help="dot-path config overrides, e.g. "
                        "model.img_bev_encoder_neck.scan_layers=False")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from occformer_tpu.engine.optim import build_optimizer, step_lr_schedule
    from occformer_tpu.engine.train import TrainState, build_train_step
    from occformer_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    overrides = {}
    for kv in args.cfg_options:
        k, v = kv.split("=", 1)
        from occformer_tpu.config import parse_override_value

        overrides[k] = parse_override_value(v)
    model, batch, loss_cfg, cfg = build_trial(
        args.config, args.batch_size, args.max_lidar, args.num_points,
        match_num_points=args.match_num_points, gt_chunks=args.gt_chunks,
        point_chunks=args.point_chunks,
        feature_readout=args.feature_readout or None,
        mxu_readout=args.mxu_readout, cfg_overrides=overrides or None)

    key = jax.random.PRNGKey(0)
    shapes = jax.eval_shape(
        lambda: model.init({"params": key, "dropout": key}, batch))
    zeros = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    params = zeros["params"]
    lr = step_lr_schedule(1e-4, 28000, [20, 23])
    tx = build_optimizer(params, lr=lr, grad_clip=5.0)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        batch_stats=zeros.get("batch_stats", {}),
        opt_state=tx.init(params),
    )
    step_fn = jax.jit(
        build_train_step(model, tx, loss_cfg, accum_steps=args.accum_steps),
        donate_argnums=() if args.no_donate else (0,))

    t0 = time.time()
    compiled = step_fn.lower(state, batch, key).compile()
    compile_s = time.time() - t0
    ma = compiled.memory_analysis()
    gib = 2.0 ** 30
    out = {"config": os.path.basename(args.config),
           "num_points": loss_cfg.num_points,
           "feature_readout": loss_cfg.feature_readout,
           "batch_size": args.batch_size,
           "compile_s": round(compile_s, 1)}
    if ma is None:
        out["error"] = "memory_analysis unavailable on this backend"
    else:
        for name, attr in (("temp_gib", "temp_size_in_bytes"),
                           ("argument_gib", "argument_size_in_bytes"),
                           ("output_gib", "output_size_in_bytes"),
                           ("alias_gib", "alias_size_in_bytes"),
                           ("code_gib", "generated_code_size_in_bytes")):
            v = getattr(ma, attr, None)
            out[name] = round(v / gib, 3) if v is not None else None
        if out.get("temp_gib") is not None:
            # resident-at-once estimate: temps + (non-aliased) args + code
            out["total_gib"] = round(
                out["temp_gib"]
                + max(out["argument_gib"] - (out["alias_gib"] or 0.0), 0.0)
                + (out["output_gib"] or 0.0)
                + (out["code_gib"] or 0.0), 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
