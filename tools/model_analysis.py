#!/usr/bin/env python
"""Model analysis: params + ANALYTIC FLOPs + MFU for any config.

Replaces reference tools/get_flops.py, tools/analysis_tools/get_params.py and
the fvcore parameter table printed at eval start (apis/test.py:39) — with a
FLOP count that is defensible from first principles instead of mmcv's module
hooks: occformer_tpu/utils/flops.py walks the traced jaxpr and applies the
textbook formula per dot_general / conv / scatter at exact traced shapes.

XLA's ``cost_analysis()`` number is also reported (``--xla-flops``) for
reconciliation: it re-counts rematerialized + fused HLO, which is why it ran
2.87 TFLOP/frame in round 2 — above what the measured frame rate could
physically sustain.  The analytic count is the MFU numerator.

Usage:
  python tools/model_analysis.py [config]            # params + analytic fwd
  python tools/model_analysis.py --train             # + train-step FLOPs
  python tools/model_analysis.py --fps 151.5         # + inference MFU
  python tools/model_analysis.py --step-sec 0.027    # + training MFU
  python tools/model_analysis.py --xla-flops         # + XLA compare (slow)
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def analyze(cfg_path, train=False, xla_flops=False, fps=None, step_sec=None,
            peak=None):
    import jax
    import numpy as np

    from occformer_tpu.utils.flops import (
        TPU_V5E_PEAK_BF16, count_flops)
    from tools.tpu_train_trial import build_trial

    model, batch, loss_cfg, cfg = build_trial(cfg_path)
    key = jax.random.PRNGKey(0)
    variables = jax.eval_shape(
        lambda b: model.init({"params": key, "dropout": key}, b), batch)
    variables = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), dict(variables))

    def count(tree):
        return sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(tree))

    report = {"config": os.path.basename(cfg_path),
              "total_params_M": round(count(variables["params"]) / 1e6, 3)}
    for comp, sub in variables["params"].items():
        report[f"params_M/{comp}"] = round(count(sub) / 1e6, 3)

    # deployment forward: full model + final-layer semantic voxel scores
    # (same program bench.py times; reference apis/test.py single_gpu_test)
    def fwd(v, b):
        from occformer_tpu.models.mask2former_head import (
            format_results, mask_logits_from_embeds)

        # build_trial constructs the train-mode model (BN updates its
        # running stats); discard the mutated collection — FLOP-identical
        # to the inference program
        out, _ = model.apply(v, b, mutable=["batch_stats"],
                             rngs={"dropout": key})
        final = mask_logits_from_embeds(out["mask_embeds"][-1],
                                        out["mask_feature"])
        return format_results(out["cls_preds"][-1], final)

    B = batch["imgs"].shape[0]
    f = count_flops(fwd, variables, batch)
    report["analytic_fwd_TFLOP_per_frame"] = round(f["total"] / B / 1e12, 4)
    for k in ("conv", "dot", "scatter"):
        report[f"analytic_fwd_TFLOP_per_frame/{k}"] = round(
            f[k] / B / 1e12, 4)
    if f["notes"]:
        report["flop_notes"] = f["notes"]

    if train or step_sec:
        from occformer_tpu.engine.optim import (
            build_optimizer, step_lr_schedule)
        from occformer_tpu.engine.train import TrainState, build_train_step
        import jax.numpy as jnp

        tx = build_optimizer(variables["params"],
                             lr=step_lr_schedule(1e-4, 28000, [20, 23]),
                             grad_clip=5.0)
        state = TrainState(step=jnp.zeros((), jnp.int32),
                           params=variables["params"],
                           batch_stats=variables.get("batch_stats", {}),
                           opt_state=tx.init(variables["params"]))
        step_fn = build_train_step(model, tx, loss_cfg)
        t = count_flops(step_fn, state, batch, key)
        report["analytic_train_TFLOP_per_step"] = round(t["total"] / 1e12, 4)
        report["train_fwd_ratio"] = round(t["total"] / f["total"], 2)

    peak = peak or TPU_V5E_PEAK_BF16
    report["peak_TFLOPs_assumed"] = peak / 1e12
    if fps:
        report["inference_mfu"] = round(
            f["total"] / B * fps / peak, 4)
    if step_sec:
        report["train_mfu"] = round(
            report["analytic_train_TFLOP_per_step"] * 1e12
            / step_sec / peak, 4)

    if xla_flops:
        compiled = jax.jit(fwd).lower(variables, batch).compile()
        ca = compiled.cost_analysis()
        if ca:
            xla = ca.get("flops", 0)
            report["xla_cost_analysis_TFLOP_per_frame"] = round(
                xla / B / 1e12, 4)
            report["xla_over_analytic"] = round(xla / max(f["total"], 1), 3)
    return report


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config", nargs="?",
                   default="occformer_tpu/configs/occformer_nusc_r50_256x704.py")
    p.add_argument("--train", action="store_true",
                   help="also count the full train step")
    p.add_argument("--xla-flops", action="store_true",
                   help="compile and compare against XLA cost_analysis")
    p.add_argument("--fps", type=float, default=None,
                   help="measured inference frames/s -> inference MFU")
    p.add_argument("--step-sec", type=float, default=None,
                   help="measured train s/step -> training MFU")
    p.add_argument("--peak-tflops", type=float, default=None,
                   help="hardware peak in TFLOP/s (default v5e bf16 = 197)")
    args = p.parse_args()
    peak = args.peak_tflops * 1e12 if args.peak_tflops else None
    print(json.dumps(analyze(args.config, train=args.train,
                             xla_flops=args.xla_flops, fps=args.fps,
                             step_sec=args.step_sec, peak=peak), indent=1))


if __name__ == "__main__":
    main()
