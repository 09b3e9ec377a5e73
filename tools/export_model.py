#!/usr/bin/env python
"""Export the inference forward to a serialized StableHLO artifact.

Deployment path the reference lacks: `jax.export` ahead-of-time lowers the
jitted forward (with weights baked as side inputs) to portable StableHLO that
a serving binary can load without Python model code.  The artifact pairs with
the checkpoint: serve by deserializing and calling with (variables, batch).

Usage:
  python tools/export_model.py <config> --out model.stablehlo \
      [--checkpoint ckpt_dir] [--platform tpu|cpu] [--verify]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--out", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--platform", default=None,
                   help="lowering platform (default: current backend)")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--verify", action="store_true",
                   help="deserialize and re-run on the example batch")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from occformer_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np
    from jax import export as jexport

    from occformer_tpu.config import load_config
    from occformer_tpu.models.detector import OccupancyFormer
    from occformer_tpu.models.mask2former_head import (
        format_results,
        mask_logits_from_embeds,
    )

    cfg = load_config(args.config)
    m = cfg["model"]
    model = OccupancyFormer(
        img_backbone=dict(m["img_backbone"]),
        img_neck=dict(m["img_neck"]),
        img_view_transformer=dict(m["img_view_transformer"]),
        img_bev_encoder_backbone=dict(m["img_bev_encoder_backbone"]),
        img_bev_encoder_neck=dict(m["img_bev_encoder_neck"]),
        pts_bbox_head=dict(m["pts_bbox_head"]),
        train=False,
        dtype=jnp.bfloat16 if cfg.get("compute_dtype") == "bfloat16" else jnp.float32,
    )

    B = args.batch_size
    N = cfg["data_config"].get("Ncams", 1)
    H, W = cfg["data_config"]["input_size"]
    eye3 = np.tile(np.eye(3, dtype=np.float32), (B, N, 1, 1))
    intrins = eye3.copy()
    intrins[..., 0, 0] = 500.0
    intrins[..., 1, 1] = 500.0
    batch = {
        "imgs": np.zeros((B, N, H, W, 3), np.float32),
        "rots": eye3,
        "trans": np.zeros((B, N, 3), np.float32),
        "intrins": intrins,
        "post_rots": eye3,
        "post_trans": np.zeros((B, N, 3), np.float32),
        "bda": np.tile(np.eye(3, dtype=np.float32), (B, 1, 1)),
    }

    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    if args.checkpoint:
        from occformer_tpu.engine.checkpoint import load_checkpoint

        variables = load_checkpoint(args.checkpoint, variables)

    def forward(variables, batch):
        out = model.apply(variables, batch)
        final = mask_logits_from_embeds(out["mask_embeds"][-1], out["mask_feature"])
        return format_results(out["cls_preds"][-1], final)

    kwargs = {}
    if args.platform:
        kwargs["platforms"] = [args.platform]
    exported = jexport.export(jax.jit(forward), **kwargs)(
        jax.tree_util.tree_map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), variables),
        jax.tree_util.tree_map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), batch),
    )
    blob = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"wrote {args.out} ({len(blob) / 1e6:.2f} MB StableHLO, "
          f"platforms={exported.platforms})")

    if args.verify:
        restored = jexport.deserialize(blob)
        out = restored.call(variables, batch)
        print("verify: output", out.shape, out.dtype)


if __name__ == "__main__":
    main()
