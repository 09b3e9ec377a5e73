#!/usr/bin/env python
"""Convert a released OccFormer .pth checkpoint to occformer_tpu variables.

Usage:
  python tools/convert_checkpoint.py <config> <in.pth> <out_dir>

Builds the model from config, converts the torch state dict
(engine/convert_weights.py), validates every leaf's shape against the model
tree (reporting anything left at init), and saves with orbax.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("pth")
    p.add_argument("out_dir")
    p.add_argument("--allow-missing", action="store_true",
                   help="proceed even if some model leaves were left at init "
                        "(default: any mismatch is a hard error — silent "
                        "partial conversions produce silently-wrong accuracy)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from occformer_tpu.config import load_config
    from occformer_tpu.engine.checkpoint import load_torch_state_dict
    from occformer_tpu.engine.convert_weights import convert_occformer, match_to_tree
    from occformer_tpu.models.detector import OccupancyFormer

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
    )
    # build a dummy batch to init the tree
    import numpy as np

    N = cfg["data_config"].get("Ncams", 1)
    H, W = cfg["data_config"]["input_size"]
    B = 1
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

    sd = load_torch_state_dict(args.pth)
    conv = convert_occformer(sd)
    params, msgs_p = match_to_tree(conv["params"], variables["params"])
    stats, msgs_s = match_to_tree(conv["batch_stats"],
                                  variables.get("batch_stats", {}))
    for msg in msgs_p + msgs_s:
        print("WARN:", msg)
    n_bad = len(msgs_p) + len(msgs_s)
    print(f"{n_bad} leaves left at init")
    if n_bad and not args.allow_missing:
        raise SystemExit(
            f"conversion incomplete ({n_bad} leaves); rerun with "
            "--allow-missing to save anyway")

    from occformer_tpu.engine.checkpoint import save_checkpoint

    out = save_checkpoint(args.out_dir, {"params": params, "batch_stats": stats}, 0)
    print("saved to", out)


if __name__ == "__main__":
    main()
