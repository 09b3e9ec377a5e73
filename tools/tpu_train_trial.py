#!/usr/bin/env python
"""One synthetic training step on the real chip at flagship shapes.

Validates that the full nuScenes R50 256x704 training step (forward + losses
+ Hungarian callback + AdamW) compiles and fits in one chip's HBM, and
reports step time + peak memory.

Usage: python tools/tpu_train_trial.py [--num-points 12544] [--steps 3]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-points", type=int, default=12544 * 4)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--max-lidar", type=int, default=35000)
    p.add_argument("--batch-size", type=int, default=1)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from occformer_tpu.config import load_config
    from occformer_tpu.engine.optim import build_optimizer, step_lr_schedule
    from occformer_tpu.engine.train import TrainState, build_loss_cfg, build_train_step
    from occformer_tpu.models.detector import OccupancyFormer
    from occformer_tpu.utils.profiling import device_memory_stats

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(repo, "occformer_tpu/configs/occformer_nusc_r50_256x704.py"))
    m = cfg["model"]
    model = OccupancyFormer(
        img_backbone=dict(m["img_backbone"]),
        img_neck=dict(m["img_neck"]),
        img_view_transformer=dict(m["img_view_transformer"]),
        img_bev_encoder_backbone=dict(m["img_bev_encoder_backbone"]),
        img_bev_encoder_neck=dict(m["img_bev_encoder_neck"]),
        pts_bbox_head=dict(m["pts_bbox_head"]),
        train=True,
        dtype=jnp.bfloat16,
    )
    B, N = args.batch_size, 6
    H, W = cfg["data_config"]["input_size"]
    X, Y, Z = cfg["occ_size"]
    rng = np.random.RandomState(0)
    intrins = np.tile(np.eye(3, dtype=np.float32), (B, N, 1, 1))
    intrins[..., 0, 0] = 1266.0
    intrins[..., 1, 1] = 1266.0
    intrins[..., 0, 2] = W / 2
    intrins[..., 1, 2] = H / 2
    depth = rng.uniform(0, 58, (B, N, H, W)).astype(np.float32)
    depth[depth < 40] = 0.0
    batch = {
        "imgs": rng.randn(B, N, H, W, 3).astype(np.float32),
        "rots": np.tile(np.eye(3, dtype=np.float32), (B, N, 1, 1)),
        "trans": rng.uniform(-1, 1, (B, N, 3)).astype(np.float32),
        "intrins": intrins,
        "post_rots": np.tile(np.eye(3, dtype=np.float32) * 0.44, (B, N, 1, 1)),
        "post_trans": np.zeros((B, N, 3), np.float32),
        "bda": np.tile(np.eye(3, dtype=np.float32), (B, 1, 1)),
        "gt_occ": rng.randint(0, 17, (B, X, Y, Z)).astype(np.int32),
        "gt_depth": depth,
        "lidar_xyz": rng.uniform(0, 1, (B, args.max_lidar, 3)).astype(np.float32),
        "lidar_valid": np.ones((B, args.max_lidar), bool),
    }
    batch["post_rots"][..., 2, 2] = 1.0

    train_pts = dict(m.get("train_cfg", {}).get("pts", {}))
    train_pts["num_points"] = args.num_points
    loss_cfg = build_loss_cfg(dict(m["pts_bbox_head"]), train_pts)
    lr = step_lr_schedule(1e-4, 28000, [20, 23])

    key = jax.random.PRNGKey(0)
    t0 = time.time()
    variables = jax.jit(model.init)({"params": key, "dropout": key}, batch)
    jax.block_until_ready(variables)
    print(f"init: {time.time() - t0:.1f}s", flush=True)
    tx = build_optimizer(variables["params"], lr=lr, grad_clip=5.0)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )
    step_fn = jax.jit(build_train_step(model, tx, loss_cfg), donate_argnums=(0,))

    t0 = time.time()
    state, metrics = step_fn(state, batch, key)
    jax.block_until_ready(metrics)
    print(f"first step (compile): {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    for _ in range(args.steps):
        state, metrics = step_fn(state, batch, key)
    jax.block_until_ready(metrics)
    dt = (time.time() - t0) / args.steps
    out = {k: float(v) for k, v in metrics.items()}
    print(json.dumps({
        "sec_per_step": round(dt, 3),
        "total_loss": out["total_loss"],
        "loss_depth": out["loss_depth"],
        "mem": device_memory_stats(),
    }), flush=True)


if __name__ == "__main__":
    main()
