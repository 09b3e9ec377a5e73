#!/usr/bin/env python
"""One synthetic training step on the real chip at full config shapes.

Validates that a released config's training step (forward + losses +
Hungarian matching + AdamW) compiles and fits in one chip's HBM, and reports
step time + peak memory.  Works for any config (nuScenes 6-cam or KITTI
mono); the batch is synthesized at the config's exact input/occ shapes.

Usage:
  python tools/tpu_train_trial.py [CONFIG] [--num-points N] [--steps K]
         [--batch-size B] [--accum-steps A]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_trial(cfg_path: str, batch_size: int = 1, max_lidar: int = 35000,
                num_points=None, seed: int = 0, match_num_points=None,
                gt_chunks=None, point_chunks=None, feature_readout=None,
                mxu_readout=None, cfg_overrides=None):
    """(model, synthetic batch, loss_cfg, cfg) at a config's exact shapes.

    Shared by the train trial and tools/memory_analysis.py so both drive
    byte-identical programs.
    """
    import jax.numpy as jnp
    import numpy as np

    from occformer_tpu.config import load_config
    from occformer_tpu.engine.train import build_loss_cfg
    from occformer_tpu.models.detector import OccupancyFormer

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if not os.path.isabs(cfg_path):
        cfg_path = os.path.join(repo, cfg_path)
    cfg = load_config(cfg_path, overrides=cfg_overrides)
    m = cfg["model"]
    model = OccupancyFormer(
        img_backbone=dict(m["img_backbone"]),
        img_neck=dict(m["img_neck"]),
        img_view_transformer=dict(m["img_view_transformer"]),
        img_bev_encoder_backbone=dict(m["img_bev_encoder_backbone"]),
        img_bev_encoder_neck=dict(m["img_bev_encoder_neck"]),
        pts_bbox_head=dict(m["pts_bbox_head"]),
        force_fp32_islands=bool(m.get("force_fp32_islands", False)),
        train=True,
        dtype=jnp.bfloat16,
    )
    data_config = cfg["data_config"]
    B = batch_size
    N = data_config.get("Ncams", 1)
    H, W = data_config["input_size"]
    X, Y, Z = cfg["occ_size"]
    head_cfg = dict(m["pts_bbox_head"])
    num_classes = head_cfg.get("num_occupancy_classes", 20)
    is_nusc = head_cfg.get("type", "").startswith("Mask2FormerNusc")
    grid_config = dict(m["img_view_transformer"]["grid_config"])
    d_lo, d_hi = grid_config["dbound"][0], grid_config["dbound"][1]
    # native-scale intrinsics + the aug homography that maps them to the
    # network input: nuScenes images are 1600 wide (fx~1266) resized by
    # W/1600; KITTI inputs are fed at native scale (fx~718, identity aug).
    if is_nusc:
        fx, post_scale = 1266.0, W / 1600.0
        cx, cy = W / 2 / post_scale, H / 2 / post_scale
    else:
        fx, post_scale = 718.0, 1.0
        cx, cy = W / 2, H / 2

    rng = np.random.RandomState(seed)
    # KITTI feeds 3x4 projective intrinsics (P2, data/semantic_kitti.py) and a
    # 4x4 BDA -> 33-dim camera embedding; nuScenes 3x3 + 3x3 -> 27-dim
    # (models/depthnet.py:get_mlp_input, reference :591-646)
    intrins = np.zeros((B, N, 3, 3 if is_nusc else 4), np.float32)
    intrins[..., 0, 0] = fx
    intrins[..., 1, 1] = fx
    intrins[..., 0, 2] = cx
    intrins[..., 1, 2] = cy
    intrins[..., 2, 2] = 1.0
    if not is_nusc:
        intrins[..., 0, 3] = 2.0  # stereo-baseline column of P2
    bda_dim = 3 if is_nusc else 4
    depth = rng.uniform(0, d_hi, (B, N, H, W)).astype(np.float32)
    depth[depth < (d_lo + 0.7 * (d_hi - d_lo))] = 0.0  # sparse LiDAR-like GT
    post_rots = np.tile(np.eye(3, dtype=np.float32) * post_scale, (B, N, 1, 1))
    post_rots[..., 2, 2] = 1.0
    batch = {
        "imgs": rng.randn(B, N, H, W, 3).astype(np.float32),
        "rots": np.tile(np.eye(3, dtype=np.float32), (B, N, 1, 1)),
        "trans": rng.uniform(-1, 1, (B, N, 3)).astype(np.float32),
        "intrins": intrins,
        "post_rots": post_rots,
        "post_trans": np.zeros((B, N, 3), np.float32),
        "bda": np.tile(np.eye(bda_dim, dtype=np.float32), (B, 1, 1)),
        "gt_occ": rng.randint(0, num_classes, (B, X, Y, Z)).astype(np.int32),
        "gt_depth": depth,
    }
    if is_nusc:
        batch["lidar_xyz"] = rng.uniform(0, 1, (B, max_lidar, 3)).astype(np.float32)
        batch["lidar_valid"] = np.ones((B, max_lidar), bool)
    if head_cfg.get("type") == "Mask2FormerNuscPanopticOccHead":
        # panoptic voxel ids class*1000+instance with the padded id table
        S = 100
        ids = np.array([c * 1000 + i for c in range(1, 11) for i in range(5)],
                       np.int32)
        gt = ids[rng.randint(0, len(ids), (B, X, Y, Z))]
        gt[rng.rand(B, X, Y, Z) < 0.8] = 0
        pad = np.full((B, S), -1, np.int64)
        pad[:, : len(ids)] = ids
        batch["gt_occ"] = gt.astype(np.int32)
        batch["panoptic_ids"] = pad

    train_pts = dict(m.get("train_cfg", {}).get("pts", {}))
    if num_points is not None:
        train_pts["num_points"] = num_points
    if match_num_points is not None:
        train_pts["match_num_points"] = match_num_points
    if gt_chunks is not None:
        head_cfg["gt_chunks"] = gt_chunks
    if point_chunks is not None:
        head_cfg["point_chunks"] = point_chunks
    if feature_readout is not None:
        head_cfg["feature_readout"] = feature_readout
    if mxu_readout is not None:
        head_cfg["mxu_readout"] = mxu_readout
    loss_cfg = build_loss_cfg(head_cfg, train_pts)
    return model, batch, loss_cfg, cfg


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config", nargs="?",
                   default="occformer_tpu/configs/occformer_nusc_r50_256x704.py")
    p.add_argument("--num-points", type=int, default=None,
                   help="override the config's train_cfg.pts.num_points")
    p.add_argument("--match-num-points", type=int, default=None,
                   help="cap the matching point count separately from the "
                        "supervision count (MaskLossConfig.match_num_points)")
    p.add_argument("--gt-chunks", type=int, default=None,
                   help="override head gt_chunks (supervision-sampling "
                        "chunking over GT slots)")
    p.add_argument("--point-chunks", type=int, default=None,
                   help="override head point_chunks (differentiated "
                        "supervision readout chunking over points)")
    p.add_argument("--feature-readout", action="store_true",
                   help="feature-space point readout: contract embeds with "
                        "sampled mask features instead of sampling per-slot "
                        "mask volumes (MaskLossConfig.feature_readout)")
    p.add_argument("--cfg-options", nargs="*", default=[],
                   help="dot-path config overrides")
    p.add_argument("--mxu-readout", default=None,
                   choices=["auto", "on", "off", "interpret"],
                   help="override head mxu_readout (all-layer batched MXU "
                        "loss readout; MaskLossConfig.mxu_readout)")
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--max-lidar", type=int, default=35000)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--accum-steps", type=int, default=1)
    p.add_argument("--no-donate", action="store_true",
                   help="disable input-state donation (debug)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from occformer_tpu.engine.optim import build_optimizer, step_lr_schedule
    from occformer_tpu.engine.train import TrainState, build_train_step
    from occformer_tpu.utils.compile_cache import enable_compile_cache
    from occformer_tpu.utils.profiling import device_memory_stats

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
    lr = step_lr_schedule(1e-4, 28000, [20, 23])

    key = jax.random.PRNGKey(0)
    t0 = time.time()
    variables = jax.jit(model.init)({"params": key, "dropout": key}, batch)
    # fetch-force: block_until_ready is a no-op on this backend (NOTES.md
    # "ROUND-3 CORRECTION"); only a value fetch proves completion
    jax.device_get(jax.tree_util.tree_leaves(variables)[0]).ravel()[:1]
    print(f"init: {time.time() - t0:.1f}s", flush=True)
    tx = build_optimizer(variables["params"], lr=lr, grad_clip=5.0)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )
    step_fn = jax.jit(
        build_train_step(model, tx, loss_cfg, accum_steps=args.accum_steps),
        donate_argnums=() if args.no_donate else (0,))

    t0 = time.time()
    state, metrics = step_fn(state, batch, key)
    float(metrics["total_loss"])  # fetch-forced (see init note)
    print(f"first step (compile): {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    for _ in range(args.steps):
        state, metrics = step_fn(state, batch, key)
    # fetching the LAST step's loss bounds all steps (FIFO queue: probe 2
    # measured fetch-last == fetch-all per-exec)
    float(metrics["total_loss"])
    dt = (time.time() - t0) / args.steps
    out = {k: float(v) for k, v in metrics.items()}
    print(json.dumps({
        "config": os.path.basename(args.config),
        "num_points": loss_cfg.num_points,
        "match_num_points": loss_cfg.match_num_points,
        "gt_chunks": loss_cfg.gt_chunks,
        "point_chunks": loss_cfg.point_chunks,
        "feature_readout": loss_cfg.feature_readout,
        "batch_size": args.batch_size,
        "accum_steps": args.accum_steps,
        "sec_per_step": round(dt, 3),
        "total_loss": out["total_loss"],
        "loss_depth": out["loss_depth"],
        "mem": device_memory_stats(),
    }), flush=True)


if __name__ == "__main__":
    main()
