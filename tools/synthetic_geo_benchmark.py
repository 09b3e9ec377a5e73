#!/usr/bin/env python
"""Flagship-scale geometric-consistency benchmark on synthetic scenes.

Renders box scenes through a nuScenes-like 6-camera rig into BOTH the images
and the 256x256x32 occupancy grid, trains the flagship model on-chip, and
reports held-out SC IoU / class mIoU.  Because images and GT share the exact
camera geometry, held-out accuracy above chance requires the whole
camera->LSS->voxel->head chain to be spatially consistent — the closest
trackable accuracy metric available without the real datasets (see
tests/test_geometric_learnability.py for the tiny CPU version).

Usage:
  python tools/synthetic_geo_benchmark.py [--steps 1500] [--train-scenes 10]
      [--test-scenes 3] [--cpu]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PC = np.array([-51.2, -51.2, -5.0, 51.2, 51.2, 3.0], np.float32)
OCC = (256, 256, 32)
H, W = 256, 704
NCAM = 6
NCLS = 17  # 0 empty + 16 semantic

# camera-to-ego: cam (x right, y down, z fwd) -> ego (x fwd, y left, z up)
R_C2E = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], np.float32)


def _rz(a):
    return np.array([[np.cos(a), -np.sin(a), 0],
                     [np.sin(a), np.cos(a), 0], [0, 0, 1]], np.float32)


ROTS = np.stack([_rz(np.deg2rad(y)) @ R_C2E
                 for y in (0, 60, 120, 180, 240, 300)])
TRANS = np.zeros((NCAM, 3), np.float32)
K = np.array([[560.0, 0, W / 2], [0, 560.0, H / 2], [0, 0, 1]], np.float32)

_palette = np.random.RandomState(42).uniform(-1.5, 1.5, (NCLS, 3)).astype(np.float32)
_palette[0] = 0.0


def make_scene(rng, num_boxes=10):
    gt = np.zeros(OCC, np.int64)
    vx = (PC[3:] - PC[:3]) / np.asarray(OCC)
    xs = (np.arange(OCC[0]) + 0.5) * vx[0] + PC[0]
    ys = (np.arange(OCC[1]) + 0.5) * vx[1] + PC[1]
    zs = (np.arange(OCC[2]) + 0.5) * vx[2] + PC[2]
    for _ in range(num_boxes):
        c = int(rng.integers(1, NCLS))
        ang = rng.uniform(0, 2 * np.pi)
        rad = rng.uniform(6.0, 35.0)
        cx, cy = rad * np.cos(ang), rad * np.sin(ang)
        cz = rng.uniform(-1.5, 0.5)
        sx, sy, sz = rng.uniform(2.0, 6.0, 3) * [1, 1, 0.6]
        ix = np.where(np.abs(xs - cx) < sx / 2)[0]
        iy = np.where(np.abs(ys - cy) < sy / 2)[0]
        iz = np.where(np.abs(zs - cz) < sz / 2)[0]
        gt[np.ix_(ix, iy, iz)] = c

    occ_idx = np.argwhere(gt > 0)
    centers = (occ_idx + 0.5) * vx + PC[:3]
    classes = gt[occ_idx[:, 0], occ_idx[:, 1], occ_idx[:, 2]]

    imgs = np.zeros((NCAM, H, W, 3), np.float32)
    depth = np.zeros((NCAM, H, W), np.float32)
    for n in range(NCAM):
        cam = (np.linalg.inv(ROTS[n]) @ (centers - TRANS[n]).T).T
        z = cam[:, 2]
        ok = z > 1.0
        uv = (K @ cam.T).T
        u = np.where(ok, uv[:, 0] / np.maximum(z, 1e-3), -1)
        v = np.where(ok, uv[:, 1] / np.maximum(z, 1e-3), -1)
        ok &= (u >= 0) & (u < W - 1) & (v >= 0) & (v < H - 1)
        ui = u[ok].astype(np.int64)
        vi = v[ok].astype(np.int64)
        zi = z[ok]
        ci = classes[ok]
        # nearest-wins z-buffer: sort far -> near, later writes win
        order = np.argsort(-zi)
        lin = vi[order] * W + ui[order]
        img_flat = imgs[n].reshape(-1, 3)
        dep_flat = depth[n].reshape(-1)
        img_flat[lin] = _palette[ci[order]]
        dep_flat[lin] = zi[order]
    return gt, imgs, depth, centers, classes


def scene_batch(rng, max_lidar=35000):
    gt, imgs, depth, centers, classes = make_scene(rng)
    sel = rng.permutation(len(centers))[:max_lidar]
    pts = np.zeros((max_lidar, 3), np.float32)
    valid = np.zeros(max_lidar, bool)
    pts01 = (centers[sel] - PC[:3]) / (PC[3:] - PC[:3])
    pts[: len(sel)] = pts01
    valid[: len(sel)] = True
    intrins = np.tile(K, (1, NCAM, 1, 1))
    return {
        "imgs": imgs[None],
        "rots": ROTS[None],
        "trans": TRANS[None],
        "intrins": intrins.astype(np.float32),
        "post_rots": np.tile(np.eye(3, dtype=np.float32), (1, NCAM, 1, 1)),
        "post_trans": np.zeros((1, NCAM, 3), np.float32),
        "bda": np.tile(np.eye(3, dtype=np.float32), (1, 1, 1)),
        "gt_occ": gt[None].astype(np.int32),
        "gt_depth": depth[None],
        "lidar_xyz": pts[None],
        "lidar_valid": valid[None],
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--train-scenes", type=int, default=10)
    p.add_argument("--test-scenes", type=int, default=3)
    p.add_argument("--eval-every", type=int, default=0,
                   help="0 = only final eval")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from occformer_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from occformer_tpu.config import load_config
    from occformer_tpu.engine.optim import build_optimizer, step_lr_schedule
    from occformer_tpu.engine.train import (
        TrainState, build_loss_cfg, build_train_step,
    )
    from occformer_tpu.models.detector import OccupancyFormer
    from occformer_tpu.models.mask2former_head import (
        format_results, mask_logits_from_embeds,
    )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(
        repo, "occformer_tpu/configs/occformer_nusc_r50_256x704.py"))
    m = cfg["model"]
    kw = dict(
        img_backbone=dict(m["img_backbone"]), img_neck=dict(m["img_neck"]),
        img_view_transformer=dict(m["img_view_transformer"]),
        img_bev_encoder_backbone=dict(m["img_bev_encoder_backbone"]),
        img_bev_encoder_neck=dict(m["img_bev_encoder_neck"]),
        pts_bbox_head=dict(m["pts_bbox_head"]),
    )
    model = OccupancyFormer(**kw, train=True, dtype=jnp.bfloat16)
    eval_model = OccupancyFormer(**kw, train=False, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    print("rendering scenes ...", flush=True)
    train_batches = [scene_batch(rng) for _ in range(args.train_scenes)]
    test_batches = [scene_batch(rng) for _ in range(args.test_scenes)]
    # pre-stage every scene on device ONCE: per-step host->device re-upload
    # of the 10 MB batch over the tunnel would otherwise dominate wall time
    train_batches = [jax.device_put(b) for b in train_batches]
    test_batches = [jax.device_put(b) for b in test_batches]

    loss_cfg = build_loss_cfg(m["pts_bbox_head"],
                              dict(m.get("train_cfg", {}).get("pts", {})))
    lr = step_lr_schedule(2e-4, steps_per_epoch=10 ** 6, milestones_epochs=[1])
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    variables = jax.jit(model.init)({"params": key, "dropout": key},
                                    train_batches[0])
    tx = build_optimizer(variables["params"], lr=lr, grad_clip=5.0)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]))
    step = jax.jit(build_train_step(model, tx, loss_cfg), donate_argnums=(0,))

    def predict(variables, batch):
        out = eval_model.apply(variables, batch)
        fm = mask_logits_from_embeds(out["mask_embeds"][-1], out["mask_feature"])
        scores = format_results(out["cls_preds"][-1], fm)
        return jnp.argmax(scores, -1)

    jpred = jax.jit(predict)

    def eval_iou(state):
        inter = np.zeros(NCLS)
        union = np.zeros(NCLS)
        sc_i = sc_u = 0
        v = {"params": state.params, "batch_stats": state.batch_stats}
        up = OCC[0] // 128, OCC[1] // 128, OCC[2] // 16
        for b in test_batches:
            pred = np.asarray(jpred(v, b))[0]
            pred = pred.repeat(up[0], 0).repeat(up[1], 1).repeat(up[2], 2)
            gt = b["gt_occ"][0]
            sc_i += np.sum((pred > 0) & (gt > 0))
            sc_u += np.sum((pred > 0) | (gt > 0))
            for c in range(1, NCLS):
                inter[c] += np.sum((pred == c) & (gt == c))
                union[c] += np.sum((pred == c) | (gt == c))
        present = union[1:] > 0
        miou = float(np.mean((inter[1:] / np.maximum(union[1:], 1))[present]))
        return float(sc_i / max(sc_u, 1)), miou

    print(f"setup done ({time.time()-t0:.0f}s); training {args.steps} steps", flush=True)
    t0 = time.time()
    for it in range(args.steps):
        b = train_batches[it % len(train_batches)]
        state, metrics = step(state, b, key)
        if it == 0:
            print(f"first step (compile) {time.time()-t0:.0f}s", flush=True)
            t0 = time.time()
        if it and it % 100 == 0:
            jax.block_until_ready(state.params["backbone"]["conv1"]["Conv_0"]["kernel"])
            print(f"step {it} ({time.time()-t0:.0f}s)", flush=True)
        if args.eval_every and it and it % args.eval_every == 0:
            sc, miou = eval_iou(state)
            print(json.dumps({"step": it, "heldout_SC_IoU": round(sc, 4),
                              "heldout_mIoU": round(miou, 4),
                              "loss": round(float(metrics["total_loss"]), 2)}),
                  flush=True)
    dt = (time.time() - t0) / max(args.steps - 1, 1)
    sc, miou = eval_iou(state)
    print(json.dumps({
        "metric": "synthetic_geo_heldout",
        "steps": args.steps, "sec_per_step": round(dt, 4),
        "heldout_SC_IoU": round(sc, 4), "heldout_mIoU": round(miou, 4),
    }))


if __name__ == "__main__":
    main()
