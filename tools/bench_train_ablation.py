#!/usr/bin/env python
"""Fetch-forced per-stage ablation of the flagship TRAINING step.

Round-4 landed the MXU trilerp kernel + shared-candidate loss readout and the
train step dropped 15.51 -> 4.22 s, but the inference-side ablation
(tools/bench_stage_ablation.py) only explains ~1.2 s of forward+backward —
this tool locates the rest by timing ``value_and_grad`` of nested prefixes of
the train-step loss, each as its own jitted program whose scalar loss is
fetched (the only honest timing on this backend, NOTES.md "ROUND-3
CORRECTION").

  G1   image_encoder                   grad of checksum(feats)
  G2   + view transformer              grad of checksum(volume, depth_prob)
  G2d  + depth BCE loss                real loss_depth term
  G2b  + bev backbone                  grad of checksum(4 scales)
  G3   + bev neck (= extract_feat)     grad of checksum(voxel_feats)
  G4   + head (= full forward)         grad of checksum(model outputs)
  G5   + mask2former loss              the real total loss (no optimizer)
  G6   full train step                 + AdamW/clip (bench.py's number)

Stage time = t(Gk) - t(Gk-1).  Run ONE stage per process (HBM isolation +
honest per-program compile):  ``python tools/bench_train_ablation.py G3``;
results accumulate into .probe_train_ablation.json at the repo root.
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, ".probe_train_ablation.json")
ORDER = ["G1", "G2", "G2d", "G2b", "G3", "G4", "G5", "G5m", "G6s", "G6"]


def _timed_fetch(call, n=4):
    import jax

    t0 = time.time()
    for attempt in range(2):
        try:
            v = float(jax.device_get(call()))
            break
        except Exception:
            if attempt == 1:
                raise
            time.sleep(5)
    first = time.time() - t0
    assert v == v, "non-finite loss/checksum"
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        float(jax.device_get(call()))
        best = min(best, time.perf_counter() - t0)
    return best, first


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else None
    assert stage in ORDER, f"usage: bench_train_ablation.py {{{','.join(ORDER)}}}"

    import jax
    import jax.numpy as jnp

    from occformer_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from occformer_tpu.engine.optim import build_optimizer, step_lr_schedule
    from occformer_tpu.engine.train import TrainState, build_train_step
    from occformer_tpu.losses.mask2former_loss import mask2former_loss
    from occformer_tpu.models.lss import depth_bce_loss
    from tools.tpu_train_trial import build_trial

    model, batch, loss_cfg, cfg = build_trial(
        "occformer_tpu/configs/occformer_nusc_r50_256x704.py")
    key = jax.random.PRNGKey(0)
    variables = jax.jit(model.init)({"params": key, "dropout": key}, batch)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    batch = jax.device_put(batch)

    def _ck(tree):
        return jax.tree_util.tree_reduce(
            lambda a, x: a + x.sum().astype(jnp.float32), tree,
            jnp.float32(0))

    vt_cfg = dict(model.img_view_transformer)

    def run_sub(p, method):
        out, _ = model.apply(
            {"params": p, "batch_stats": batch_stats}, batch, method=method,
            mutable=["batch_stats"], rngs={"dropout": key})
        return out

    def g1(p):
        def m(mod, b):
            return mod.image_encoder(b["imgs"].astype(mod.dtype))
        return _ck(run_sub(p, m))

    def _vt(mod, b):
        x = mod.image_encoder(b["imgs"].astype(mod.dtype))
        return mod.view_transformer(
            x, b["rots"], b["trans"], b["intrins"],
            b["post_rots"], b["post_trans"], b["bda"])

    def g2(p):
        return _ck(run_sub(p, _vt))

    def g2d(p):
        def m(mod, b):
            volume, depth_prob = _vt(mod, b)
            return _ck(volume) + depth_bce_loss(
                b["gt_depth"], depth_prob, dict(vt_cfg["grid_config"]),
                vt_cfg.get("downsample", 16),
                vt_cfg.get("loss_depth_weight", 1.0))
        return run_sub(p, m)

    def g2b(p):
        def m(mod, b):
            volume, depth_prob = _vt(mod, b)
            return mod.bev_backbone(
                volume.astype(mod.bev_backbone.dtype)), depth_prob
        return _ck(run_sub(p, m))

    def g3(p):
        return _ck(run_sub(p, "extract_feat"))

    def g4(p):
        out, _ = model.apply(
            {"params": p, "batch_stats": batch_stats}, batch,
            mutable=["batch_stats"], rngs={"dropout": key})
        return _ck(out)

    def g5(p):
        out, _ = model.apply(
            {"params": p, "batch_stats": batch_stats}, batch,
            mutable=["batch_stats"], rngs={"dropout": key})
        losses = mask2former_loss(
            key, out["cls_preds"], out["mask_embeds"], out["mask_feature"],
            batch["gt_occ"], loss_cfg, lidar_xyz=batch.get("lidar_xyz"),
            lidar_valid=batch.get("lidar_valid"))
        losses["loss_depth"] = depth_bce_loss(
            batch["gt_depth"], out["depth_prob"], dict(vt_cfg["grid_config"]),
            vt_cfg.get("downsample", 16), vt_cfg.get("loss_depth_weight", 1.0))
        return sum(v for k, v in losses.items() if "loss" in k)

    def g5m(p):
        # G5 + the train-time point_mean_iou metric (grad-free): the G5->G6
        # delta discriminator — build_train_step computes this every step
        # (engine/train.py _train_point_miou_device); if G5m ~= G6 the
        # "composition tail" is the METRIC's formatted-voxel readout
        from occformer_tpu.engine.train import _train_point_miou_device
        import numpy as _np

        out, _ = model.apply(
            {"params": p, "batch_stats": batch_stats}, batch,
            mutable=["batch_stats"], rngs={"dropout": key})
        losses = mask2former_loss(
            key, out["cls_preds"], out["mask_embeds"], out["mask_feature"],
            batch["gt_occ"], loss_cfg, lidar_xyz=batch.get("lidar_xyz"),
            lidar_valid=batch.get("lidar_valid"))
        losses["loss_depth"] = depth_bce_loss(
            batch["gt_depth"], out["depth_prob"], dict(vt_cfg["grid_config"]),
            vt_cfg.get("downsample", 16), vt_cfg.get("loss_depth_weight", 1.0))
        b2 = dict(batch)
        if "lidar_label" not in b2:
            b2["lidar_label"] = jnp.asarray(_np.random.RandomState(1).randint(
                0, loss_cfg.num_classes, batch["lidar_xyz"].shape[:2]))
        miou = _train_point_miou_device(out, b2, loss_cfg.num_classes)
        # keep the metric live (0.0 * miou would be DCE'd — the G1-G5
        # forward-only mirage all over again) but NaN-safe and value-inert
        miou = jnp.where(jnp.isnan(miou), jnp.float32(0), miou)
        return sum(v for k, v in losses.items() if "loss" in k) + 1e-12 * miou

    if stage in ("G6", "G6s"):
        if stage == "G6s":
            # discriminator: plain SGD, no clip/decay/moments — if G6s stays
            # ~G6-slow the 2.28 s optimizer-stage delta is program-level
            # composition, not the tx
            import optax
            tx = optax.sgd(1e-4)
        else:
            tx = build_optimizer(params, lr=step_lr_schedule(1e-4, 28000, [20, 23]),
                                 grad_clip=5.0)
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           batch_stats=batch_stats, opt_state=tx.init(params))
        step_fn = jax.jit(build_train_step(model, tx, loss_cfg))
        holder = {"state": state}

        def call():
            holder["state"], m = step_fn(holder["state"], batch, key)
            return m["total_loss"]
    else:
        fn = {"G1": g1, "G2": g2, "G2d": g2d, "G2b": g2b, "G3": g3,
              "G4": g4, "G5": g5, "G5m": g5m}[stage]
        # the grads MUST be consumed: returning only the value lets XLA
        # dead-code-eliminate the entire backward, which silently turned
        # G1-G5 into FORWARD-only measurements (caught 2026-08-20 when the
        # "optimizer tail" G6-G5 delta equaled the whole backward)
        def val_plus_gradsum(p):
            v, g = jax.value_and_grad(fn)(p)
            return v + sum(jnp.sum(x.astype(jnp.float32))
                           for x in jax.tree_util.tree_leaves(g)) * 1e-12

        gfn = jax.jit(val_plus_gradsum)

        def call():
            return gfn(params)

    sec, first = _timed_fetch(call)
    rec = {"sec": round(sec, 4), "first_call_sec": round(first, 1),
           "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
    report = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            report = json.load(f)
    report.setdefault("stages", {})[stage] = rec
    report["device_kind"] = jax.devices()[0].device_kind
    # recompute deltas over whatever stages exist so far
    prev = 0.0
    for s in ORDER:
        if s in report["stages"]:
            report["stages"][s]["stage_sec"] = round(
                report["stages"][s]["sec"] - prev, 4)
            prev = report["stages"][s]["sec"]
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print(stage, json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
