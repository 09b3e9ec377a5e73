#!/usr/bin/env python
"""Training CLI: config -> model + loader + pjit train loop.

Replaces reference tools/train.py + apis/{train.py, mmdet_train.py}: instead
of runner/hook machinery, a plain epoch loop around one jitted train step on
a data mesh, with orbax checkpointing and periodic eval.

Usage:
  python tools/train.py occformer_tpu/configs/occformer_nusc_r50_256x704.py \
      --work-dir work_dirs/nusc_r50 [--cfg-options model.foo=bar ...]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--work-dir", default=None)
    p.add_argument("--resume-from", default=None)
    p.add_argument("--load-from", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-steps", type=int, default=None,
                   help="cap total steps (debug)")
    p.add_argument("--cfg-options", nargs="*", default=[])
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from occformer_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from occformer_tpu.parallel.mesh import maybe_init_distributed

    maybe_init_distributed()
    import jax.numpy as jnp

    from occformer_tpu.config import load_config, parse_override_value
    from occformer_tpu.data.loader import build_dataloader
    from occformer_tpu.engine.checkpoint import (
        latest_checkpoint, load_checkpoint, save_checkpoint,
    )
    from occformer_tpu.engine.optim import (
        backbone_freeze_mask, build_optimizer, step_lr_schedule,
    )
    from occformer_tpu.engine.train import (
        TrainState, build_loss_cfg, build_train_step,
    )
    from occformer_tpu.models.detector import OccupancyFormer
    from occformer_tpu.parallel.mesh import (
        batch_sharding, make_mesh, replicate_sharding,
    )
    from occformer_tpu.registry import DATASETS, build_from_cfg

    overrides = {}
    for kv in args.cfg_options:
        k, v = kv.split("=", 1)
        overrides[k] = parse_override_value(v)
    cfg = load_config(args.config, overrides)
    work_dir = args.work_dir or os.path.join(
        "work_dirs", os.path.splitext(os.path.basename(args.config))[0]
    )
    os.makedirs(work_dir, exist_ok=True)

    dtype = jnp.bfloat16 if cfg.get("compute_dtype") == "bfloat16" else jnp.float32
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
        dtype=dtype,
    )

    dataset = build_from_cfg(dict(cfg["data"]["train"]), DATASETS)
    n_hosts = jax.process_count()
    loader = build_dataloader(
        dataset,
        samples_per_gpu=cfg["data"].get("samples_per_gpu", 1) * jax.local_device_count(),
        seed=args.seed,
        num_hosts=n_hosts,
        host_id=jax.process_index(),
        max_points=cfg.get("max_lidar_points", 35000),
    )
    steps_per_epoch = len(loader)
    max_epochs = cfg.get("runner", {}).get("max_epochs", 24)

    opt_cfg = cfg.get("optimizer", {})
    lr = step_lr_schedule(
        opt_cfg.get("lr", 1e-4), steps_per_epoch,
        cfg.get("lr_config", {}).get("step", [20, 23]),
    )
    grad_clip = cfg.get("optimizer_config", {}).get("grad_clip", {}).get("max_norm", 5.0)
    loss_cfg = build_loss_cfg(dict(m["pts_bbox_head"]), dict(m.get("train_cfg", {}).get("pts", {})))

    mesh = make_mesh(cfg.get("mesh", {}).get("axes", ("data",)))
    rep = replicate_sharding(mesh)

    # init from the first batch
    first = next(iter(loader))
    first.pop("_meta", None)
    rng = jax.random.PRNGKey(args.seed)
    variables = jax.jit(model.init)({"params": rng, "dropout": rng}, first)

    # pretrained-backbone init, reference-recipe parity: torchvision R50
    # (img_backbone.pretrained), mmcls EfficientNet-B7 (init_cfg=Pretrained
    # prefix='backbone'), FCOS3D R101-DCN (load_from=<raw .pth>, partial)
    from occformer_tpu.engine.pretrained import init_from_pretrained

    load_from = args.load_from or cfg.get("load_from")
    variables, pret_reports = init_from_pretrained(
        variables, m, load_from=load_from)
    for preport in pret_reports:
        if preport.get("found") is False:
            print(f"WARNING: pretrained init {preport['source']} not found; "
                  "keeping random init for that subtree")
        else:
            kept = preport.get("kept_init", [])
            print(f"pretrained init from {preport['source']} "
                  f"({preport['kind']}); kept_init={len(kept)}")
            for msg in kept:
                print("  " + msg)

    # mmdet load_from on a CONVERTED orbax checkpoint: initialize full model
    # weights ({'params','batch_stats'} tree written by
    # tools/convert_checkpoint.py), step stays 0 (apis/mmdet_train.py:195-198).
    # Raw torch .pth load_from is the partial-load path above; resume takes
    # precedence over both.
    if load_from and not str(load_from).endswith((".pth", ".pt")):
        lf = latest_checkpoint(load_from) or load_from
        if os.path.isdir(lf):
            target = {"params": variables["params"],
                      "batch_stats": variables.get("batch_stats", {})}
            restored = load_checkpoint(lf, target)
            variables = {**variables, **restored}
            print(f"loaded model weights from {lf}")
        else:
            print(f"WARNING: load_from={load_from} not found; "
                  "training from random init")

    tx = build_optimizer(
        variables["params"], lr=lr,
        weight_decay=opt_cfg.get("weight_decay", 0.01),
        betas=tuple(opt_cfg.get("betas", (0.9, 0.999))),
        eps=opt_cfg.get("eps", 1e-8), grad_clip=grad_clip,
        freeze_mask=backbone_freeze_mask(
            variables["params"], cfg["model"].get("img_backbone")),
    )
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )
    resume = args.resume_from or latest_checkpoint(os.path.join(work_dir, "ckpts"))
    if resume:
        state = load_checkpoint(resume, state)
        print(f"resumed from {resume} at step {int(state.step)}")

    state = jax.device_put(state, rep)
    # mmcv GradientCumulativeOptimizerHook parity: optimizer_config.cumulative_iters
    accum = int(cfg.get("optimizer_config", {}).get("cumulative_iters", 1))
    train_step = jax.jit(
        build_train_step(model, tx, loss_cfg, accum_steps=accum),
        in_shardings=(rep, batch_sharding(mesh), rep),
        donate_argnums=(0,),
    )

    # per-epoch eval + best-checkpoint tracking (reference OccDistEvalHook,
    # core/evaluation/eval_hooks.py:27-88 with evaluation.save_best)
    eval_cfg = cfg.get("evaluation", {}) or {}
    eval_every = eval_cfg.get("interval", 0)
    save_best_key = eval_cfg.get("save_best")
    best_metric = -float("inf")

    def run_eval(state):
        from occformer_tpu.engine.eval import evaluate, format_iou_table

        val_cfg = cfg.get("data", {}).get("val")
        if not val_cfg:
            return None
        # eval datasets run in test_mode (mmdet build_dataset(...,
        # dict(test_mode=True))): IO errors must surface, never be silently
        # replaced by the train-mode corrupt-sample retry
        val_ds = build_from_cfg({**dict(val_cfg), "test_mode": True}, DATASETS)
        val_loader = build_dataloader(
            val_ds, samples_per_gpu=1, shuffle=False,
            num_hosts=n_hosts, host_id=jax.process_index(),
            max_points=cfg.get("max_lidar_points", 35000),
        )
        eval_model = model.clone(train=False)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        head_cfg = cfg["model"].get("pts_bbox_head", {}) or {}
        results = evaluate(
            eval_model, variables, val_loader,
            occ_size=tuple(cfg.get("occ_size", (32, 32, 16))),
            num_classes=cfg.get("num_class", 17),
            class_names=cfg.get("class_names"),
            compute_ssc="semkitti" in str(save_best_key).lower(),
            panoptic=head_cfg.get("type") == "Mask2FormerNuscPanopticOccHead",
            thing_indices=head_cfg.get("thing_indices"),
        )
        print(format_iou_table(results))
        return results

    # Preemption safety: SIGTERM/SIGINT triggers a checkpoint save + clean
    # exit so preemptible TPU jobs resume losslessly (the reference can only
    # resume from the last per-epoch checkpoint).
    import signal

    stop_requested = {"flag": False}

    def _graceful_stop(signum, frame):
        stop_requested["flag"] = True

    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(sig, _graceful_stop)
        except ValueError:
            pass  # non-main thread

    log_every = cfg.get("log_config", {}).get("interval", 50)
    step = int(state.step)
    with mesh:
        for epoch in range(step // max(steps_per_epoch, 1), max_epochs):
            loader.set_epoch(epoch)
            t0 = time.time()
            # device prefetch: batch i+1's H2D copy rides under step i's compute
            from occformer_tpu.data.loader import prefetch_to_mesh

            for batch in prefetch_to_mesh(loader, mesh):
                if stop_requested["flag"]:
                    save_checkpoint(os.path.join(work_dir, "ckpts"),
                                    jax.device_get(state), step,
                                    cfg.get("checkpoint_config", {}).get("max_keep_ckpts", 1))
                    print(f"preempted: checkpoint saved at step {step}")
                    return
                state, metrics = train_step(state, batch, rng)
                step += 1
                if step % log_every == 0:
                    m_host = {k: float(v) for k, v in metrics.items()}
                    dt = (time.time() - t0) / log_every
                    t0 = time.time()
                    print(json.dumps({"step": step, "epoch": epoch,
                                      "sec/iter": round(dt, 3), **m_host}))
                if args.max_steps and step >= args.max_steps:
                    break
            save_checkpoint(os.path.join(work_dir, "ckpts"), jax.device_get(state),
                            step, cfg.get("checkpoint_config", {}).get("max_keep_ckpts", 1))
            if eval_every and (epoch + 1) % eval_every == 0 and not args.max_steps:
                results = run_eval(state)
                if results and save_best_key and save_best_key in results:
                    if results[save_best_key] > best_metric:
                        best_metric = results[save_best_key]
                        save_checkpoint(os.path.join(work_dir, "best"),
                                        jax.device_get(state), step, 1)
                        print(f"new best {save_best_key}={best_metric:.4f}")
            if args.max_steps and step >= args.max_steps:
                break
    print("training done at step", step)


if __name__ == "__main__":
    main()
