#!/usr/bin/env python
"""Evaluation / submission CLI (reference tools/test.py + apis/test.py).

Usage:
  python tools/test.py <config> --checkpoint work_dirs/.../ckpts/step_N \
      [--test-save submissions/] [--max-samples N]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--test-save", default=None,
                   help="write leaderboard submission files here")
    p.add_argument("--max-samples", type=int, default=None)
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
    import numpy as np

    from occformer_tpu.config import load_config, parse_override_value
    from occformer_tpu.data.loader import build_dataloader
    from occformer_tpu.engine.checkpoint import load_checkpoint
    from occformer_tpu.engine.eval import evaluate, format_iou_table
    from occformer_tpu.models.detector import OccupancyFormer
    from occformer_tpu.registry import DATASETS, build_from_cfg

    overrides = {}
    for kv in args.cfg_options:
        k, v = kv.split("=", 1)
        overrides[k] = parse_override_value(v)
    cfg = load_config(args.config, overrides)

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
        train=False,
        dtype=dtype,
    )

    # test_mode: IO errors surface instead of hitting the train-mode
    # corrupt-sample retry (mmdet build_dataset(..., dict(test_mode=True)))
    dataset = build_from_cfg({**dict(cfg["data"]["test"]), "test_mode": True},
                             DATASETS)
    loader = build_dataloader(
        dataset, samples_per_gpu=1, shuffle=False,
        num_hosts=jax.process_count(), host_id=jax.process_index(),
        max_points=cfg.get("max_lidar_points", 35000),
    )
    if args.max_samples:
        import itertools

        base_iter = loader.__iter__

        def limited():
            return itertools.islice(base_iter(), args.max_samples)

        loader.__iter__ = limited  # type: ignore

    # variables: checkpoint or random init (debug)
    first = next(iter(loader))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), first)
    if args.checkpoint:
        variables = load_checkpoint(args.checkpoint, variables)

    is_kitti = "SemanticKITTI" in cfg["data"]["test"]["type"]

    save_cb = None
    if args.test_save:
        from occformer_tpu.utils.semkitti_io import (
            write_nusc_lidarseg_bin, write_submission_label,
        )

        def save_cb(out, meta, batch):
            import numpy as _np

            for bi, m in enumerate(meta or []):
                if is_kitti:
                    seq = m.get("sequence", "00")
                    fid = m.get("frame_id", "000000")
                    path = os.path.join(args.test_save, "sequences", seq,
                                        "predictions", fid + ".label")
                    write_submission_label(_np.asarray(out["voxel_pred"][bi]), path)
                elif "point_pred" in out:
                    token = m.get("lidar_token", m.get("sample_idx", f"s{bi}"))
                    valid = _np.asarray(batch["lidar_valid"][bi])
                    preds = _np.asarray(out["point_pred"][bi])[valid]
                    path = os.path.join(args.test_save, "lidarseg", "test",
                                        f"{token}_lidarseg.bin")
                    write_nusc_lidarseg_bin(preds, path)

    head_cfg = cfg["model"].get("pts_bbox_head", {}) or {}
    results = evaluate(
        model, variables, loader,
        occ_size=tuple(cfg["occ_size"]),
        num_classes=cfg["num_class"],
        class_names=cfg.get("class_names"),
        compute_ssc=is_kitti,
        save_cb=save_cb,
        panoptic=head_cfg.get("type") == "Mask2FormerNuscPanopticOccHead",
        thing_indices=head_cfg.get("thing_indices"),
    )
    if args.test_save and not is_kitti:
        import json as _json

        meta_file = os.path.join(args.test_save, "test", "submission.json")
        os.makedirs(os.path.dirname(meta_file), exist_ok=True)
        with open(meta_file, "w") as f:
            _json.dump({"meta": dict(use_lidar=False, use_camera=True,
                                     use_radar=False, use_map=False,
                                     use_external=False)}, f)
    print(format_iou_table(results))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
