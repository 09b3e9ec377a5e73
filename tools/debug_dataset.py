#!/usr/bin/env python
"""Render/inspect pipeline outputs for one sample (reference tools/debug_dataset.py).

Prints shapes/statistics of every batch field and optionally dumps the
augmented camera images + sparse depth maps + BEV label map as PNGs.

Usage:
  python tools/debug_dataset.py <config> [--index 0] [--dump-dir viz/]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--index", type=int, default=0)
    p.add_argument("--split", default="train")
    p.add_argument("--dump-dir", default=None)
    args = p.parse_args()

    import occformer_tpu.data  # noqa: F401 (register datasets/pipelines)
    from occformer_tpu.config import load_config
    from occformer_tpu.registry import DATASETS, build_from_cfg

    cfg = load_config(args.config)
    dataset = build_from_cfg(dict(cfg["data"][args.split]), DATASETS)
    print(f"dataset: {type(dataset).__name__}, {len(dataset)} samples")
    sample = dataset[args.index]

    for k, v in sample.items():
        if isinstance(v, np.ndarray):
            stats = ""
            if np.issubdtype(v.dtype, np.floating):
                stats = f" min={v.min():.3f} max={v.max():.3f} mean={v.mean():.3f}"
            elif v.size:
                stats = f" unique={len(np.unique(v))}"
            print(f"  {k}: {v.shape} {v.dtype}{stats}")
        else:
            print(f"  {k}: {type(v).__name__} = {str(v)[:80]}")

    if args.dump_dir:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        os.makedirs(args.dump_dir, exist_ok=True)
        if "imgs" in sample:
            imgs = sample["imgs"]
            n = imgs.shape[0]
            fig, axes = plt.subplots(2, n, figsize=(4 * n, 7), squeeze=False)
            for i in range(n):
                img = imgs[i]
                img = (img - img.min()) / max(img.max() - img.min(), 1e-6)
                axes[0][i].imshow(img)
                axes[0][i].axis("off")
                if "gt_depth" in sample:
                    d = sample["gt_depth"][i]
                    axes[1][i].imshow(np.where(d > 0, d, np.nan), cmap="turbo")
                axes[1][i].axis("off")
            fig.tight_layout()
            fig.savefig(os.path.join(args.dump_dir, "cameras.png"), dpi=100)
            print("wrote", os.path.join(args.dump_dir, "cameras.png"))
        if sample.get("gt_occ") is not None:
            from tools.visualize import render

            render(np.where(sample["gt_occ"] == 255, 0, sample["gt_occ"]),
                   out_path=os.path.join(args.dump_dir, "gt_occ.png"))
            print("wrote", os.path.join(args.dump_dir, "gt_occ.png"))


if __name__ == "__main__":
    main()
