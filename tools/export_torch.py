#!/usr/bin/env python
"""Export trained occformer_tpu weights back to a reference-format .pth.

The inverse of tools/convert_checkpoint.py: TPU-trained (or round-tripped)
variables become a torch state dict in the reference plugin's exact key
space, so the weights can be independently validated — or served — through
the original torch stack (engine/convert_weights.py:export_torch_state_dict;
round-trip bit-equality is tested in tests/test_export_torch.py).

Usage:
  python tools/export_torch.py <config> <ckpt_dir> <out.pth>

The released-checkpoint key manifest is picked by config basename from
tests/fixtures/key_manifests/ (override with --manifest for custom models).
"""
import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("ckpt", help="orbax checkpoint dir (convert_checkpoint.py "
                                "or train.py output)")
    p.add_argument("out", help="output .pth path")
    p.add_argument("--manifest", default=None,
                   help="key-manifest json (default: by config basename)")
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import torch

    from occformer_tpu.config import load_config
    from occformer_tpu.engine.checkpoint import load_checkpoint_numpy
    from occformer_tpu.engine.convert_weights import export_torch_state_dict

    manifest_path = args.manifest or os.path.join(
        REPO, "tests", "fixtures", "key_manifests",
        os.path.splitext(os.path.basename(args.config))[0] + ".json")
    if not os.path.exists(manifest_path):
        raise SystemExit(
            f"no key manifest at {manifest_path}; pass --manifest (see "
            "tools/gen_key_manifest.py for the released-config manifests)")
    with open(manifest_path) as f:
        manifest = json.load(f)["keys"]

    cfg = load_config(args.config)
    m = cfg["model"]

    # numpy restore (shardings ignored) yields the raw {'params',
    # 'batch_stats'} tree — the exporter only needs names/shapes/values,
    # never the live model.  train.py checkpoints wrap it in a TrainState;
    # unwrap those.
    variables = load_checkpoint_numpy(args.ckpt)
    if "opt_state" in variables or "step" in variables:
        variables = {"params": variables["params"],
                     "batch_stats": variables.get("batch_stats", {})}

    sd = export_torch_state_dict(
        variables, manifest,
        grid_config=dict(m["img_view_transformer"]["grid_config"]))
    out = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    torch.save({"state_dict": out}, args.out)
    print(f"exported {len(out)} keys to {args.out}")


if __name__ == "__main__":
    main()
