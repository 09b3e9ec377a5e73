"""Pretrained-backbone initialization for training from scratch.

The reference's training recipes never start from random init; each released
config names an init checkpoint that mmcv loads before epoch 0:

  * nuScenes R50:   ``img_backbone.pretrained='ckpts/resnet50-0676ba61.pth'``
    (torchvision resnet50 ImageNet weights; reference
    projects/configs/occformer_nusc/occformer_nusc_r50_256x704.py:66)
  * SemanticKITTI:  ``img_backbone.init_cfg=dict(type='Pretrained',
    prefix='backbone', checkpoint='ckpts/efficientnet-b7_3rdparty_8xb32-aa_
    in1k_20220119-bf03951c.pth')`` (mmcls EfficientNet-B7 classifier; the
    ``prefix`` keeps only ``backbone.*`` keys and strips the prefix; reference
    projects/configs/occformer_kitti/occformer_kitti.py:74)
  * nuScenes R101-DCN: whole-model ``load_from='ckpts/r101_dcn_fcos3d_
    pretrain.pth'`` loaded with ``strict=False`` (FCOS3D-pretrained weights
    keyed ``img_backbone.*``/``img_neck.*``; only the ``img_backbone`` keys
    name-match OccupancyFormer — the FPN ``img_neck`` does not match
    SECONDFPN's key space, so mmcv silently skips it, and so do we; reference
    occformer_nusc_r101_896x1600.py:10, apis/mmdet_train.py:195-198)

All three paths funnel through :func:`init_from_pretrained`, called by
``tools/train.py`` right after ``model.init``.  Conversion reuses the
numerics-validated component converters (``convert_resnet``,
``convert_efficientnet``); grafting uses ``match_to_tree`` so every covered
leaf is either filled or reported — a "kept init" message on a covered
subtree is an error the key-manifest tests assert against
(tests/test_pretrained_init.py).
"""
from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Tuple

import numpy as np


def _convert_backbone(sd: Dict[str, np.ndarray], backbone_type: str,
                      prefix: str = "") -> Tuple[Dict, Dict]:
    """(params, batch_stats) for the image backbone subtree ("backbone" in
    the flax param tree).  ``sd`` keys are torch names under ``prefix``."""
    if backbone_type == "ResNet":
        from .checkpoint import convert_resnet

        return convert_resnet(sd, prefix)
    if backbone_type == "CustomEfficientNet":
        from .convert_weights import TreeBuilder, convert_efficientnet

        tb = TreeBuilder()
        # convert_efficientnet takes the torch prefix without the dot
        convert_efficientnet(tb, sd, prefix.rstrip("."), "bb")
        return tb.params.get("bb", {}), tb.stats.get("bb", {})
    raise KeyError(f"no pretrained-backbone converter for {backbone_type}")


def _graft_backbone(variables: Dict, conv_params: Dict, conv_stats: Dict
                    ) -> Tuple[Dict, List[str]]:
    """Replace variables' params/batch_stats 'backbone' subtree with the
    converted tree; returns (variables, kept-init/shape-mismatch messages)."""
    import flax

    from .convert_weights import match_to_tree

    variables = flax.core.unfreeze(variables)
    msgs: List[str] = []
    params = dict(variables["params"])
    matched, m = match_to_tree(conv_params, params["backbone"], "params/backbone")
    msgs += m
    params["backbone"] = matched
    variables["params"] = params
    stats = dict(variables.get("batch_stats") or {})
    if stats.get("backbone"):
        matched, m = match_to_tree(conv_stats, stats["backbone"],
                                   "batch_stats/backbone")
        msgs += m
        stats["backbone"] = matched
        variables["batch_stats"] = stats
    return variables, msgs


def load_backbone_pretrained(variables: Dict, backbone_cfg: Dict,
                             ckpt_path: str, prefix: Optional[str] = None,
                             state_dict: Optional[Dict] = None
                             ) -> Tuple[Dict, Dict[str, Any]]:
    """Initialize the image backbone from a standalone torch checkpoint
    (torchvision ResNet / mmcls EfficientNet classifier).

    ``prefix`` (mmcv ``init_cfg.prefix`` semantics): keep only keys under
    ``prefix + '.'`` and strip it.  Classifier-only keys (``fc.*`` /
    ``head.*``) and layers beyond the backbone's ``out_indices`` truncation
    (reference efficientnet.py:455 skips stages past max(out_indices)) are
    converted-then-pruned, exactly as mmcv ``strict=False`` ignores them.
    """
    if state_dict is None:
        from .checkpoint import load_torch_state_dict

        state_dict = load_torch_state_dict(ckpt_path)
    if prefix:
        p = prefix.rstrip(".") + "."
        state_dict = {k[len(p):]: v for k, v in state_dict.items()
                      if k.startswith(p)}
        if not state_dict:
            raise ValueError(
                f"prefix {prefix!r} matched no keys in {ckpt_path}")
    conv_p, conv_s = _convert_backbone(state_dict, backbone_cfg["type"])
    variables, msgs = _graft_backbone(variables, conv_p, conv_s)
    report = {
        "source": ckpt_path, "kind": "backbone_init",
        "backbone_type": backbone_cfg["type"], "prefix": prefix,
        "kept_init": msgs,
    }
    return variables, report


def partial_load_torch(variables: Dict, ckpt_path: str,
                       state_dict: Optional[Dict] = None
                       ) -> Tuple[Dict, Dict[str, Any]]:
    """mmcv ``load_from=<model>.pth`` with ``strict=False`` semantics for a
    torch-keyed checkpoint: load every name-matching subtree, skip the rest.

    For the FCOS3D R101-DCN pretrain file the matching subtree is
    ``img_backbone.*`` (ResNet keys); ``img_neck.*`` is an FPN whose key
    space does not exist in OccupancyFormer's SECONDFPN, so those keys are
    skipped — the same thing mmcv's strict=False load does in the reference
    run (occformer_nusc_r101_896x1600.py:10).
    """
    if state_dict is None:
        from .checkpoint import load_torch_state_dict

        state_dict = load_torch_state_dict(ckpt_path)
    top = sorted({k.split(".")[0] for k in state_dict})
    loaded, skipped = [], []
    msgs: List[str] = []
    for name in top:
        if name == "img_backbone" and any(
                k.startswith("img_backbone.layer1") for k in state_dict):
            conv_p, conv_s = _convert_backbone(
                state_dict, "ResNet", prefix="img_backbone.")
            variables, m = _graft_backbone(variables, conv_p, conv_s)
            msgs += m
            loaded.append(name)
        else:
            skipped.append(name)
    report = {
        "source": ckpt_path, "kind": "partial_load",
        "loaded_subtrees": loaded, "skipped_subtrees": skipped,
        "kept_init": msgs,
    }
    return variables, report


def init_from_pretrained(variables: Dict, model_cfg: Dict,
                         load_from: Optional[str] = None,
                         base_dir: str = "."
                         ) -> Tuple[Dict, List[Dict[str, Any]]]:
    """Apply every reference-style pretrained init that the config declares.

    Reads, in mmcv priority order:
      1. ``img_backbone.init_cfg`` (type='Pretrained', checkpoint, prefix)
      2. ``img_backbone.pretrained`` or model-level ``pretrained`` (a path)
      3. ``load_from`` when it names a raw torch ``.pth`` (partial load);
         orbax-dir load_from stays in tools/train.py.

    Missing checkpoint files produce a found=False report entry (this
    environment ships no ``.pth`` files) instead of failing — matching the
    CLI's existing load_from warning behavior.
    """
    reports: List[Dict[str, Any]] = []
    bb = dict(model_cfg.get("img_backbone") or {})
    init_cfg = dict(bb.get("init_cfg") or {})
    ckpt, prefix = None, None
    if init_cfg.get("type") == "Pretrained":
        ckpt, prefix = init_cfg.get("checkpoint"), init_cfg.get("prefix")
    elif bb.get("pretrained") or model_cfg.get("pretrained"):
        ckpt = bb.get("pretrained") or model_cfg.get("pretrained")
    if ckpt:
        path = ckpt if os.path.isabs(ckpt) else os.path.join(base_dir, ckpt)
        if os.path.exists(path):
            variables, rep = load_backbone_pretrained(
                variables, bb, path, prefix)
            reports.append(rep)
        else:
            reports.append({"source": ckpt, "kind": "backbone_init",
                            "found": False})
    if load_from and str(load_from).endswith((".pth", ".pt")):
        path = load_from if os.path.isabs(load_from) \
            else os.path.join(base_dir, load_from)
        if os.path.exists(path):
            variables, rep = partial_load_torch(variables, path)
            reports.append(rep)
        else:
            reports.append({"source": load_from, "kind": "partial_load",
                            "found": False})
    return variables, reports
