"""Conv+BN fusion over a flax variables tree (reference tools/misc/fuse_conv_bn.py).

On TPU the runtime motivation is weaker than on GPU — XLA already fuses the
inference-mode BN affine into the conv's epilogue — so this is primarily an
EXPORT transform: it bakes the BN statistics into the conv kernel so the
checkpoint itself is fusion-complete (for export_torch.py consumers or any
runtime without a fusing compiler), exactly as mmcv rewrites Conv2d weights
and replaces BN with Identity (fuse_conv_bn.py:10-24).

Our modules keep BN in the call graph, so instead of deleting it the
transform makes it an exact ADD:

  kernel' = kernel * s/sqrt(var+eps)      (folded per out-channel)
  BN      = {scale: 1, bias: b - mean*s/sqrt(var+eps), mean: 0, var: 1-eps}

so BN(x) becomes (x-0)/sqrt((1-eps)+eps) * 1 + bias' = x + bias' — the
numerics match the unfused model to fp32 rounding (tests/test_fuse.py).

Pairing convention (the whole codebase's naming, e.g. models/resnet.py):
a sibling module named ``X.replace('conv','bn')`` holding a ``BatchNorm_0``
normalizes the output of conv module ``X`` (conv1->bn1,
downsample_conv->downsample_bn).  Unpaired convs/BNs are left untouched and
reported.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def _is_conv_module(v) -> bool:
    return isinstance(v, dict) and "Conv_0" in v and "kernel" in v["Conv_0"]


def _fuse_one(conv_p: Dict, bn_p: Dict, bn_s: Dict, eps: float) -> None:
    k = np.asarray(conv_p["Conv_0"]["kernel"], np.float32)
    scale = np.asarray(bn_p["BatchNorm_0"]["scale"], np.float32)
    bias = np.asarray(bn_p["BatchNorm_0"]["bias"], np.float32)
    mean = np.asarray(bn_s["BatchNorm_0"]["mean"], np.float32)
    var = np.asarray(bn_s["BatchNorm_0"]["var"], np.float32)
    factor = scale / np.sqrt(var + eps)          # [C_out]
    conv_p["Conv_0"]["kernel"] = (k * factor).astype(k.dtype)  # HWIO / HWDIO
    bn_p["BatchNorm_0"]["scale"] = np.ones_like(scale)
    bn_p["BatchNorm_0"]["bias"] = (bias - mean * factor).astype(bias.dtype)
    bn_s["BatchNorm_0"]["mean"] = np.zeros_like(mean)
    bn_s["BatchNorm_0"]["var"] = np.full_like(var, 1.0 - eps)


def fuse_conv_bn(variables: Dict, eps=1e-5
                 ) -> Tuple[Dict, List[str], List[str]]:
    """Return (fused variables, fused 'path/conv<->bn' pairs, unpaired names).

    ``eps`` is the BN epsilon used to fold the statistics.  The exact-add
    identity (var set to 1-eps) only holds when it matches the MODULE's BN
    epsilon, so it may be a float (applied to every pair) or a dict mapping
    a path substring to a float (e.g. {"": 1e-5, "img_backbone": 1e-3});
    the longest matching substring wins per pair.

    ``unpaired`` lists conv modules whose expected BN sibling was missing
    (left untouched) — callers exporting fusion-complete checkpoints should
    check it is empty for their model family.

    Input trees are deep-copied; arrays are replaced with numpy (host)
    values.  Only eval-mode inference is valid afterwards — training on a
    fused tree would learn through a degenerate BN.
    """
    import copy

    import flax

    eps_map = eps if isinstance(eps, dict) else {"": float(eps)}
    assert "" in eps_map, "eps dict needs a '' default entry"

    def eps_for(path: str) -> float:
        best = ""
        for k in eps_map:
            if k and k in path and len(k) > len(best):
                best = k
        return float(eps_map[best])

    variables = copy.deepcopy(flax.core.unfreeze(variables))
    fused: List[str] = []
    unpaired: List[str] = []

    def walk(params: Dict, stats: Dict, path: str) -> None:
        for name in sorted(params):
            sub = params[name]
            if not isinstance(sub, dict):
                continue
            if _is_conv_module(sub) and "conv" in name:
                bn_name = name.replace("conv", "bn")
                bn_p = params.get(bn_name)
                bn_s = (stats or {}).get(bn_name)
                if (isinstance(bn_p, dict) and "BatchNorm_0" in bn_p
                        and isinstance(bn_s, dict)
                        and "BatchNorm_0" in bn_s):
                    _fuse_one(sub, bn_p, bn_s, eps_for(f"{path}/{name}"))
                    fused.append(f"{path}/{name}<->{bn_name}")
                else:
                    unpaired.append(f"{path}/{name}")
                continue
            walk(sub, (stats or {}).get(name), f"{path}/{name}")

    walk(variables.get("params", {}), variables.get("batch_stats", {}), "")
    return variables, fused, unpaired
