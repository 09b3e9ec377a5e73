"""Checkpointing: orbax save/load + PyTorch-checkpoint converter.

Replaces mmcv CheckpointHook / load_checkpoint (SURVEY.md §5): training state
is saved with orbax (async-capable, multi-host-safe); the converter maps the
reference's released ``.pth`` state dicts (README.md:47-49) onto this
framework's param trees by structural name translation:

  * torch Conv2d/3d (O, I, *K)            -> flax kernel (*K, I, O)
  * torch ConvTranspose2d (I, O, KH, KW)  -> flax ConvTranspose (KH, KW, I, O)
  * torch Linear (O, I)                   -> flax Dense kernel (I, O)
  * torch BatchNorm weight/bias/running_* -> scale/bias + batch_stats mean/var
  * torch MultiheadAttention in_proj_*    -> split q/k/v projections
"""
from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# orbax train-state persistence
# ---------------------------------------------------------------------------

def save_checkpoint(ckpt_dir: str, state, step: int, max_keep: int = 1):
    """Save TrainState pytree under ckpt_dir/step_{N} (mmcv CheckpointHook
    parity: interval handling is the caller's; max_keep prunes old steps)."""
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"step_{step}")
    # a kill mid-save leaves step_N.orbax-checkpoint-tmp behind; clear
    # stale tmp dirs so the re-save of the same step can't collide.  Only
    # process 0 sweeps (under multi-host every process calls save on the
    # shared dir — a peer must not rmtree an in-flight tmp), and match by
    # substring like orbax's own atomicity code (some orbax versions append
    # a timestamp after the suffix).
    import shutil

    import jax

    if jax.process_index() == 0:
        for d in os.listdir(ckpt_dir):
            if ".orbax-checkpoint-tmp" in d:
                shutil.rmtree(os.path.join(ckpt_dir, d), ignore_errors=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    # prune
    steps = sorted(
        int(d.split("_")[1]) for d in os.listdir(ckpt_dir)
        if d.startswith("step_") and d.split("_")[1].isdigit()
    )
    for s in steps[:-max_keep]:
        shutil.rmtree(os.path.join(ckpt_dir, f"step_{s}"),
                      ignore_errors=True)
    return path


def load_checkpoint(path: str, target):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target=target)


def load_checkpoint_numpy(path: str):
    """Restore a checkpoint as a host numpy tree, ignoring the device
    shardings recorded at save time — works on any topology (or none), for
    export/inspection tooling that never touches a device."""
    import jax
    import numpy as np
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    meta = ckptr.metadata(os.path.abspath(path)).item_metadata.tree
    restore_args = jax.tree.map(
        lambda m: ocp.RestoreArgs(restore_type=np.ndarray), meta,
        is_leaf=lambda x: not isinstance(x, dict))
    return ckptr.restore(os.path.abspath(path), restore_args=restore_args)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = sorted(
        int(d.split("_")[1]) for d in os.listdir(ckpt_dir)
        if d.startswith("step_") and d.split("_")[1].isdigit()
    )
    if not steps:
        return None
    return os.path.join(ckpt_dir, f"step_{steps[-1]}")


# ---------------------------------------------------------------------------
# torch -> flax conversion primitives
# ---------------------------------------------------------------------------

def t2f_conv(w: np.ndarray) -> np.ndarray:
    """torch conv (O, I, *K) -> flax (*K, I, O)."""
    nd = w.ndim
    return np.transpose(w, tuple(range(2, nd)) + (1, 0))


def t2f_deconv(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose (I, O, *K) -> flax ConvTranspose (*K, I, O).

    flax ``nn.ConvTranspose`` (lax.conv_transpose, transpose_kernel=False)
    convolves with the kernel as-is, whereas torch's ConvTranspose2d scatters
    it — equivalent only after flipping every spatial axis (verified by
    tests/test_secondfpn_convert.py numeric parity).
    """
    nd = w.ndim
    t = np.transpose(w, tuple(range(2, nd)) + (0, 1))
    return t[(slice(None, None, -1),) * (nd - 2)].copy()


def t2f_linear(w: np.ndarray) -> np.ndarray:
    """torch Linear (O, I) -> flax Dense (I, O)."""
    return w.T


def convert_bn(sd: Dict[str, np.ndarray], prefix: str) -> Tuple[Dict, Dict]:
    """torch BN subtree -> (params {scale, bias}, stats {mean, var})."""
    return (
        {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]},
        {"mean": sd[prefix + ".running_mean"], "var": sd[prefix + ".running_var"]},
    )


def convert_gn_ln(sd: Dict[str, np.ndarray], prefix: str) -> Dict:
    return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}


def split_inproj(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, Dict]:
    """torch nn.MultiheadAttention packed in_proj -> q/k/v Dense kernels."""
    w = sd[prefix + ".in_proj_weight"]
    b = sd[prefix + ".in_proj_bias"]
    d = w.shape[0] // 3
    out = {}
    for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
        out[name] = {"kernel": t2f_linear(w[i * d : (i + 1) * d]),
                     "bias": b[i * d : (i + 1) * d]}
    out["out_proj"] = {
        "kernel": t2f_linear(sd[prefix + ".out_proj.weight"]),
        "bias": sd[prefix + ".out_proj.bias"],
    }
    return out


# ---------------------------------------------------------------------------
# full-model converters (per component)
# ---------------------------------------------------------------------------

def convert_resnet(sd: Dict[str, np.ndarray], prefix: str = "") -> Tuple[Dict, Dict]:
    """torchvision/mmdet ResNet state dict -> (params, batch_stats) for
    models/resnet.py.  Handles bottleneck + basic blocks and downsample."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def bn(dst_p, dst_s, name, tname):
        p, s = convert_bn(sd, prefix + tname)
        dst_p[name] = {"BatchNorm_0": p}
        dst_s[name] = {"BatchNorm_0": s}

    params["conv1"] = {"Conv_0": {"kernel": t2f_conv(sd[prefix + "conv1.weight"])}}
    bn(params, stats, "bn1", "bn1")

    layer_re = re.compile(rf"^{re.escape(prefix)}layer(\d+)\.(\d+)\.")
    blocks = sorted({
        (int(m.group(1)), int(m.group(2)))
        for k in sd if (m := layer_re.match(k))
    })
    for li, bi in blocks:
        tpre = f"{prefix}layer{li}.{bi}."
        dst = f"layer{li}_{bi}"
        bp: Dict[str, Any] = {}
        bs: Dict[str, Any] = {}
        n_convs = 3 if tpre + "conv3.weight" in sd else 2
        for ci in range(1, n_convs + 1):
            key = tpre + f"conv{ci}.weight"
            if tpre + f"conv{ci}.conv_offset.weight" in sd:
                # DCNv2 block conv (mmdet ResNet dcn stages); channel-order
                # permutation handled by the shared DCN converter
                from .convert_weights import TreeBuilder, convert_dcn

                tb = TreeBuilder()
                convert_dcn(tb, sd, tpre + f"conv{ci}", f"conv{ci}",
                            modulated=True)
                bp[f"conv{ci}"] = tb.params[f"conv{ci}"]
            elif key in sd:  # plain conv
                bp[f"conv{ci}"] = {"Conv_0": {"kernel": t2f_conv(sd[key])}}
            p, s = convert_bn(sd, tpre + f"bn{ci}")
            bp[f"bn{ci}"] = {"BatchNorm_0": p}
            bs[f"bn{ci}"] = {"BatchNorm_0": s}
        if tpre + "downsample.0.weight" in sd:
            bp["downsample_conv"] = {
                "Conv_0": {"kernel": t2f_conv(sd[tpre + "downsample.0.weight"])}
            }
            p, s = convert_bn(sd, tpre + "downsample.1")
            bp["downsample_bn"] = {"BatchNorm_0": p}
            bs["downsample_bn"] = {"BatchNorm_0": s}
        params[dst] = bp
        stats[dst] = bs
    return params, stats


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth (handles mmcv 'state_dict' wrapper) into numpy arrays."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    return {k: v.detach().cpu().numpy() for k, v in sd.items()
            if hasattr(v, "detach")}
