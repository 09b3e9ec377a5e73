"""Full OccFormer .pth -> occformer_tpu variables converter.

Maps the reference plugin's released checkpoints (README.md:47-49; module
naming from projects/mmdet3d_plugin/occformer/*) onto this framework's flax
param/batch_stats trees.  Conventions handled:

  * conv/deconv/linear layout transposes (engine/checkpoint.py primitives)
  * BatchNorm running stats -> batch_stats collection
  * mmcv MultiheadAttention packed in_proj -> split q/k/v Dense
  * deformable-attention sampling offsets: the reference orders each offset
    triple (z, y, x) to suit torch grid_sample (multi_scale_deform_attn_3d.py
    :256-266); ours is (x, y, z), so triples are reversed
  * grouped DCN weight (O, I/g, K, K) -> [K*K, I/g, O]
"""
from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import numpy as np

from .checkpoint import (
    convert_bn,
    convert_gn_ln,
    convert_resnet,
    split_inproj,
    t2f_conv,
    t2f_deconv,
    t2f_linear,
)


class TreeBuilder:
    """Accumulate nested dict assignments via path strings."""

    def __init__(self):
        self.params: Dict[str, Any] = {}
        self.stats: Dict[str, Any] = {}

    def _set(self, root, path, value):
        keys = path.split("/")
        node = root
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = np.asarray(value)

    def p(self, path, value):
        self._set(self.params, path, value)

    def s(self, path, value):
        self._set(self.stats, path, value)

    def bn(self, sd, tprefix, dst):
        pr, st = convert_bn(sd, tprefix)
        self.p(dst + "/BatchNorm_0/scale", pr["scale"])
        self.p(dst + "/BatchNorm_0/bias", pr["bias"])
        self.s(dst + "/BatchNorm_0/mean", st["mean"])
        self.s(dst + "/BatchNorm_0/var", st["var"])

    def gn(self, sd, tprefix, dst):
        self.p(dst + "/GroupNorm_0/scale", sd[tprefix + ".weight"])
        self.p(dst + "/GroupNorm_0/bias", sd[tprefix + ".bias"])

    def ln(self, sd, tprefix, dst):
        self.p(dst + "/LayerNorm_0/scale", sd[tprefix + ".weight"])
        self.p(dst + "/LayerNorm_0/bias", sd[tprefix + ".bias"])

    def conv(self, sd, tprefix, dst, bias=None):
        self.p(dst + "/Conv_0/kernel", t2f_conv(sd[tprefix + ".weight"]))
        bkey = tprefix + ".bias"
        if bias is None:
            bias = bkey in sd
        if bias:
            self.p(dst + "/Conv_0/bias", sd[bkey])

    def deconv(self, sd, tprefix, dst):
        self.p(dst + "/ConvTranspose_0/kernel", t2f_deconv(sd[tprefix + ".weight"]))

    def linear(self, sd, tprefix, dst):
        self.p(dst + "/Dense_0/kernel", t2f_linear(sd[tprefix + ".weight"]))
        if tprefix + ".bias" in sd:
            self.p(dst + "/Dense_0/bias", sd[tprefix + ".bias"])


def _reverse_offset_triples(w: np.ndarray, axis: int) -> np.ndarray:
    """Reverse each (z, y, x) triple to (x, y, z) along ``axis``."""
    shape = list(w.shape)
    n = shape[axis]
    view = np.moveaxis(w, axis, 0).reshape(n // 3, 3, -1)
    view = view[:, ::-1, :]
    return np.moveaxis(view.reshape(n, -1).reshape([n] + shape[:axis] + shape[axis + 1:]), 0, axis)


def convert_deform_attn(tb: TreeBuilder, sd, tp: str, dst: str):
    # sampling_offsets: torch Linear (O=H*L*P*3, I); reverse each triple
    w = sd[tp + ".sampling_offsets.weight"]
    b = sd[tp + ".sampling_offsets.bias"]
    w = _reverse_offset_triples(w, axis=0)
    b = _reverse_offset_triples(b[:, None], axis=0)[:, 0]
    tb.p(dst + "/sampling_offsets/Dense_0/kernel", t2f_linear(w))
    tb.p(dst + "/sampling_offsets/Dense_0/bias", b)
    for name in ("attention_weights", "value_proj", "output_proj"):
        tb.linear(sd, f"{tp}.{name}", f"{dst}/{name}")


def convert_mmcv_mha(tb: TreeBuilder, sd, tp: str, dst: str):
    """mmcv MultiheadAttention wraps torch nn.MultiheadAttention at .attn."""
    proj = split_inproj(sd, tp + ".attn")
    for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
        tb.p(f"{dst}/{name}/Dense_0/kernel", proj[name]["kernel"])
        tb.p(f"{dst}/{name}/Dense_0/bias", proj[name]["bias"])


def convert_ffn(tb: TreeBuilder, sd, tp: str, dst: str):
    """mmcv FFN: layers.0.0 (fc1) and layers.1 (fc2)."""
    tb.linear(sd, tp + ".layers.0.0", dst + "/fc1")
    tb.linear(sd, tp + ".layers.1", dst + "/fc2")


def convert_aspp2d(tb: TreeBuilder, sd, tp: str, dst: str, norm: str):
    """ASPP (reference aspp.py:49-130): aspp1..4, global_avg_pool, conv1/bn1."""
    nm = tb.gn if norm == "gn" else tb.bn
    for i in range(1, 5):
        tb.conv(sd, f"{tp}.aspp{i}.atrous_conv", f"{dst}/aspp{i}_conv")
        nm(sd, f"{tp}.aspp{i}.bn", f"{dst}/aspp{i}_gn" if norm == "gn" else f"{dst}/aspp{i}_bn")
    tb.conv(sd, f"{tp}.global_avg_pool.1", f"{dst}/gap_conv")
    nm(sd, f"{tp}.global_avg_pool.2", f"{dst}/gap_gn" if norm == "gn" else f"{dst}/gap_bn")
    tb.conv(sd, f"{tp}.conv1", f"{dst}/project_conv")
    nm(sd, f"{tp}.bn1", f"{dst}/project_gn" if norm == "gn" else f"{dst}/project_bn")


def _dcn_offset_perm(K: int, groups: int, modulated: bool) -> np.ndarray:
    """Output-channel permutation mapping our conv_offset layout onto mmcv's.

    mmcv (deform_conv kernels): per deform-group the offset channels are
    interleaved (y_k, x_k) pairs per tap (channel g*2KK + 2k + {0,1}); the
    DCNv2 mask third sits after all offsets (channel 2GKK + g*KK + k).
    Ours (models/dcn.py): per group contiguous blocks [dy(KK), dx(KK), mask?].
    """
    KK = K * K
    T = 3 if modulated else 2
    perm = np.empty(groups * T * KK, np.int64)
    for g in range(groups):
        for t in range(T):
            for k in range(KK):
                ours = g * T * KK + t * KK + k
                if t < 2:
                    perm[ours] = g * 2 * KK + 2 * k + t
                else:
                    perm[ours] = 2 * groups * KK + g * KK + k
    return perm


def convert_dcn(tb: TreeBuilder, sd, tp: str, dst: str,
                modulated: bool = False, deform_groups: int = 1):
    """mmcv DCN/DCNv2 ((Modulated)DeformConv2dPack): .weight (O, I/g, K, K),
    .conv_offset with mmcv's channel ordering (see _dcn_offset_perm)."""
    w = sd[tp + ".weight"]
    O, Ig, K, _ = w.shape
    tb.p(dst + "/weight", w.transpose(2, 3, 1, 0).reshape(K * K, Ig, O))
    if tp + ".bias" in sd:
        tb.p(dst + "/bias", sd[tp + ".bias"])
    perm = _dcn_offset_perm(K, deform_groups, modulated)
    ow = sd[tp + ".conv_offset.weight"][perm]
    tb.p(dst + "/conv_offset/Conv_0/kernel", t2f_conv(ow))
    if tp + ".conv_offset.bias" in sd:
        tb.p(dst + "/conv_offset/Conv_0/bias", sd[tp + ".conv_offset.bias"][perm])


def convert_depthnet(tb: TreeBuilder, sd, tp: str, dst: str):
    """DepthNet (ViewTransformerLSSBEVDepth.py:450-504)."""
    tb.conv(sd, tp + ".reduce_conv.0", dst + "/reduce_conv")
    tb.bn(sd, tp + ".reduce_conv.1", dst + "/reduce_bn")
    tb.conv(sd, tp + ".context_conv", dst + "/context_conv")
    tb.bn(sd, tp + ".bn", dst + "/bn_cam")
    def lin1x1(t, d):
        # torch 1x1 Conv2d (O, I, 1, 1) -> our Dense (I, O)
        tb.p(d + "/Dense_0/kernel", t2f_linear(sd[t + ".weight"][:, :, 0, 0]))
        if t + ".bias" in sd:
            tb.p(d + "/Dense_0/bias", sd[t + ".bias"])

    for branch in ("depth", "context"):
        tb.linear(sd, f"{tp}.{branch}_mlp.fc1", f"{dst}/{branch}_mlp/fc1")
        tb.linear(sd, f"{tp}.{branch}_mlp.fc2", f"{dst}/{branch}_mlp/fc2")
        lin1x1(f"{tp}.{branch}_se.conv_reduce", f"{dst}/{branch}_se/conv_reduce")
        lin1x1(f"{tp}.{branch}_se.conv_expand", f"{dst}/{branch}_se/conv_expand")
    # depth_conv: 0-2 BasicBlocks, 3 ASPP, 4 DCN, 5 1x1
    for i in range(3):
        bp = f"{tp}.depth_conv.{i}"
        tb.conv(sd, bp + ".conv1", f"{dst}/depth_block{i}/conv1")
        tb.bn(sd, bp + ".norm1" if bp + ".norm1.weight" in sd else bp + ".bn1",
              f"{dst}/depth_block{i}/bn1")
        tb.conv(sd, bp + ".conv2", f"{dst}/depth_block{i}/conv2")
        tb.bn(sd, bp + ".norm2" if bp + ".norm2.weight" in sd else bp + ".bn2",
              f"{dst}/depth_block{i}/bn2")
    convert_aspp2d(tb, sd, tp + ".depth_conv.3", dst + "/aspp", norm="bn")
    if tp + ".depth_conv.4.weight" in sd:
        convert_dcn(tb, sd, tp + ".depth_conv.4", dst + "/dcn")
        tb.conv(sd, tp + ".depth_conv.5", dst + "/depth_pred")
    else:
        tb.conv(sd, tp + ".depth_conv.4", dst + "/depth_pred")


def convert_efficientnet(tb: TreeBuilder, sd, tp: str, dst: str):
    """CustomEfficientNet (efficientnet.py:275-533; mmcv ConvModule naming).

    Torch layout: ``layers.0`` stem ConvModule, ``layers.{L}.{B}`` blocks
    (InvertedResidual: expand_conv?/depthwise_conv/se/linear_conv;
    EdgeResidual: conv1/conv2), optional trailing ConvModule (final 1x1).
    Raw ``nn.Conv``s on our side live directly under their module name (no
    Conv_0 wrapper); SE convs carry biases.
    """

    def conv(t, d):
        tb.p(d + "/kernel", t2f_conv(sd[t + ".weight"]))
        if t + ".bias" in sd:
            tb.p(d + "/bias", sd[t + ".bias"])

    pre = tp + "." if tp else ""
    conv(f"{pre}layers.0.conv", f"{dst}/stem_conv")
    tb.bn(sd, f"{pre}layers.0.bn", f"{dst}/stem_bn")

    L = 1
    while True:
        base = f"{pre}layers.{L}"
        if f"{base}.conv.weight" in sd:  # trailing final 1x1 ConvModule
            conv(f"{base}.conv", f"{dst}/final_conv")
            tb.bn(sd, f"{base}.bn", f"{dst}/final_bn")
            break
        if f"{base}.0.depthwise_conv.conv.weight" not in sd and \
                f"{base}.0.conv1.conv.weight" not in sd:
            break
        B = 0
        while True:
            bb = f"{base}.{B}"
            dd = f"{dst}/layer{L}_block{B}"
            if f"{bb}.depthwise_conv.conv.weight" in sd:  # InvertedResidual
                if f"{bb}.expand_conv.conv.weight" in sd:
                    conv(f"{bb}.expand_conv.conv", f"{dd}/expand_conv")
                    tb.bn(sd, f"{bb}.expand_conv.bn", f"{dd}/expand_bn")
                conv(f"{bb}.depthwise_conv.conv", f"{dd}/dw_conv")
                tb.bn(sd, f"{bb}.depthwise_conv.bn", f"{dd}/dw_bn")
                if f"{bb}.se.conv1.conv.weight" in sd:
                    conv(f"{bb}.se.conv1.conv", f"{dd}/se/reduce")
                    conv(f"{bb}.se.conv2.conv", f"{dd}/se/expand")
                conv(f"{bb}.linear_conv.conv", f"{dd}/project_conv")
                tb.bn(sd, f"{bb}.linear_conv.bn", f"{dd}/project_bn")
            elif f"{bb}.conv1.conv.weight" in sd:  # EdgeResidual
                conv(f"{bb}.conv1.conv", f"{dd}/expand_conv")
                tb.bn(sd, f"{bb}.conv1.bn", f"{dd}/expand_bn")
                if f"{bb}.se.conv1.conv.weight" in sd:
                    conv(f"{bb}.se.conv1.conv", f"{dd}/se/reduce")
                    conv(f"{bb}.se.conv2.conv", f"{dd}/se/expand")
                conv(f"{bb}.conv2.conv", f"{dd}/project_conv")
                tb.bn(sd, f"{bb}.conv2.bn", f"{dd}/project_bn")
            else:
                break
            B += 1
        L += 1


def convert_swin_block(tb: TreeBuilder, sd, tp: str, dst: str):
    tb.ln(sd, tp + ".norm1", dst + "/norm1")
    tb.p(dst + "/attn/w_msa/relative_position_bias_table",
         sd[tp + ".attn.w_msa.relative_position_bias_table"])
    tb.linear(sd, tp + ".attn.w_msa.qkv", dst + "/attn/w_msa/qkv")
    tb.linear(sd, tp + ".attn.w_msa.proj", dst + "/attn/w_msa/proj")
    tb.ln(sd, tp + ".norm2", dst + "/norm2")
    convert_ffn(tb, sd, tp + ".ffn", dst + "/ffn")


def convert_dualpath_block(tb: TreeBuilder, sd, tp: str, dst: str):
    tb.conv(sd, tp + ".input_conv.0", dst + "/input_conv")
    tb.gn(sd, tp + ".input_conv.1", dst + "/input_gn")
    convert_swin_block(tb, sd, tp + ".bev_encoder", dst + "/bev_encoder")
    # BottleNeckASPP (aspp.py:132-171)
    tb.conv(sd, tp + ".aspp.input_conv.0", dst + "/aspp/input_conv")
    tb.gn(sd, tp + ".aspp.input_conv.1", dst + "/aspp/input_gn")
    convert_aspp2d(tb, sd, tp + ".aspp.aspp", dst + "/aspp/aspp", norm="gn")
    tb.conv(sd, tp + ".aspp.output_conv.0", dst + "/aspp/output_conv")
    tb.gn(sd, tp + ".aspp.output_conv.1", dst + "/aspp/output_gn")
    tb.conv(sd, tp + ".combine_coeff", dst + "/combine_coeff")
    if tp + ".downsample.0.weight" in sd:
        tb.conv(sd, tp + ".downsample.0", dst + "/downsample_conv")
        tb.gn(sd, tp + ".downsample.1", dst + "/downsample_gn")


def convert_occformer(sd: Dict[str, np.ndarray],
                      num_encoder_levels: int = 3) -> Dict[str, Any]:
    """Full reference checkpoint -> {'params': ..., 'batch_stats': ...}."""
    tb = TreeBuilder()

    # ---- image backbone (ResNet or EfficientNet naming) ----
    if any(k.startswith("img_backbone.layer1") for k in sd):
        rp, rs = convert_resnet(sd, "img_backbone.")
        tb.params["backbone"] = rp
        tb.stats["backbone"] = rs
    elif "img_backbone.layers.0.conv.weight" in sd:
        convert_efficientnet(tb, sd, "img_backbone", "backbone")

    # ---- SECONDFPN ----
    i = 0
    while f"img_neck.deblocks.{i}.0.weight" in sd:
        w = sd[f"img_neck.deblocks.{i}.0.weight"]
        # conv (stride<1 path) vs deconv: mmcv deconv weight is (I, O, K, K);
        # both 4D — disambiguate by module class is impossible from the dict,
        # so rely on OccFormer's configs: stride>=1 levels are deconvs except
        # fractional strides whose conv kernels equal the stride.  We detect
        # conv when in_channels (dim0) matches the known neck input.
        # For OccFormer checkpoints both cases appear; deconv has
        # shape (I, O, k, k) with I > O, fractional-stride conv has (O, I, k, k)
        # with O < I as well — fall back to trying deconv first and let shape
        # validation against the model tree settle it in `match_to_tree`.
        tb.deconv(sd, f"img_neck.deblocks.{i}.0", f"neck/deblock{i}_up")
        tb.p(f"neck/deblock{i}_conv/Conv_0/kernel", t2f_conv(w))
        tb.bn(sd, f"img_neck.deblocks.{i}.1", f"neck/deblock{i}_bn")
        i += 1

    # ---- view transformer ----
    convert_depthnet(tb, sd, "img_view_transformer.depth_net",
                     "view_transformer/depth_net")

    # ---- 3D encoder ----
    pat = re.compile(r"^img_bev_encoder_backbone\.layers\.(\d+)\.(\d+)\.")
    blocks = sorted({(int(m.group(1)), int(m.group(2)))
                     for k in sd if (m := pat.match(k))})
    for si, bi in blocks:
        convert_dualpath_block(
            tb, sd, f"img_bev_encoder_backbone.layers.{si}.{bi}",
            f"bev_backbone/stage{si}_block{bi}",
        )

    # ---- pixel decoder ----
    neck = "img_bev_encoder_neck"
    for i in range(num_encoder_levels):
        tb.conv(sd, f"{neck}.input_convs.{i}.conv", f"bev_neck/input_conv{i}")
        tb.gn(sd, f"{neck}.input_convs.{i}.gn", f"bev_neck/input_gn{i}")
    li = 0
    while f"{neck}.encoder.layers.{li}.attentions.0.value_proj.weight" in sd:
        base = f"{neck}.encoder.layers.{li}"
        dst = f"bev_neck/layer{li}"
        convert_deform_attn(tb, sd, base + ".attentions.0", dst + "/attn")
        convert_ffn(tb, sd, base + ".ffns.0", dst + "/ffn")
        tb.ln(sd, base + ".norms.0", dst + "/norm1")
        tb.ln(sd, base + ".norms.1", dst + "/norm2")
        li += 1
    if li > 1:
        # scan-with-stacked-params layout (pixel_decoder.scan_layers=True):
        # torch encoder.layers.{i}.* -> layers/layer/* with a stacked leading
        # axis.  Stacking the converted per-layer trees preserves element
        # provenance, so the export permutation round-trip stays bit-exact.
        neck_p = tb.params["bev_neck"]
        stacked = [neck_p.pop(f"layer{i}") for i in range(li)]
        import jax

        neck_p["layers"] = {"layer": jax.tree_util.tree_map(
            lambda *xs: np.stack(xs, axis=0), *stacked)}
    tb.p("bev_neck/level_encoding", sd[f"{neck}.level_encoding.weight"])
    i = 0
    while f"{neck}.lateral_convs.{i}.conv.weight" in sd:
        tb.conv(sd, f"{neck}.lateral_convs.{i}.conv", f"bev_neck/lateral_conv{i}")
        tb.gn(sd, f"{neck}.lateral_convs.{i}.gn", f"bev_neck/lateral_gn{i}")
        tb.conv(sd, f"{neck}.output_convs.{i}.conv", f"bev_neck/output_conv{i}")
        tb.gn(sd, f"{neck}.output_convs.{i}.gn", f"bev_neck/output_gn{i}")
        i += 1
    tb.conv(sd, f"{neck}.mask_feature", "bev_neck/mask_feature")

    # ---- Mask2Former head ----
    head = "pts_bbox_head"
    tb.p("head/query_embed", sd[f"{head}.query_embed.weight"])
    tb.p("head/query_feat", sd[f"{head}.query_feat.weight"])
    tb.p("head/level_embed", sd[f"{head}.level_embed.weight"])
    tb.linear(sd, f"{head}.cls_embed", "head/cls_embed")
    tb.linear(sd, f"{head}.mask_embed.0", "head/mask_embed_fc1")
    tb.linear(sd, f"{head}.mask_embed.2", "head/mask_embed_fc2")
    tb.linear(sd, f"{head}.mask_embed.4", "head/mask_embed_fc3")
    tb.ln(sd, f"{head}.transformer_decoder.post_norm", "head/post_norm")
    li = 0
    while f"{head}.transformer_decoder.layers.{li}.norms.0.weight" in sd:
        base = f"{head}.transformer_decoder.layers.{li}"
        dst = f"head/layer{li}"
        # operation order: cross_attn (attentions.0), self_attn (attentions.1)
        convert_mmcv_mha(tb, sd, base + ".attentions.0", dst + "/cross_attn")
        convert_mmcv_mha(tb, sd, base + ".attentions.1", dst + "/self_attn")
        convert_ffn(tb, sd, base + ".ffns.0", dst + "/ffn")
        tb.ln(sd, base + ".norms.0", dst + "/norm1")
        tb.ln(sd, base + ".norms.1", dst + "/norm2")
        tb.ln(sd, base + ".norms.2", dst + "/norm3")
        li += 1

    return {"params": tb.params, "batch_stats": tb.stats}


def match_to_tree(converted: Dict, target: Dict, path="") -> Tuple[Dict, list]:
    """Prune/select converted entries to the target tree's structure; returns
    (matched tree, list of mismatch messages).  Handles the deconv-vs-conv
    SECONDFPN ambiguity by shape."""
    import jax

    msgs = []

    def walk(conv_node, tgt_node, path):
        out = {}
        for k, tgt_v in tgt_node.items():
            if isinstance(tgt_v, dict):
                sub = conv_node.get(k, {}) if isinstance(conv_node, dict) else {}
                out[k] = walk(sub, tgt_v, path + "/" + k)
            else:
                v = conv_node.get(k) if isinstance(conv_node, dict) else None
                if v is None:
                    msgs.append(f"missing {path}/{k} (kept init)")
                    out[k] = tgt_v
                elif tuple(v.shape) != tuple(tgt_v.shape):
                    msgs.append(
                        f"shape mismatch {path}/{k}: ckpt {v.shape} vs model {tgt_v.shape}"
                    )
                    out[k] = tgt_v
                else:
                    # tgt_v may be a concrete array or a jax.ShapeDtypeStruct
                    # (key-manifest tests build the target via eval_shape)
                    out[k] = v.astype(np.dtype(tgt_v.dtype))
        return out

    return walk(converted, target, path), msgs


# ---------------------------------------------------------------------------
# Inverse direction: flax variables -> reference torch state dict.
#
# Every forward transform above is a pure element permutation (transposes,
# spatial flips, slices of packed in_proj, channel-permutation tables) — no
# arithmetic ever mixes values.  So instead of hand-writing ~400 lines of
# inverse mapping rules (and keeping two converters in sync), the export
# recovers the permutation NUMERICALLY: fill a probe state dict with unique
# global element indices, run `convert_occformer` on it, and read off where
# each torch element landed in the flax tree.  float64 probes hold exact
# integers to 2^53, far beyond any checkpoint's element count.
# ---------------------------------------------------------------------------


def _walk_leaves(conv_node, tgt_node, path, out):
    """Pair converted entries with target-tree leaves (same selection rule as
    `match_to_tree`: target names pick among converted candidates)."""
    for k, tgt_v in tgt_node.items():
        if isinstance(tgt_v, dict):
            sub = conv_node.get(k, {}) if isinstance(conv_node, dict) else {}
            _walk_leaves(sub, tgt_v, path + "/" + k, out)
        else:
            v = conv_node.get(k) if isinstance(conv_node, dict) else None
            if v is not None and tuple(v.shape) == tuple(
                    np.shape(tgt_v) if not hasattr(tgt_v, "shape") else tgt_v.shape):
                out[path + "/" + k] = v


def build_export_permutation(manifest: Dict[str, Any], variables: Dict):
    """For each flax leaf, the flat torch-buffer indices its elements came
    from.  ``manifest`` maps torch key -> shape (the released-checkpoint key
    space, see tests/fixtures/key_manifests); ``variables`` is the model tree
    (concrete arrays or ShapeDtypeStructs).  Returns
    (index_map {flax_path: int64 array}, offsets {torch_key: (start, shape)},
    total_elements)."""
    probe: Dict[str, np.ndarray] = {}
    offsets: Dict[str, Tuple[int, Tuple[int, ...]]] = {}
    total = 0
    for k, shape in manifest.items():
        shape = tuple(int(s) for s in shape)
        n = int(np.prod(shape)) if shape else 1
        probe[k] = np.arange(total, total + n, dtype=np.float64).reshape(shape)
        offsets[k] = (total, shape)
        total += n

    conv = convert_occformer(probe)
    leaves: Dict[str, np.ndarray] = {}
    _walk_leaves(conv.get("params", {}), variables.get("params", {}),
                 "params", leaves)
    _walk_leaves(conv.get("batch_stats", {}), variables.get("batch_stats", {}),
                 "batch_stats", leaves)
    index_map = {p: np.rint(v).astype(np.int64) for p, v in leaves.items()}
    return index_map, offsets, total


def export_torch_state_dict(
    variables: Dict,
    manifest: Dict[str, Any],
    grid_config: Optional[Dict] = None,
    window_size: int = 7,
) -> Dict[str, np.ndarray]:
    """flax {'params', 'batch_stats'} -> reference-format torch state dict.

    The exact inverse of :func:`convert_occformer` (round-trip bit-equality
    is tested), so TPU-trained weights can be validated or served through
    the reference torch stack.  Keys the converter never consumes are
    synthesized: ``num_batches_tracked`` zeros, Swin
    ``relative_position_index`` recomputed, and the view transformer's
    ``dx/bx/nx`` grid constants from ``grid_config`` (omitted if None).
    Raises if any other manifest element would be left unfilled."""
    index_map, offsets, total = build_export_permutation(manifest, variables)

    def tree_get(root, path):
        node = root
        for k in path.split("/"):
            node = node[k]
        return node

    flat = np.zeros((total,), np.float64)
    filled = np.zeros((total,), bool)
    for path, idx in index_map.items():
        leaf = np.asarray(tree_get(variables, path), np.float64)
        flat[idx.ravel()] = leaf.ravel()
        filled[idx.ravel()] = True

    out: Dict[str, np.ndarray] = {}
    missing = []
    for k, (start, shape) in offsets.items():
        n = int(np.prod(shape)) if shape else 1
        if filled[start:start + n].all():
            out[k] = flat[start:start + n].reshape(shape).astype(np.float32)
            continue
        # synthesizable buffers (the converter's allowlisted unconsumed keys)
        if k.endswith(".num_batches_tracked"):
            out[k] = np.zeros(shape, np.int64)
        elif k.endswith(".relative_position_index"):
            from ..models.swin import _relative_position_index

            out[k] = _relative_position_index(
                window_size, window_size).astype(np.int64)
        elif k in ("img_view_transformer.dx", "img_view_transformer.bx",
                   "img_view_transformer.nx"):
            if grid_config is None:
                continue  # torch load_state_dict(strict=False) territory
            from ..ops.geometry import gen_dx_bx

            dx, bx, nx = gen_dx_bx(grid_config["xbound"],
                                   grid_config["ybound"],
                                   grid_config["zbound"])
            out[k] = {"img_view_transformer.dx": dx,
                      "img_view_transformer.bx": bx,
                      "img_view_transformer.nx": nx.astype(np.float32)}[k]
        else:
            missing.append(k)
    if missing:
        raise ValueError(
            f"{len(missing)} manifest keys not reachable from the flax tree "
            f"(first: {missing[:10]}) — model/manifest mismatch")
    return out
