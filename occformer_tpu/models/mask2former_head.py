"""Mask2Former occupancy head: 3D-query transformer decoder over voxel scales.

Reference: projects/mmdet3d_plugin/occformer/mask2former/{mask2former_occ.py,
mask2former_nusc_occ.py}.  100 learnable queries run through 9 DETR decoder
layers (masked cross-attn -> self-attn -> FFN) cycling over the 3 coarse
voxel scales; after every layer a head produces class logits and mask logits
(einsum with the mask feature), and the next layer's attention mask is the
max-pooled, thresholded mask prediction ("preserve pooling", :477-486).

TPU notes: attention masks are additive -inf biases inside one dense MHA (no
sparse attention); the all-True -> all-False reset (:636) is a vectorized
``where``; every layer's (cls, mask) is stacked on a leading axis so the
training loss vmaps over layers.
"""
from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.pooling import adaptive_max_pool3d
from ..ops.sampling import resize_trilinear
from ..registry import HEADS
from .layers import FFN, LayerNorm, Linear, MultiheadAttention
from .pos_embed import sine_positional_encoding_3d


class DetrDecoderLayer(nn.Module):
    """cross_attn -> LN -> self_attn -> LN -> FFN -> LN (config operation_order,
    occformer_nusc_r50_256x704.py:160-166)."""

    embed_dims: int
    num_heads: int
    feedforward_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, query_pos, key_tokens, key_pos, attn_mask):
        # masked cross-attention: q = query + query_pos, k = key + key_pos,
        # v = key (mmcv MultiheadAttention pos-handling)
        y = MultiheadAttention(self.embed_dims, self.num_heads, dtype=self.dtype,
                               name="cross_attn")(
            query + query_pos, key_tokens + key_pos, key_tokens,
            attn_mask=attn_mask,
        )
        query = LayerNorm(dtype=self.dtype, name="norm1")(query + y)

        y = MultiheadAttention(self.embed_dims, self.num_heads, dtype=self.dtype,
                               name="self_attn")(
            query + query_pos, query + query_pos, query, attn_mask=None,
        )
        query = LayerNorm(dtype=self.dtype, name="norm2")(query + y)

        y = FFN(self.embed_dims, self.feedforward_channels, act=nn.relu,
                add_identity=False, dtype=self.dtype, name="ffn")(query)
        return LayerNorm(dtype=self.dtype, name="norm3")(query + y)


@HEADS.register_module()
class Mask2FormerOccHead(nn.Module):
    """voxel_feats [mask_feat, fine..coarse] -> (cls [L+1,B,Q,C+1], masks [L+1,B,Q,X,Y,Z]).

    The leading output axis stacks the pre-decoder proposal head plus each of
    the ``num_decoder_layers`` layer outputs, exactly the list the reference
    returns for deep supervision (mask2former_occ.py:608-666).
    """

    feat_channels: int
    out_channels: int
    num_occupancy_classes: int = 20
    num_queries: int = 100
    num_transformer_feat_level: int = 3
    num_heads: int = 8
    num_decoder_layers: int = 9
    feedforward_channels: Optional[int] = None
    pooling_attn_mask: bool = True
    align_corners: bool = True
    pos_num_feats: Optional[int] = None
    dtype: Any = jnp.float32
    # config parity (consumed by the loss / dataset side)
    sample_weight_gamma: Any = 0.25
    point_cloud_range: Any = None
    padding_mode: str = "border"
    loss_cls: Any = None
    loss_mask: Any = None
    loss_dice: Any = None
    train_cfg: Any = None
    test_cfg: Any = None
    transformer_decoder: Any = None
    positional_encoding: Any = None

    def _cfg(self, attr, key, default):
        v = getattr(self, attr)
        if isinstance(v, dict):
            node = v
            for k in key.split("."):
                node = node.get(k, None) if isinstance(node, dict) else None
                if node is None:
                    return default
            return node
        return default

    @nn.compact
    def __call__(self, voxel_feats: Sequence[jnp.ndarray]):
        C = self.feat_channels
        nlvl = self.num_transformer_feat_level
        nheads = self._cfg("transformer_decoder", "transformerlayers.attn_cfgs.num_heads",
                           self.num_heads)
        nlayers = self._cfg("transformer_decoder", "num_layers", self.num_decoder_layers)
        ffc = self.feedforward_channels or C * 8
        ffc = self._cfg("transformer_decoder", "transformerlayers.feedforward_channels", ffc)
        pos_feats = self.pos_num_feats or C // 3

        mask_feature = voxel_feats[0]  # [B, X, Y, Z, C]
        B = mask_feature.shape[0]
        # coarsest first, as the reference's voxel_feats[:0:-1]
        memories = list(voxel_feats[:0:-1])

        level_embed = self.param("level_embed", nn.initializers.normal(1.0),
                                 (nlvl, C), jnp.float32)
        query_feat0 = self.param("query_feat", nn.initializers.normal(1.0),
                                 (self.num_queries, C), jnp.float32)
        query_embed = self.param("query_embed", nn.initializers.normal(1.0),
                                 (self.num_queries, C), jnp.float32)

        key_tokens, key_pos, lvl_shapes = [], [], []
        for i in range(nlvl):
            m = memories[i]
            X, Y, Z = m.shape[1:4]
            toks = m.reshape(B, X * Y * Z, C) + level_embed[i][None, None].astype(m.dtype)
            pos = sine_positional_encoding_3d((X, Y, Z), pos_feats)[..., :C]
            key_tokens.append(toks)
            key_pos.append(jnp.asarray(pos.reshape(1, -1, C), self.dtype))
            lvl_shapes.append((X, Y, Z))

        post_norm = LayerNorm(dtype=self.dtype, name="post_norm")
        cls_embed = Linear(self.num_occupancy_classes + 1, dtype=self.dtype,
                           name="cls_embed")

        me_fc1 = Linear(C, dtype=self.dtype, name="mask_embed_fc1")
        me_fc2 = Linear(C, dtype=self.dtype, name="mask_embed_fc2")
        me_fc3 = Linear(self.out_channels, dtype=self.dtype, name="mask_embed_fc3")

        def mask_embed(q):
            return me_fc3(nn.relu(me_fc2(nn.relu(me_fc1(q)))))

        def forward_head(q, target_size):
            d = post_norm(q)
            cls_pred = cls_embed(d)  # [B, Q, C+1]
            emb = mask_embed(d)      # [B, Q, Cout]
            # attention mask only: mask logits in the channels-last layout
            # adaptive_max_pool3d wants (no [B, Q, X, Y, Z] transposes) and
            # discarded right after thresholding — the full per-layer mask
            # volumes are never stacked (they'd be 0.5 GB x several layout
            # copies); the loss recomputes them per layer from ``emb``
            mask_for_attn = jnp.einsum(
                "bqc,bxyzc->bxyzq", emb, mask_feature
            ).astype(jnp.float32)
            if self.pooling_attn_mask:
                pooled = adaptive_max_pool3d(mask_for_attn, target_size)
            else:
                pooled = resize_trilinear(mask_for_attn, target_size,
                                          align_corners=self.align_corners)
            pooled = pooled.reshape(B, -1, self.num_queries)
            attn = jax.lax.stop_gradient(pooled.transpose(0, 2, 1))
            attn_mask = jax.nn.sigmoid(attn) < 0.5  # True = masked out
            return cls_pred, emb, attn_mask

        q = jnp.broadcast_to(query_feat0[None], (B, self.num_queries, C)).astype(self.dtype)
        qpos = jnp.broadcast_to(query_embed[None], (B, self.num_queries, C)).astype(self.dtype)

        cls_list, emb_list = [], []
        cls_pred, emb, attn_mask = forward_head(q, lvl_shapes[0])
        cls_list.append(cls_pred)
        emb_list.append(emb)

        for i in range(nlayers):
            lvl = i % nlvl
            # all-True (attend nowhere) rows reset to all-False (reference :636)
            all_true = jnp.all(attn_mask, axis=-1, keepdims=True)
            attn_mask = jnp.where(all_true, False, attn_mask)
            # remat: the 32k-key cross-attention logits are recomputed on the
            # backward pass instead of stored (no-op for inference)
            q = nn.remat(DetrDecoderLayer)(
                embed_dims=C, num_heads=nheads, feedforward_channels=ffc,
                dtype=self.dtype, name=f"layer{i}",
            )(q, qpos, key_tokens[lvl], key_pos[lvl],
              attn_mask[:, None, :, :])  # broadcast over heads
            cls_pred, emb, attn_mask = forward_head(q, lvl_shapes[(i + 1) % nlvl])
            cls_list.append(cls_pred)
            emb_list.append(emb)

        return jnp.stack(cls_list), jnp.stack(emb_list), mask_feature


def mask_logits_from_embeds(mask_embeds: jnp.ndarray,
                            mask_feature: jnp.ndarray) -> jnp.ndarray:
    """[., B, Q, Cout] x [B, X, Y, Z, Cout] -> [., B, Q, X, Y, Z] mask logits.

    The per-layer mask volumes are recomputed from the tiny query embeddings
    wherever needed (loss scan body, final-layer inference) instead of being
    stacked — recompute-over-store, the TPU trade."""
    if mask_embeds.ndim == 3:
        return jnp.einsum("bqc,bxyzc->bqxyz", mask_embeds, mask_feature)
    return jnp.einsum("lbqc,bxyzc->lbqxyz", mask_embeds, mask_feature)


@HEADS.register_module()
class Mask2FormerNuscOccHead(Mask2FormerOccHead):
    """nuScenes variant: identical decoder; the loss side swaps frequency
    sampling for LiDAR-point supervision (mask2former_nusc_occ.py:23-455)."""

    align_corners: bool = True


@HEADS.register_module()
class Mask2FormerNuscPanopticOccHead(Mask2FormerNuscOccHead):
    """Panoptic variant: the decoder is identical; the differences live in
    the GT (class*1000+instance slots, preprocess_panoptic_gt) and the
    host-side panoptic formatting (utils/panoptic.py)
    (mask2former_nusc_panoptic_occ.py:25-835)."""

    # consumed by the panoptic GT/formatting side (config parity)
    stuff_indices: Any = None
    thing_indices: Any = None


def format_results(cls_logits: jnp.ndarray, mask_logits: jnp.ndarray) -> jnp.ndarray:
    """softmax(cls)[:-1] · sigmoid(mask) -> per-class voxel scores.

    Reference mask2former_occ.py:673-678; output [B, X, Y, Z, num_classes].
    """
    cls_prob = jax.nn.softmax(cls_logits.astype(jnp.float32), axis=-1)[..., :-1]
    mask_prob = jax.nn.sigmoid(mask_logits.astype(jnp.float32))
    return jnp.einsum("bqc,bqxyz->bxyzc", cls_prob, mask_prob)
