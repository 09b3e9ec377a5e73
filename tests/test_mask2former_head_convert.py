"""Full Mask2Former occupancy-head conversion parity.

Torch replica of the reference head forward (mask2former_occ.py:569-671 with
forward_head :446-492): learnable query/level embeddings, per-level tokens +
3D sine positional encodings, 4 decoder layers cycling 3 levels, preserve-
pooled (adaptive_max_pool3d) attention masks with the all-True reset, and the
einsum mask head.  Checkpoint-exact naming, converted with the same fragments
``convert_occformer`` uses; our head's stacked per-layer cls/mask outputs must
match every torch layer output.  This transitively validates the attention
masking + pooling semantics: any divergence compounds across layers.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from occformer_tpu.engine.convert_weights import (
    TreeBuilder,
    convert_ffn,
    convert_mmcv_mha,
    match_to_tree,
)
from occformer_tpu.models.mask2former_head import (
    Mask2FormerOccHead,
    mask_logits_from_embeds,
)
from tests.test_decoder_layer_convert import TorchDecoderLayer as _BaseLayer
from tests.test_pos_embed import _torch_oracle as pos_oracle

C, NQ, NH, NLAYERS, NCLS = 30, 5, 3, 4, 6
POS_FEATS = C // 3
SHAPES = [(8, 8, 4), (4, 4, 2), (2, 2, 1)]  # fine -> coarse


class TorchLayer(_BaseLayer):
    """Same bricks, sized per ctor (default C=30, FFC=2C)."""

    def __init__(self, c=C, nh=NH, ffn_ratio=2):
        tnn.Module.__init__(self)
        self.attentions = tnn.ModuleList()
        for _ in range(2):
            m = tnn.Module()
            m.attn = tnn.MultiheadAttention(c, nh)
            self.attentions.append(m)
        self.norms = tnn.ModuleList([tnn.LayerNorm(c) for _ in range(3)])
        ffn = tnn.Module()
        ffn.layers = tnn.Sequential(
            tnn.Sequential(tnn.Linear(c, ffn_ratio * c)),
            tnn.Linear(ffn_ratio * c, c))
        self.ffns = tnn.ModuleList([ffn])


class TorchHead(tnn.Module):
    def __init__(self, c=C, nq=NQ, nh=NH, nlayers=NLAYERS, ncls=NCLS,
                 ffn_ratio=2):
        super().__init__()
        self.query_embed = tnn.Embedding(nq, c)
        self.query_feat = tnn.Embedding(nq, c)
        self.level_embed = tnn.Embedding(3, c)
        self.cls_embed = tnn.Linear(c, ncls + 1)
        self.mask_embed = tnn.Sequential(
            tnn.Linear(c, c), tnn.ReLU(), tnn.Linear(c, c), tnn.ReLU(),
            tnn.Linear(c, c))
        self.transformer_decoder = tnn.Module()
        self.transformer_decoder.post_norm = tnn.LayerNorm(c)
        self.transformer_decoder.layers = tnn.ModuleList(
            [TorchLayer(c, nh, ffn_ratio) for _ in range(nlayers)])

    def forward_head(self, q, mask_feature, target_size):
        d = self.transformer_decoder.post_norm(q).transpose(0, 1)
        cls_pred = self.cls_embed(d)
        emb = self.mask_embed(d)
        mask_pred = torch.einsum("bqc,bcxyz->bqxyz", emb, mask_feature)
        attn = F.adaptive_max_pool3d(mask_pred.float(), target_size)
        attn = attn.flatten(2).detach().sigmoid() < 0.5
        attn = attn.unsqueeze(1).repeat((1, NH, 1, 1)).flatten(0, 1)
        return cls_pred, mask_pred, attn

    def forward(self, voxel_feats):
        mask_feature = voxel_feats[0]
        memories = voxel_feats[:0:-1]  # coarsest first
        B = mask_feature.shape[0]
        dec_in, dec_pos = [], []
        for i in range(3):
            m = memories[i]
            x = m.flatten(2).permute(2, 0, 1) + \
                self.level_embed.weight[i].view(1, 1, -1)
            pos = torch.from_numpy(pos_oracle(tuple(m.shape[-3:]), POS_FEATS))
            pos = pos.reshape(-1, C).unsqueeze(1).expand(-1, B, -1)
            dec_in.append(x)
            dec_pos.append(pos)
        qf = self.query_feat.weight.unsqueeze(1).repeat((1, B, 1))
        qe = self.query_embed.weight.unsqueeze(1).repeat((1, B, 1))

        cls_list, mask_list = [], []
        cls_pred, mask_pred, attn = self.forward_head(
            qf, mask_feature, memories[0].shape[-3:])
        cls_list.append(cls_pred)
        mask_list.append(mask_pred)
        for i in range(NLAYERS):
            lvl = i % 3
            attn[torch.where(attn.sum(-1) == attn.shape[-1])] = False
            qf = self.transformer_decoder.layers[i](
                qf, qe, dec_in[lvl], dec_pos[lvl], attn)
            cls_pred, mask_pred, attn = self.forward_head(
                qf, mask_feature, memories[(i + 1) % 3].shape[-3:])
            cls_list.append(cls_pred)
            mask_list.append(mask_pred)
        return cls_list, mask_list


def test_mask2former_head_conversion_parity():
    torch.manual_seed(0)
    tm = TorchHead().eval()
    sd = {"pts_bbox_head." + k: v.detach().numpy()
          for k, v in tm.state_dict().items()}

    # converter: same fragment as convert_occformer's head section
    tb = TreeBuilder()
    head = "pts_bbox_head"
    tb.p("head/query_embed", sd[f"{head}.query_embed.weight"])
    tb.p("head/query_feat", sd[f"{head}.query_feat.weight"])
    tb.p("head/level_embed", sd[f"{head}.level_embed.weight"])
    from occformer_tpu.engine.convert_weights import t2f_linear

    def lin(t, d):
        tb.p(d + "/Dense_0/kernel", t2f_linear(sd[t + ".weight"]))
        tb.p(d + "/Dense_0/bias", sd[t + ".bias"])

    lin(f"{head}.cls_embed", "head/cls_embed")
    lin(f"{head}.mask_embed.0", "head/mask_embed_fc1")
    lin(f"{head}.mask_embed.2", "head/mask_embed_fc2")
    lin(f"{head}.mask_embed.4", "head/mask_embed_fc3")
    tb.ln(sd, f"{head}.transformer_decoder.post_norm", "head/post_norm")
    for li in range(NLAYERS):
        base = f"{head}.transformer_decoder.layers.{li}"
        dst = f"head/layer{li}"
        convert_mmcv_mha(tb, sd, base + ".attentions.0", dst + "/cross_attn")
        convert_mmcv_mha(tb, sd, base + ".attentions.1", dst + "/self_attn")
        convert_ffn(tb, sd, base + ".ffns.0", dst + "/ffn")
        for i, n in enumerate(("norm1", "norm2", "norm3")):
            tb.ln(sd, f"{base}.norms.{i}", f"{dst}/{n}")

    rng = np.random.default_rng(0)
    B = 2
    feats_np = [rng.standard_normal((B, *SHAPES[0], C)).astype(np.float32)]
    for s in SHAPES:
        feats_np.append(rng.standard_normal((B, *s, C)).astype(np.float32))

    model = Mask2FormerOccHead(
        feat_channels=C, out_channels=C, num_occupancy_classes=NCLS,
        num_queries=NQ, num_heads=NH, num_decoder_layers=NLAYERS,
        feedforward_channels=2 * C, pooling_attn_mask=True)
    feats_j = [jnp.asarray(f) for f in feats_np]
    init = model.init(jax.random.PRNGKey(0), feats_j)
    variables, missing = match_to_tree({"params": tb.params["head"]},
                                       {"params": init["params"]})
    assert not missing, missing
    cls_j, emb_j, mask_feat_j = model.apply(variables, feats_j)
    masks_j = mask_logits_from_embeds(emb_j, mask_feat_j)

    with torch.no_grad():
        t = lambda a: torch.from_numpy(np.moveaxis(a, -1, 1).copy())
        cls_t, masks_t = tm([t(f) for f in feats_np])

    assert cls_j.shape[0] == len(cls_t) == NLAYERS + 1
    for li in range(NLAYERS + 1):
        np.testing.assert_allclose(
            np.asarray(cls_j[li]), cls_t[li].numpy(), rtol=1e-3, atol=1e-3,
            err_msg=f"cls layer {li}")
        np.testing.assert_allclose(
            np.asarray(masks_j[li]).transpose(0, 1, 2, 3, 4),
            masks_t[li].numpy(), rtol=1e-3, atol=1e-3,
            err_msg=f"mask layer {li}")
