"""DETR decoder-layer conversion parity (Mask2Former head bricks).

Torch replica of mmcv's DetrTransformerDecoderLayer with operation_order
('cross_attn','norm','self_attn','norm','ffn','norm') and checkpoint-exact
naming (attentions.{i}.attn = torch nn.MultiheadAttention with packed
in_proj, norms.{i}, ffns.0.layers.*) — converted via the same fragment
``convert_occformer`` uses for head layers and compared numerically,
including a boolean cross-attention mask.
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
from occformer_tpu.models.mask2former_head import DetrDecoderLayer

C, H, FFC, NQ, NK = 32, 4, 64, 6, 20


class TorchDecoderLayer(tnn.Module):
    def __init__(self):
        super().__init__()
        self.attentions = tnn.ModuleList()
        for _ in range(2):
            m = tnn.Module()
            m.attn = tnn.MultiheadAttention(C, H)  # seq-first
            self.attentions.append(m)
        self.norms = tnn.ModuleList([tnn.LayerNorm(C) for _ in range(3)])
        ffn = tnn.Module()
        ffn.layers = tnn.Sequential(
            tnn.Sequential(tnn.Linear(C, FFC)), tnn.Linear(FFC, C))
        self.ffns = tnn.ModuleList([ffn])

    def forward(self, query, query_pos, key, key_pos, attn_mask):
        # mmcv BaseTransformerLayer semantics (eval: dropouts identity)
        idt = query
        y = self.attentions[0].attn(
            query + query_pos, key + key_pos, key, attn_mask=attn_mask)[0]
        query = self.norms[0](idt + y)
        idt = query
        y = self.attentions[1].attn(
            query + query_pos, query + query_pos, query)[0]
        query = self.norms[1](idt + y)
        y = self.ffns[0].layers[1](F.relu(self.ffns[0].layers[0][0](query)))
        return self.norms[2](query + y)


def test_decoder_layer_conversion_parity():
    torch.manual_seed(0)
    tm = TorchDecoderLayer().eval()
    sd = {"layer." + k: v.detach().numpy() for k, v in tm.state_dict().items()}

    tb = TreeBuilder()
    convert_mmcv_mha(tb, sd, "layer.attentions.0", "layer/cross_attn")
    convert_mmcv_mha(tb, sd, "layer.attentions.1", "layer/self_attn")
    convert_ffn(tb, sd, "layer.ffns.0", "layer/ffn")
    for i, n in enumerate(("norm1", "norm2", "norm3")):
        tb.ln(sd, f"layer.norms.{i}", f"layer/{n}")

    rng = np.random.default_rng(0)
    q = rng.standard_normal((2, NQ, C)).astype(np.float32)
    qp = rng.standard_normal((2, NQ, C)).astype(np.float32)
    k = rng.standard_normal((2, NK, C)).astype(np.float32)
    kp = rng.standard_normal((2, NK, C)).astype(np.float32)
    # bool mask [B*H, NQ, NK], True = masked; keep at least one key visible
    mask = rng.random((2 * H, NQ, NK)) < 0.4
    mask[..., 0] = False

    model = DetrDecoderLayer(embed_dims=C, num_heads=H,
                             feedforward_channels=FFC)
    mask_j = jnp.asarray(mask.reshape(2, H, NQ, NK))
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(q), jnp.asarray(qp),
                      jnp.asarray(k), jnp.asarray(kp), mask_j)
    variables, missing = match_to_tree({"params": tb.params["layer"]},
                                       {"params": init["params"]})
    assert not missing, missing

    out_j = model.apply(variables, jnp.asarray(q), jnp.asarray(qp),
                        jnp.asarray(k), jnp.asarray(kp), mask_j)
    with torch.no_grad():
        # torch MHA is seq-first: [L, B, C]
        t = lambda a: torch.from_numpy(a.transpose(1, 0, 2).copy())
        out_t = tm(t(q), t(qp), t(k), t(kp),
                   torch.from_numpy(mask)).numpy().transpose(1, 0, 2)
    np.testing.assert_allclose(np.asarray(out_j), out_t, rtol=3e-4, atol=3e-4)
