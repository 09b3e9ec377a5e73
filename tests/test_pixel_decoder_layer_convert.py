"""Deformable encoder-layer conversion parity (pixel-decoder bricks).

Torch replica of the reference MultiScaleDeformableAttention3D module
(multi_scale_deform_attn_3d.py:84-286) — including its (z, y, x) offset
ordering and grid_sample core — assembled into a DetrTransformerEncoder layer
('self_attn','norm','ffn','norm') with mmcv naming, converted via the same
fragments ``convert_occformer`` uses (offset triples reversed), and compared
against our ``DeformableEncoderLayer``.
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
    convert_deform_attn,
    convert_ffn,
    match_to_tree,
)
from occformer_tpu.models.pixel_decoder import DeformableEncoderLayer

C, H, L, P, FFC = 32, 4, 2, 3, 48
SHAPES = [(4, 5, 3), (2, 3, 2)]
NQ = sum(x * y * z for x, y, z in SHAPES)


class TorchMSDeformAttn3D(tnn.Module):
    """Reference module, batch-first, eval (dropout off)."""

    def __init__(self, c=C, h=H, l=L, p=P):
        super().__init__()
        self.sampling_offsets = tnn.Linear(c, h * l * p * 3)
        self.attention_weights = tnn.Linear(c, h * l * p)
        self.value_proj = tnn.Linear(c, c)
        self.output_proj = tnn.Linear(c, c)

    def forward(self, query, reference_points, query_pos):
        # reference_points here use the REFERENCE ordering: component 0
        # samples the Z axis (multi_scale_deform_attn_3d.py:270-276)
        identity = query
        q = query + query_pos
        B, Nq, _ = q.shape
        value = self.value_proj(query).view(B, Nq, H, C // H)
        off = self.sampling_offsets(q).view(B, Nq, H, L, P, 3)
        w = self.attention_weights(q).view(B, Nq, H, L * P).softmax(-1)
        w = w.view(B, Nq, H, L, P)
        ss = torch.tensor(SHAPES)
        normalizer = torch.stack([ss[:, 2], ss[:, 1], ss[:, 0]], -1).float()
        locs = reference_points[:, :, None, :, None, :] + \
            off / normalizer[None, None, None, :, None, :]

        # core (multi_scale_deformable_attn_pytorch :17-80)
        grids = 2 * locs - 1
        start = 0
        out = torch.zeros(B, Nq, H, C // H)
        for l, (X, Y, Z) in enumerate(SHAPES):
            n = X * Y * Z
            v = value[:, start:start + n].permute(0, 2, 3, 1).reshape(
                B * H, C // H, X, Y, Z)
            g = grids[:, :, :, l].permute(0, 2, 1, 3, 4).reshape(
                B * H, Nq, P, 1, 3)
            s = F.grid_sample(v, g, mode="bilinear", padding_mode="zeros",
                              align_corners=False)[..., 0]
            s = s.reshape(B, H, C // H, Nq, P)
            out += torch.einsum("bhdqp,bhqp->bqhd", s,
                                w[:, :, :, l].permute(0, 2, 1, 3))
            start += n
        return identity + self.output_proj(out.reshape(B, Nq, C))


class TorchEncoderLayer(tnn.Module):
    def __init__(self):
        super().__init__()
        m = tnn.Module()
        m.attn = TorchMSDeformAttn3D()
        self.attentions = tnn.ModuleList([m])
        self.norms = tnn.ModuleList([tnn.LayerNorm(C) for _ in range(2)])
        ffn = tnn.Module()
        ffn.layers = tnn.Sequential(
            tnn.Sequential(tnn.Linear(C, FFC)), tnn.Linear(FFC, C))
        self.ffns = tnn.ModuleList([ffn])

    def forward(self, x, ref, pos):
        x = self.norms[0](self.attentions[0].attn(x, ref, pos))
        y = self.ffns[0].layers[1](F.relu(self.ffns[0].layers[0][0](x)))
        return self.norms[1](x + y)


def test_pixel_decoder_layer_conversion_parity():
    torch.manual_seed(0)
    tm = TorchEncoderLayer().eval()
    # nonzero radial-ish offset bias so offsets matter
    with torch.no_grad():
        tm.attentions[0].attn.sampling_offsets.bias.uniform_(-1.5, 1.5)
        tm.attentions[0].attn.sampling_offsets.weight.uniform_(-0.05, 0.05)
        tm.attentions[0].attn.attention_weights.weight.uniform_(-0.1, 0.1)
    sd = {"layer." + k: v.detach().numpy() for k, v in tm.state_dict().items()}

    tb = TreeBuilder()
    convert_deform_attn(tb, sd, "layer.attentions.0.attn", "layer/attn")
    convert_ffn(tb, sd, "layer.ffns.0", "layer/ffn")
    tb.ln(sd, "layer.norms.0", "layer/norm1")
    tb.ln(sd, "layer.norms.1", "layer/norm2")

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, NQ, C)).astype(np.float32)
    pos = rng.standard_normal((2, NQ, C)).astype(np.float32)
    # our reference points: (x, y, z) in [0, 1]
    ref_xyz = rng.random((2, NQ, L, 3)).astype(np.float32)

    model = DeformableEncoderLayer(
        embed_dims=C, num_heads=H, num_levels=L, num_points=P,
        feedforward_channels=FFC, spatial_shapes=tuple(SHAPES))
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(pos),
                      jnp.asarray(ref_xyz))
    variables, missing = match_to_tree({"params": tb.params["layer"]},
                                       {"params": init["params"]})
    assert not missing, missing
    out_j = model.apply(variables, jnp.asarray(x), jnp.asarray(pos),
                        jnp.asarray(ref_xyz))

    with torch.no_grad():
        # reference ordering: component 0 samples Z -> flip our (x,y,z)
        ref_t = torch.from_numpy(ref_xyz[..., ::-1].copy())
        out_t = tm(torch.from_numpy(x), ref_t, torch.from_numpy(pos)).numpy()
    np.testing.assert_allclose(np.asarray(out_j), out_t, rtol=4e-4, atol=4e-4)
