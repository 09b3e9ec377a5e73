"""SwinBlock numeric parity vs a torch oracle (standard Swin formulation).

The oracle implements W-MSA/SW-MSA exactly as the Swin paper / reference
module (window_attention.py): same rel-pos bias indexing, cyclic shift,
region masks and padding.  Weights are converted with the checkpoint
converter's primitives, so this doubles as a converter test for the
3D-encoder blocks.
"""
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F
import pytest

import jax
import jax.numpy as jnp

from occformer_tpu.engine.checkpoint import t2f_linear
from occformer_tpu.models.swin import SwinBlock, _relative_position_index


class TorchWindowAttention(nn.Module):
    def __init__(self, dim, heads, window):
        super().__init__()
        self.dim, self.heads, self.window = dim, heads, window
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)
        self.bias_table = nn.Parameter(
            torch.randn((2 * window - 1) ** 2, heads) * 0.02
        )
        idx = _relative_position_index(window, window)
        self.register_buffer("rel_idx", torch.from_numpy(np.asarray(idx)).long())

    def forward(self, x, mask=None):
        B_, N, C = x.shape
        H = self.heads
        qkv = self.qkv(x).reshape(B_, N, 3, H, C // H).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * (C // H) ** -0.5, qkv[1], qkv[2]
        attn = q @ k.transpose(-2, -1)
        bias = self.bias_table[self.rel_idx.view(-1)].view(N, N, H).permute(2, 0, 1)
        attn = attn + bias.unsqueeze(0)
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.view(B_ // nW, nW, H, N, N) + mask[None, :, None]
            attn = attn.view(B_, H, N, N)
        attn = attn.softmax(-1)
        out = (attn @ v).transpose(1, 2).reshape(B_, N, C)
        return self.proj(out)


def torch_swin_block(x, wattn, norm1, norm2, fc1, fc2, window, shift):
    """x: [B, H, W, C] -> same; pad -> (shift) -> windows -> attn -> reverse."""
    B, H, W, C = x.shape
    idt = x.reshape(B, H * W, C)
    y = norm1(idt).view(B, H, W, C)
    pad_b = (window - H % window) % window
    pad_r = (window - W % window) % window
    y = F.pad(y, (0, 0, 0, pad_r, 0, pad_b))
    Hp, Wp = H + pad_b, W + pad_r
    mask = None
    if shift:
        s = window // 2
        y = torch.roll(y, (-s, -s), dims=(1, 2))
        img = torch.zeros(1, Hp, Wp, 1)
        cnt = 0
        for hs in (slice(0, -window), slice(-window, -s), slice(-s, None)):
            for ws in (slice(0, -window), slice(-window, -s), slice(-s, None)):
                img[:, hs, ws] = cnt
                cnt += 1
        mw = img.view(1, Hp // window, window, Wp // window, window, 1)
        mw = mw.permute(0, 1, 3, 2, 4, 5).reshape(-1, window * window)
        diff = mw.unsqueeze(1) - mw.unsqueeze(2)
        mask = torch.where(diff != 0, torch.tensor(-100.0), torch.tensor(0.0))
    wins = y.view(B, Hp // window, window, Wp // window, window, C)
    wins = wins.permute(0, 1, 3, 2, 4, 5).reshape(-1, window * window, C)
    wins = wattn(wins, mask)
    y = wins.view(B, Hp // window, Wp // window, window, window, C)
    y = y.permute(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
    if shift:
        y = torch.roll(y, (window // 2, window // 2), dims=(1, 2))
    y = y[:, :H, :W, :].reshape(B, H * W, C)
    x = idt + y
    x = x + fc2(F.gelu(fc1(norm2(x))))
    return x.view(B, H, W, C)


def _convert(wattn, norm1, norm2, fc1, fc2):
    g = lambda t: t.detach().numpy()
    return {
        "norm1": {"LayerNorm_0": {"scale": g(norm1.weight), "bias": g(norm1.bias)}},
        "norm2": {"LayerNorm_0": {"scale": g(norm2.weight), "bias": g(norm2.bias)}},
        "attn": {"w_msa": {
            "relative_position_bias_table": g(wattn.bias_table),
            "qkv": {"Dense_0": {"kernel": t2f_linear(g(wattn.qkv.weight)),
                                "bias": g(wattn.qkv.bias)}},
            "proj": {"Dense_0": {"kernel": t2f_linear(g(wattn.proj.weight)),
                                 "bias": g(wattn.proj.bias)}},
        }},
        "ffn": {
            "fc1": {"Dense_0": {"kernel": t2f_linear(g(fc1.weight)), "bias": g(fc1.bias)}},
            "fc2": {"Dense_0": {"kernel": t2f_linear(g(fc2.weight)), "bias": g(fc2.bias)}},
        },
    }


def _run_case(shift, H, W, rng):
    torch.manual_seed(0)
    C, heads, window = 32, 4, 7
    wattn = TorchWindowAttention(C, heads, window).eval()
    norm1, norm2 = nn.LayerNorm(C), nn.LayerNorm(C)
    fc1, fc2 = nn.Linear(C, C), nn.Linear(C, C)
    for m in (norm1, norm2):
        nn.init.uniform_(m.weight, 0.5, 1.5)
        nn.init.uniform_(m.bias, -0.2, 0.2)

    x = rng.randn(2, H, W, C).astype(np.float32)
    with torch.no_grad():
        ref = torch_swin_block(torch.from_numpy(x), wattn, norm1, norm2,
                               fc1, fc2, window, shift).numpy()

    jm = SwinBlock(embed_dims=C, num_heads=heads, feedforward_channels=C,
                   window_size=window, shift=shift, drop_path_rate=0.0)
    params = _convert(wattn, norm1, norm2, fc1, fc2)
    out = jm.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


@pytest.mark.quick
def test_swin_block_parity_no_shift(rng):
    _run_case(False, 14, 14, rng)


def test_swin_block_parity_shift_with_padding(rng):
    # 16x18 is not a multiple of 7: exercises padding + shifted masks
    _run_case(True, 16, 18, rng)


def _pack_equivalence(shift, H, W, rng):
    """pack_windows=2 must reproduce pack_windows=1 with the same params
    (round 2 MXU tiling lever; block-diagonal -100 masking is the same
    isolation mechanism SW-MSA itself uses)."""
    C, heads, window = 32, 4, 7
    x = jnp.asarray(rng.randn(2, H, W, C).astype(np.float32))
    m1 = SwinBlock(embed_dims=C, num_heads=heads, feedforward_channels=C,
                   window_size=window, shift=shift, drop_path_rate=0.0)
    m2 = SwinBlock(embed_dims=C, num_heads=heads, feedforward_channels=C,
                   window_size=window, shift=shift, drop_path_rate=0.0,
                   pack_windows=2)
    params = m1.init(jax.random.PRNGKey(0), x)["params"]
    # identical parameter trees: packing is layout-only
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params, m2.init(jax.random.PRNGKey(0), x)["params"])
    o1 = m1.apply({"params": params}, x)
    o2 = m2.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=1e-5, atol=1e-5)


def test_pack_windows_equivalence_even_windows(rng):
    _pack_equivalence(False, 14, 14, rng)  # nW = 4: even, no window padding


def test_pack_windows_equivalence_odd_windows_shift(rng):
    # 21x21 -> 3x3 = 9 windows: odd count exercises the dummy-window pad;
    # shift exercises packed SW-MSA region masks
    _pack_equivalence(True, 21, 21, rng)


def test_pack_windows_equivalence_padded_shift(rng):
    _pack_equivalence(True, 16, 18, rng)
