"""Swin-style windowed attention blocks for the dual-path 3D encoder.

Reference: projects/mmdet3d_plugin/occformer/backbones/modules/window_attention.py.
TPU-first formulation: window partition is reshape/transpose (no gathers),
cyclic shift is ``jnp.roll``, the shifted-window attention mask is a numpy
constant computed at trace time (static shapes), and the attention itself is
one batched einsum over [num_windows*B, 49, C] tokens on the MXU.
"""
from __future__ import annotations

import math
from functools import lru_cache
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import DropPath, FFN, LayerNorm, Linear


@lru_cache(maxsize=None)
def _relative_position_index(wh: int, ww: int) -> np.ndarray:
    """Pairwise relative-position bias indices, Swin convention.

    Matches WindowMSA.double_step_seq + flip (window_attention.py:56-60).
    """
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # [2, N, N]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[..., 0] += wh - 1
    rel[..., 1] += ww - 1
    rel[..., 0] *= 2 * ww - 1
    return (rel[..., 0] + rel[..., 1]).astype(np.int32)  # [N, N]


@lru_cache(maxsize=None)
def _shift_attn_mask(h_pad: int, w_pad: int, window: int, shift: int) -> np.ndarray:
    """SW-MSA region mask: [num_windows, N, N] additive (0 / -100).

    Mirrors the slice bookkeeping in window_attention.py:185-207.
    """
    img = np.zeros((h_pad, w_pad), np.int32)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    img = img.reshape(h_pad // window, window, w_pad // window, window)
    img = img.transpose(0, 2, 1, 3).reshape(-1, window * window)
    diff = img[:, None, :] - img[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


@lru_cache(maxsize=None)
def _packed_attn_mask(h_pad: int, w_pad: int, window: int, shift: int,
                      pack: int) -> np.ndarray:
    """Additive mask for ``pack`` windows stacked on the token axis:
    [num_packs, pack*n, pack*n] with -100 on cross-window blocks and the
    SW-MSA region mask (if ``shift``) on the diagonal blocks."""
    n = window * window
    nW = (h_pad // window) * (w_pad // window)
    pad = (-nW) % pack
    if shift > 0:
        m = _shift_attn_mask(h_pad, w_pad, window, shift)
    else:
        m = np.zeros((nW, n, n), np.float32)
    if pad:
        m = np.concatenate([m, np.zeros((pad, n, n), np.float32)])
    nP = (nW + pad) // pack
    mr = m.reshape(nP, pack, n, n)
    big = np.full((nP, pack * n, pack * n), -100.0, np.float32)
    for i in range(pack):
        big[:, i * n : (i + 1) * n, i * n : (i + 1) * n] = mr[:, i]
    return big


def window_partition(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B*nWh*nWw, window*window, C] (reshape/transpose only)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // window, window, W // window, window, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, window * window, C)


def window_reverse(wins: jnp.ndarray, window: int, B: int, H: int, W: int) -> jnp.ndarray:
    C = wins.shape[-1]
    x = wins.reshape(B, H // window, W // window, window, window, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


class WindowMSA(nn.Module):
    """W-MSA with relative position bias (window_attention.py:14-113).

    ``pack`` > 1 runs attention on ``pack`` windows concatenated along the
    token axis (N = pack * window^2) — the caller masks cross-window pairs —
    so the [N, N] attention matmuls fill more of the MXU's 128-wide tiles
    than a lone 49-token window.  Parameters are identical for any pack.
    """

    embed_dims: int
    num_heads: int
    window_size: int
    pack: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        # x: [B_, N, C] where B_ = num_windows * B / pack, N = pack * window^2
        B_, N, C = x.shape
        H = self.num_heads
        hd = C // H
        qkv = Linear(3 * C, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B_, N, 3, H, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        q = q * (hd ** -0.5)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k)

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window_size - 1) ** 2, H),
            jnp.float32,
        )
        idx = _relative_position_index(self.window_size, self.window_size)
        n = self.window_size * self.window_size
        bias = table[idx.reshape(-1)].reshape(n, n, H).transpose(2, 0, 1)
        if self.pack > 1:  # block-diagonal tile (off-diag blocks are masked)
            bias = jnp.einsum(
                "hmn,pq->hpmqn", bias, jnp.eye(self.pack, dtype=bias.dtype)
            ).reshape(H, N, N)
        attn = attn + bias[None].astype(attn.dtype)

        if mask is not None:  # [nW, N, N] additive
            nW = mask.shape[0]
            attn = attn.reshape(B_ // nW, nW, H, N, N) + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(B_, H, N, N)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B_, N, C)
        return Linear(C, dtype=self.dtype, name="proj")(out)


class ShiftWindowMSA(nn.Module):
    """Pad -> (shift) -> window attention -> reverse (window_attention.py:116-274).

    ``pack_windows`` > 1 batches that many windows per attention row (token
    axis) with a block-diagonal mask — numerically the same attention (the
    cross blocks get the reference's -100 additive mask, identical to how
    SW-MSA isolates regions) but with [pack*49, pack*49] score matrices that
    waste fewer MXU lanes than [49, 49].  Parameter tree is unchanged.
    """

    embed_dims: int
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    pack_windows: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: [B, H, W, C]
        B, H, W, C = x.shape
        w = self.window_size
        p = self.pack_windows
        pad_b = (w - H % w) % w
        pad_r = (w - W % w) % w
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        Hp, Wp = H + pad_b, W + pad_r

        if self.shift_size > 0:
            x = jnp.roll(x, (-self.shift_size, -self.shift_size), axis=(1, 2))
        # p > 1 builds its own (shift-aware) packed mask below
        mask = (jnp.asarray(_shift_attn_mask(Hp, Wp, w, self.shift_size))
                if self.shift_size > 0 and p == 1 else None)

        wins = window_partition(x, w)
        if p > 1:
            n = w * w
            nW = (Hp // w) * (Wp // w)
            pad_w = (-nW) % p
            wins = wins.reshape(B, nW, n, C)
            if pad_w:
                wins = jnp.pad(wins, ((0, 0), (0, pad_w), (0, 0), (0, 0)))
            wins = wins.reshape(B * (nW + pad_w) // p, p * n, C)
            mask = jnp.asarray(
                _packed_attn_mask(Hp, Wp, w, self.shift_size, p))
        wins = WindowMSA(self.embed_dims, self.num_heads, w, pack=p,
                         dtype=self.dtype, name="w_msa")(wins, mask)
        if p > 1:
            wins = wins.reshape(B, -1, w * w, C)[:, : (Hp // w) * (Wp // w)]
            wins = wins.reshape(-1, w * w, C)
        x = window_reverse(wins, w, B, Hp, Wp)

        if self.shift_size > 0:
            x = jnp.roll(x, (self.shift_size, self.shift_size), axis=(1, 2))
        return x[:, :H, :W, :]


class SwinBlock(nn.Module):
    """LN -> (S)W-MSA -> +id -> LN -> FFN (window_attention.py:276-373).

    Operates on channels-last [B, H, W, C]; the dual-path block feeds it the
    BEV plane and all z-slices as one big batch.
    """

    embed_dims: int
    num_heads: int
    feedforward_channels: int
    window_size: int = 7
    shift: bool = False
    drop_path_rate: float = 0.2
    pack_windows: int = 1
    train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        shortcut = x
        y = LayerNorm(dtype=self.dtype, name="norm1")(x)
        y = ShiftWindowMSA(
            self.embed_dims, self.num_heads, self.window_size,
            shift_size=self.window_size // 2 if self.shift else 0,
            pack_windows=self.pack_windows,
            dtype=self.dtype, name="attn",
        )(y)
        y = DropPath(self.drop_path_rate, deterministic=not self.train,
                     name="drop_path1")(y)
        x = shortcut + y

        shortcut = x
        y = LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = FFN(self.embed_dims, self.feedforward_channels, add_identity=False,
                dtype=self.dtype, name="ffn")(y)
        y = DropPath(self.drop_path_rate, deterministic=not self.train,
                     name="drop_path2")(y)
        return shortcut + y
