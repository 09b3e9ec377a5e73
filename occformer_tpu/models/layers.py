"""Common flax building blocks shared across the framework.

These replace the mmcv "bricks" the reference assembles from configs
(ConvModule, FFN, MultiheadAttention, build_norm_layer, ...).  All modules are
channels-last, take a ``dtype`` compute policy (params stay fp32) and use
torch-compatible initializations/eps so converted checkpoints reproduce.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

# torch nn.Conv2d default init: kaiming_uniform(a=sqrt(5)) on fan_in
def torch_conv_init(key, shape, dtype=jnp.float32):
    # flax conv kernel shape: (*window, in_features // groups, out_features)
    fan_in = math.prod(shape[:-1])
    bound = math.sqrt(6.0 / ((1 + 5) * fan_in))  # gain^2=2/(1+a^2)=1/3 -> sqrt(3*1/3/fan)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_init(key, shape, dtype=jnp.float32):
    fan_in = shape[0]
    bound = math.sqrt(6.0 / ((1 + 5) * fan_in))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


def _triple(v):
    return (v, v, v) if isinstance(v, int) else tuple(v)


class Conv(nn.Module):
    """nD conv with torch-style explicit symmetric padding (channels-last)."""

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = None
    padding: Sequence[int] = None  # per-dim symmetric pad; default k//2 "same-ish"
    dilation: Sequence[int] = None
    groups: int = 1
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = tuple(self.kernel_size)
        nd = len(k)
        s = tuple(self.strides) if self.strides else (1,) * nd
        d = tuple(self.dilation) if self.dilation else (1,) * nd
        if self.padding is None:
            p = tuple(((kk - 1) * dd) // 2 for kk, dd in zip(k, d))
        else:
            p = tuple(self.padding)
        pad = [(pp, pp) for pp in p]
        return nn.Conv(
            features=self.features,
            kernel_size=k,
            strides=s,
            padding=pad,
            kernel_dilation=d,
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=torch_conv_init,
        )(x)


class ConvTranspose(nn.Module):
    """Transposed conv matching torch ``ConvTranspose2d(k=stride, s=stride)``."""

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int]
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.ConvTranspose(
            features=self.features,
            kernel_size=tuple(self.kernel_size),
            strides=tuple(self.strides),
            padding="VALID",
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=torch_conv_init,
        )(x)


class BatchNorm(nn.Module):
    """BatchNorm with torch defaults (eps 1e-5, momentum 0.1)."""

    use_running_average: bool = True
    momentum: float = 0.9  # flax decay == 1 - torch momentum
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        ura = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        ) if use_running_average is not None else self.use_running_average
        return nn.BatchNorm(
            use_running_average=ura,
            momentum=self.momentum,
            epsilon=self.eps,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class GroupNorm(nn.Module):
    num_groups: int = 32
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(
            num_groups=self.num_groups,
            epsilon=self.eps,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class LayerNorm(nn.Module):
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, param_dtype=jnp.float32)(x)


def make_norm(norm_cfg: Optional[dict], dtype=jnp.float32) -> nn.Module:
    """``build_norm_layer`` equivalent driven by mmdet-style norm_cfg dicts."""
    if norm_cfg is None:
        return None
    t = norm_cfg["type"]
    if t in ("BN", "BN2d", "BN3d", "BN1d", "SyncBN"):
        return BatchNorm(dtype=dtype)
    if t == "GN":
        return GroupNorm(num_groups=norm_cfg.get("num_groups", 32), dtype=dtype)
    if t == "LN":
        return LayerNorm(dtype=dtype)
    raise ValueError(f"unknown norm type {t}")


class Linear(nn.Module):
    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    kernel_init: Any = None
    bias_init: Any = None

    @nn.compact
    def __call__(self, x):
        kw = {}
        if self.bias_init is not None:
            kw["bias_init"] = self.bias_init
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=self.kernel_init or torch_linear_init,
            **kw,
        )(x)


class Mlp(nn.Module):
    """fc -> act -> fc (reference ViewTransformerLSSBEVDepth.py:410-432)."""

    hidden_features: int
    out_features: int
    act: Callable = nn.relu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Linear(self.hidden_features, dtype=self.dtype, name="fc1")(x)
        x = self.act(x)
        x = Linear(self.out_features, dtype=self.dtype, name="fc2")(x)
        return x


class SELayer(nn.Module):
    """Squeeze-excite gate modulated by an external embedding.

    Reference ViewTransformerLSSBEVDepth.py:435-447: ``x * sigmoid(conv(relu(conv(se))))``.
    """

    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_se):
        g = Linear(self.channels, dtype=self.dtype, name="conv_reduce")(x_se)
        g = nn.relu(g)
        g = Linear(self.channels, dtype=self.dtype, name="conv_expand")(g)
        return x * jax.nn.sigmoid(g)[:, None, None, :]


class DropPath(nn.Module):
    """Per-sample stochastic depth (torch timm semantics)."""

    rate: float = 0.0
    deterministic: Optional[bool] = None

    @nn.compact
    def __call__(self, x, deterministic: Optional[bool] = None):
        det = nn.merge_param("deterministic", self.deterministic, deterministic)
        if det or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class BasicBlock2D(nn.Module):
    """ResNet basic block (conv3x3-BN-relu ×2 + skip); used inside DepthNet
    (reference ViewTransformerLSSBEVDepth.py:475-478 via mmdet BasicBlock)."""

    channels: int
    train: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        y = Conv(self.channels, (3, 3), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = BatchNorm(use_running_average=not self.train, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = Conv(self.channels, (3, 3), use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = BatchNorm(use_running_average=not self.train, dtype=self.dtype, name="bn2")(y)
        return nn.relu(y + identity)


class FFN(nn.Module):
    """Transformer feed-forward with optional identity add (mmcv FFN parity)."""

    embed_dims: int
    feedforward_channels: int
    act: Callable = nn.gelu
    add_identity: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, identity=None):
        y = Linear(self.feedforward_channels, dtype=self.dtype, name="fc1")(x)
        y = self.act(y)
        y = Linear(self.embed_dims, dtype=self.dtype, name="fc2")(y)
        if not self.add_identity:
            return y
        return y + (x if identity is None else identity)


class MultiheadAttention(nn.Module):
    """Batched dot-product MHA with an optional additive/bool attention mask.

    Replaces torch ``nn.MultiheadAttention`` inside the DETR decoder layers
    (config occformer_nusc_r50_256x704.py:150-158).  ``attn_mask`` True means
    *masked out* (torch convention); it is applied as a ``-inf`` bias so
    everything stays a dense batched matmul on the MXU.
    """

    embed_dims: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key, value, attn_mask=None):
        B, Q, C = query.shape
        H = self.num_heads
        hd = C // H
        q = Linear(C, dtype=self.dtype, name="q_proj")(query)
        k = Linear(C, dtype=self.dtype, name="k_proj")(key)
        v = Linear(C, dtype=self.dtype, name="v_proj")(value)
        q = q.reshape(B, Q, H, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, -1, H, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, -1, H, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(hd)
        if attn_mask is not None:
            # attn_mask: [B, H, Q, K] or [B, 1, Q, K] bool, True = ignore
            neg = jnp.asarray(jnp.finfo(jnp.float32).min, logits.dtype)
            logits = jnp.where(attn_mask, neg, logits)
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, Q, C)
        return Linear(C, dtype=self.dtype, name="out_proj")(out)
