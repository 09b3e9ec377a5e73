"""Optimizer + LR schedule: AdamW with mmdet-style paramwise rules.

Reference training recipe (config occformer_nusc_r50_256x704.py:284-307 and
apis/mmdet_train.py:95): AdamW lr 1e-4, wd 0.01, betas (0.9, 0.999), eps 1e-8;
no weight decay on query/level embeddings, relative-position-bias tables and
all norm parameters; step LR x0.1 at epochs [20, 23]; global-norm grad clip.
Expressed as an optax chain with a decay mask over the param tree.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import optax

NO_DECAY_NAMES = (
    "query_embed",
    "query_feat",
    "level_embed",
    "level_encoding",
    "absolute_pos_embed",
    "relative_position_bias_table",
)


def _decay_mask(params) -> Any:
    """True where weight decay applies: 2D+ kernels not in the no-decay list."""

    def walk(tree, path):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        name = path[-1] if path else ""
        in_no_decay = any(any(nd in p for nd in NO_DECAY_NAMES) for p in path)
        is_norm_like = jnp.ndim(tree) <= 1  # scales/biases/norm params
        return (not in_no_decay) and (not is_norm_like) and name not in ("bias",)

    return walk(params, ())


def backbone_freeze_mask(params, backbone_cfg: Optional[Dict]) -> Optional[Any]:
    """mmdet freezing semantics -> bool pytree (True = frozen), or None.

    ``frozen_stages=n`` freezes the stem (conv1/bn1) and layer1..layer n
    (mmdet.models.backbones.resnet._freeze_stages, used by the R101-DCN
    config occformer_nusc_r101_896x1600.py: frozen_stages=1);
    ``norm_cfg=dict(requires_grad=False)`` freezes every BatchNorm
    scale/bias in the image backbone.  The detector's backbone params live
    under the top-level ``backbone`` key.
    """
    cfg = dict(backbone_cfg or {})
    fs = cfg.get("frozen_stages")
    frozen_stages = -1 if fs is None else int(fs)  # 0 is valid: freeze stem
    norm_frozen = (cfg.get("norm_cfg") or {}).get("requires_grad", True) is False
    if frozen_stages < 0 and not norm_frozen:
        return None

    frozen_layers = {f"layer{i}" for i in range(1, frozen_stages + 1)}

    def frozen_path(path) -> bool:
        if not path or path[0] != "backbone":
            return False
        rest = path[1:]
        if frozen_stages >= 0 and rest and rest[0] in ("conv1", "bn1"):
            return True
        if rest and rest[0].split("_")[0] in frozen_layers:
            return True
        if norm_frozen and any(p == "BatchNorm_0" for p in rest):
            return True
        return False

    def walk(tree, path):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        return frozen_path(path)

    return walk(params, ())


def step_lr_schedule(
    base_lr: float,
    steps_per_epoch: int,
    milestones_epochs: Sequence[int],
    gamma: float = 0.1,
    warmup_steps: int = 0,
    warmup_ratio: float = 1.0 / 3.0,
) -> optax.Schedule:
    """mmcv StepLrUpdater equivalent (+ optional linear warmup)."""
    boundaries = [int(m * steps_per_epoch) for m in milestones_epochs]

    def schedule(step):
        lr = base_lr
        mult = jnp.ones((), jnp.float32)
        for b in boundaries:
            mult = mult * jnp.where(step >= b, gamma, 1.0)
        lr = base_lr * mult
        if warmup_steps > 0:
            frac = jnp.clip(step / warmup_steps, 0.0, 1.0)
            warm = warmup_ratio + (1.0 - warmup_ratio) * frac
            lr = lr * jnp.where(step < warmup_steps, warm, 1.0)
        return lr

    return schedule


def build_optimizer(
    params,
    lr: Any = 1e-4,
    weight_decay: float = 0.01,
    betas=(0.9, 0.999),
    eps: float = 1e-8,
    grad_clip: Optional[float] = 5.0,
    freeze_mask: Optional[Any] = None,
) -> optax.GradientTransformation:
    """AdamW chain; ``freeze_mask`` (True = frozen) zeroes those gradients
    BEFORE clipping (so the global norm excludes them, like params that never
    had requires_grad) and masks them out of weight decay."""
    txs = []
    if freeze_mask is not None:
        txs.append(optax.masked(optax.set_to_zero(), freeze_mask))
    if grad_clip is not None:
        txs.append(optax.clip_by_global_norm(grad_clip))
    decay_mask = _decay_mask(params)
    if freeze_mask is not None:
        decay_mask = jax.tree_util.tree_map(
            lambda d, f: d and not f, decay_mask, freeze_mask)
    txs.append(
        optax.adamw(
            learning_rate=lr,
            b1=betas[0],
            b2=betas[1],
            eps=eps,
            weight_decay=weight_decay,
            mask=decay_mask,
        )
    )
    return optax.chain(*txs)
