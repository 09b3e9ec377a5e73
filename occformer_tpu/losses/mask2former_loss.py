"""Mask2Former occupancy training loss, fully static-shape.

Re-derivation of the reference's target assignment + deep-supervision losses
(mask2former/mask2former_occ.py:224-444 and mask2former_nusc_occ.py:196-455)
for XLA:

* GT is represented as one mask slot per class: ``gt_masks [B, C, X, Y, Z]``
  with a validity bit per slot — exactly ``preprocess_occupancy_gt``
  (base/mmdet_utils.py:426-473) without dynamic unique().
* Hungarian matching runs per (layer, sample) as a device-side auction solve
  over a fixed [Q, G] cost buffer (losses/matching.py) — the backend rejects
  host callbacks, and on-device matching removes per-layer host syncs.
* Multinomial-without-replacement becomes Gumbel top-k; per-iteration random
  sampling gamma (mask2former_occ.py:160-166) consumes an explicit PRNG key.
* All reductions are weighted sums over static buffers; invalid slots carry
  zero weight, reproducing the reference's dynamic filtering arithmetic.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.loss_gather import (
    gather_corner_labels,
    sample_per_slot,
    sample_volumes_packed_batched,
    sort_points_by_row,
)
from ..ops.sampling import point_sample_3d
from .matching import auction_match, mask_matching_cost
from .point_sampling import (
    gumbel_topk_sample,
    sample_with_frequencies,
    uncertainty_sample_coords,
    uncertainty_topk,
    unravel_3d,
)
from .seg_losses import dice_loss


@dataclasses.dataclass(frozen=True)
class MaskLossConfig:
    num_classes: int
    num_points: int = 12544 * 4
    oversample_ratio: float = 3.0
    importance_sample_ratio: float = 0.75
    cls_loss_weight: float = 2.0
    mask_loss_weight: float = 5.0
    dice_loss_weight: float = 5.0
    cls_cost_weight: float = 2.0
    mask_cost_weight: float = 5.0
    dice_cost_weight: float = 5.0
    dice_eps: float = 1.0
    # nusc point_sample calls leave align_corners at torch's default False
    # (mask2former_nusc_occ.py:244-250, :404-410); KITTI passes
    # self.align_corners=True (mask2former_occ.py:264, :422)
    align_corners: bool = True
    padding_mode: str = "border"
    # class_weight[num_classes + 1]; background weight last
    class_weight: Tuple[float, ...] = ()
    # per-class sampling weights (KITTI frequency sampling); None for nusc
    sample_weights: Optional[Tuple[float, ...]] = None
    sample_weight_gamma: Any = 0.25
    use_lidar_points: bool = False
    point_cloud_range: Optional[Tuple[float, ...]] = None
    # panoptic heads: GT slots are class*1000+instance ids from the batch's
    # padded ``panoptic_ids`` table (preprocess_panoptic_gt), not per-class
    # binary masks (mask2former_nusc_panoptic_occ.py:25-835)
    panoptic: bool = False
    # process GT slots in this many sequential, individually-rematerialized
    # chunks in the supervision-point sampling (numerically identical; a
    # memory lever for panoptic's 100 slots vs the semantic 17 — the
    # [G, num_points*oversample] sampling temps and the [G, X*Y*Z] pos-mask
    # scatter in backward scale with G).  1 = off.
    gt_chunks: int = 1
    # Cap the MATCHING point count separately from the supervision count
    # (None = num_points, the reference semantics: both use the same
    # num_points).  The matching half is detached — fewer points only makes
    # the [Q, G] cost estimate noisier, never biases the losses — so this is
    # a safe-mode / bisect lever for the axon backend's panoptic exec-2
    # failure (NOTES.md: the [G~100, P~50k] matching block is one of the two
    # suspects; supervision chunking via gt_chunks is the other).
    match_num_points: Optional[int] = None
    # Chunk the DIFFERENTIATED supervision readout (lidar-point branch) over
    # the point axis: the selected sup_coords are computed once, then the
    # pred sampling runs in this many sequential rematerialized slices, so
    # each backward trilinear-scatter is [G, num_points/point_chunks] — the
    # axon backend's exec-2 fault triggers only at [G~100, P>~40k]
    # differentiated samplings (NOTES.md bisect), and 50176/2 is inside the
    # measured-stable envelope.  Numerically identical to 1 = off (the
    # coords, not the math, are what is split).
    point_chunks: int = 1
    # Feature-space point readout (lidar-point heads only).  Trilinear
    # sampling is LINEAR in the voxel values and every mask volume is
    # ``mask_pred[q] = emb[q] . mask_feature``, so
    #   point_sample(emb . feature, p)  ==  emb . point_sample(feature, p)
    # exactly (real arithmetic).  With this flag the loss never materializes
    # a [Q, X, Y, Z] or [G, X, Y, Z] mask volume: points sample the single
    # [X, Y, Z, C] feature volume (backward = one [P, C]-shaped scatter with
    # the channel dim minor — MXU/lane-friendly) and the per-slot logits are
    # a [G, C] x [C, P] matmul.  This (a) removes the [G~100, P~50k]
    # per-slot backward trilinear-scatter family behind the axon panoptic
    # exec-2 fault, and (b) skips the L x [B, Q, X*Y*Z, C] einsums in the
    # loss.  Rounding differs slightly from the volume path (fp32 lerp of
    # features then fp32 contraction, vs bf16 contraction then fp32 lerp);
    # equality is exact when everything is fp32 (tests/test_losses.py).
    feature_readout: bool = False
    # Shared-candidate supervision readout (feature_readout path only).
    # The importance supervision points (75% of num_points) ARE candidate
    # points, so their differentiated pred logits equal rows of the
    # candidate logits (same coords, same interpolation) and their targets
    # can come from ONE shared [S, G] gather of the gt masks at the
    # candidate set — only the 25% random-fill points need fresh volume
    # samplings.  Numerically equivalent to the per-slot readout (same
    # sampled values; f32 contraction order may differ at ulp scale,
    # tests/test_losses.py::test_shared_candidate_readout_equivalence).
    # Round-4 perf: the per-slot readout was 0.24 s/layer fwd+bwd on chip
    # (.probe_loss_gathers.json B) vs ~free for shared-coord gathers (A/D).
    shared_candidate_readout: bool = True
    # MXU volume readout (lidar-point + feature_readout heads): sample
    # per-slot mask VOLUMES (``emb . feature`` einsum — identical math by
    # the same linearity as feature_readout, evaluated on the other side)
    # with the SORTED windowed Pallas kernel (ops/loss_gather.py).
    # Round 5 made it ALL-LAYER BATCHED (_mxu_batched_loss): round 4's
    # per-layer version lost 0.26 s/step to kernel calls acting as
    # scheduling barriers inside the remat scan (.probe_loss_full.json);
    # now every Pallas call spans the (layer x sample) axis, ~8 calls per
    # step instead of ~80, and the layer scan disappears from the loss.
    # 'auto' resolves per backend in _resolve_mxu_readout; 'interpret'
    # runs the kernels in interpreter mode (CPU equivalence tests,
    # tests/test_loss_edge_cases.py::test_mxu_readout_*).
    mxu_readout: str = "auto"
    # Route the GT corner-LABEL reads through the Pallas label kernel
    # (ops.loss_gather.gather_corner_labels).  OFF by default: the kernel
    # is a COMPILE LOTTERY on this backend — the same program measured
    # 1.599 s/step on one compile and 9.5 s/step on the next three
    # (2026-08-20 A/B; the op sits on a Mosaic scoped-vmem decision
    # boundary, see _build_label_op).  The default XLA label gather is
    # deterministic and still 4.4x faster than one-hot channel reads
    # (87 vs 384 ms, .probe_loss_xla_ops.json).
    gt_label_kernel: bool = False


def preprocess_gt(gt_occ: jnp.ndarray, num_classes: int):
    """[B, X, Y, Z] labels -> (masks [B, G, X, Y, Z] f32, labels [B, G], valid [B, G]).

    G = num_classes; slot g is the binary mask of class g; a slot is valid iff
    the class appears (mirrors preprocess_occupancy_gt keeping only labels
    < num_classes — 255/noise is excluded automatically).
    """
    B = gt_occ.shape[0]
    classes = jnp.arange(num_classes, dtype=gt_occ.dtype)
    masks = (gt_occ[:, None] == classes[None, :, None, None, None])
    valid = jnp.any(masks, axis=(2, 3, 4))
    labels = jnp.broadcast_to(classes[None].astype(jnp.int32), (B, num_classes))
    # bool storage (35 MB vs 571 MB at nusc scale); samplers gather-then-cast
    return masks, labels, valid


def preprocess_panoptic_gt(gt_occ: jnp.ndarray, panoptic_ids: jnp.ndarray,
                           num_classes: int):
    """Panoptic GT: voxel ids are class*1000+instance
    (base/mmdet_utils.py:383-424).

    Args:
      gt_occ: [B, X, Y, Z] panoptic voxel ids
      panoptic_ids: [B, S] the (host-collated, padded) unique ids per sample;
        id < 0 marks an empty slot
    Returns (masks [B, S, X, Y, Z] f32, labels [B, S], valid [B, S]).
    """
    masks = gt_occ[:, None] == panoptic_ids[:, :, None, None, None]
    labels = (panoptic_ids // 1000).astype(jnp.int32)
    valid = (panoptic_ids >= 0) & (labels < num_classes) & jnp.any(
        masks, axis=(2, 3, 4))
    return masks, jnp.clip(labels, 0), valid


def _resolve_sample_weights(rng, cfg: MaskLossConfig) -> Optional[jnp.ndarray]:
    """Per-class sampling weights with the per-iteration random gamma
    (mask2former_occ.py:160-166)."""
    if cfg.sample_weights is None:
        return None
    base = jnp.asarray(cfg.sample_weights, jnp.float32)
    if isinstance(cfg.sample_weight_gamma, (list, tuple)):
        lo, hi = cfg.sample_weight_gamma
        gamma = jax.random.uniform(rng, (), jnp.float32, lo, hi)
    else:
        gamma = jnp.float32(cfg.sample_weight_gamma)
    return base ** gamma


def _matching_points_nusc(rng, lidar_xyz, lidar_valid, cfg: MaskLossConfig):
    """match point coords in [0,1]: half randomly-chosen LiDAR points, half
    uniform (mask2former_nusc_occ.py:232-241)."""
    n_pts = cfg.match_num_points or cfg.num_points
    k1 = n_pts // 2
    perm = gumbel_topk_sample(rng, lidar_valid.astype(jnp.float32), k1)
    chosen = lidar_xyz[perm]  # [k1, 3]
    chosen_valid = lidar_valid[perm]
    r1, r2 = jax.random.split(jax.random.fold_in(rng, 1))
    rand1 = jax.random.uniform(r1, (k1, 3), jnp.float32)
    pts = jnp.where(chosen_valid[:, None], chosen, rand1)
    rand2 = jax.random.uniform(r2, (n_pts - k1, 3), jnp.float32)
    return jnp.concatenate([pts, rand2], axis=0)


def _match_single_sample(
    rng,
    cls_score: jnp.ndarray,    # [Q, C+1]
    mask_pred: jnp.ndarray,    # [Q, X, Y, Z]
    gt_masks: jnp.ndarray,     # [G, X, Y, Z]
    gt_labels: jnp.ndarray,    # [G]
    gt_valid: jnp.ndarray,     # [G]
    lidar_xyz: Optional[jnp.ndarray],
    lidar_valid: Optional[jnp.ndarray],
    sample_weights: Optional[jnp.ndarray],
    cfg: MaskLossConfig,
    mask_embed: Optional[jnp.ndarray] = None,  # [Q, C] (feature_readout)
    feature: Optional[jnp.ndarray] = None,     # [X, Y, Z, C] (feature_readout)
) -> jnp.ndarray:
    """Matching only (reference _get_target_single assignment half): sampled
    matching points -> cost matrix -> device auction.  Runs entirely outside
    the differentiated program (the reference detaches the cost too)."""
    G = gt_masks.shape[0]
    r_match, _ = jax.random.split(rng)

    if cfg.use_lidar_points:
        pts = _matching_points_nusc(r_match, lidar_xyz, lidar_valid, cfg)
        if cfg.feature_readout:
            # emb . point_sample(feature) == point_sample(emb . feature):
            # one [P, C] gather + a [Q, C] x [C, P] matmul instead of a
            # [Q, X, Y, Z] volume materialization + per-query sampling
            feat_pts = point_sample_3d(
                feature[None], pts[None], align_corners=cfg.align_corners,
                padding_mode=cfg.padding_mode,
            )[0]  # [P, C]
            mask_pts_pred = jnp.einsum(
                "qc,pc->qp", mask_embed.astype(jnp.float32),
                feat_pts.astype(jnp.float32))
        else:
            mask_pts_pred = point_sample_3d(
                mask_pred.transpose(1, 2, 3, 0)[None], pts[None],
                align_corners=cfg.align_corners, padding_mode=cfg.padding_mode,
            )[0].T  # [Q, P]
        gt_pts = point_sample_3d(
            gt_masks.transpose(1, 2, 3, 0)[None], pts[None],
            align_corners=cfg.align_corners, padding_mode=cfg.padding_mode,
        )[0].T  # [G, P] soft
    else:
        idx, coords = sample_with_frequencies(
            r_match, gt_masks, gt_labels, gt_valid, sample_weights,
            cfg.match_num_points or cfg.num_points,
        )
        mask_pts_pred = point_sample_3d(
            mask_pred.transpose(1, 2, 3, 0)[None], coords[None],
            align_corners=cfg.align_corners,
        )[0].T
        gt_pts = jnp.take(gt_masks.reshape(G, -1), idx, axis=1).astype(jnp.float32)

    cost = mask_matching_cost(
        cls_score, mask_pts_pred, gt_labels, gt_pts, gt_valid,
        cls_weight=cfg.cls_cost_weight, mask_weight=cfg.mask_cost_weight,
        dice_weight=cfg.dice_cost_weight, dice_eps=cfg.dice_eps,
    )
    # device-side auction assignment: the TPU backend here rejects host
    # callbacks, and an on-device solve also avoids a per-layer host sync
    return auction_match(cost, gt_valid)  # [G], -1 for invalid


def _resolve_mxu_readout(cfg: MaskLossConfig) -> str:
    """'auto' -> 'on' on TPU (round 5: the all-layer BATCHED readout beats
    the XLA feature path 2.34 vs 3.61 s/step on the flagship — round 4's
    per-layer version lost to scan composition and shipped off), 'off'
    elsewhere (CPU tests opt in with 'interpret').

    Panoptic measured 2026-08-20 on-chip: batched-mxu 4.21 s/step (4
    stable steps) vs feature path 13.71 s/step (and one transient worker
    crash) — the round-2 instability concern INVERTED under the round-5
    batched structure, so panoptic rides 'on' under auto too.  (Panoptic
    GT reads keep the one-hot path: its slot ids exceed the label-gather
    gate.)"""
    if cfg.mxu_readout == "auto":
        import jax

        return "on" if jax.default_backend() == "tpu" else "off"
    assert cfg.mxu_readout in ("on", "off", "interpret"), cfg.mxu_readout
    return cfg.mxu_readout


def _corner_weights(pts01, spatial, align_corners: bool, padding_mode: str):
    """[..., S, 3] points in [0, 1] -> [..., S, 8] trilinear corner weights
    in ``gather_corner_labels``'s corner order ((dx, dy) lex x (z0, z1)).

    With these, a per-slot one-hot GT mask read is
    ``sum_k w_k * (corner_label_k == slot_id)`` — exact (trilerp is linear
    in the one-hot volume), with 8 label gathers per point instead of
    8 x G channel-value gathers and no [Xg, Yg, Zg, G] f32 volume
    (143 MB at the nuScenes GT grid).  border = coordinate clip (torch
    parity); zeros masks out-of-range corners.
    """
    Xg, Yg, Zg = spatial
    f32 = jnp.float32

    def unnorm(v, n):
        v = v.astype(f32)
        return v * (n - 1) if align_corners else v * n - 0.5

    cx = unnorm(pts01[..., 0], Xg)
    cy = unnorm(pts01[..., 1], Yg)
    cz = unnorm(pts01[..., 2], Zg)
    if padding_mode == "border":
        cx = jnp.clip(cx, 0.0, Xg - 1)
        cy = jnp.clip(cy, 0.0, Yg - 1)
        cz = jnp.clip(cz, 0.0, Zg - 1)
    else:
        assert padding_mode == "zeros", padding_mode
    x0, y0, z0 = jnp.floor(cx), jnp.floor(cy), jnp.floor(cz)
    wx, wy, wz = cx - x0, cy - y0, cz - z0
    ws = []
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                fx, fy, fz = x0 + dx, y0 + dy, z0 + dz
                ok = ((fx >= 0) & (fx <= Xg - 1) & (fy >= 0)
                      & (fy <= Yg - 1) & (fz >= 0) & (fz <= Zg - 1))
                ws.append(((wx if dx else 1 - wx) * (wy if dy else 1 - wy)
                           * (wz if dz else 1 - wz)) * ok.astype(f32))
    return jnp.stack(ws, axis=-1)


def _sample_id_masks(id_grid, slot_ids, pts01, align_corners: bool,
                     padding_mode: str):
    """XLA reference path for the label-gather GT read (see
    _corner_weights); the batched loss uses the MXU kernel variant
    (ops.loss_gather.gather_corner_labels) instead."""
    Xg, Yg, Zg = id_grid.shape
    f32 = jnp.float32
    w8 = _corner_weights(pts01, (Xg, Yg, Zg), align_corners, padding_mode)

    def unnorm(v, n):
        v = v.astype(f32)
        return v * (n - 1) if align_corners else v * n - 0.5

    cx = unnorm(pts01[..., 0], Xg)
    cy = unnorm(pts01[..., 1], Yg)
    cz = unnorm(pts01[..., 2], Zg)
    if padding_mode == "border":
        cx = jnp.clip(cx, 0.0, Xg - 1)
        cy = jnp.clip(cy, 0.0, Yg - 1)
        cz = jnp.clip(cz, 0.0, Zg - 1)
    x0, y0, z0 = jnp.floor(cx), jnp.floor(cy), jnp.floor(cz)
    flat = id_grid.reshape(-1)
    acc = jnp.zeros(pts01.shape[:-1] + (slot_ids.shape[0],), f32)
    ids = slot_ids.reshape((1,) * (pts01.ndim - 1) + (-1,))
    j = 0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                xi = jnp.clip(x0 + dx, 0, Xg - 1).astype(jnp.int32)
                yi = jnp.clip(y0 + dy, 0, Yg - 1).astype(jnp.int32)
                zi = jnp.clip(z0 + dz, 0, Zg - 1).astype(jnp.int32)
                lab = flat[(xi * Yg + yi) * Zg + zi]
                acc = acc + w8[..., j, None] * (lab[..., None] == ids)
                j += 1
    return acc


def _mxu_batched_loss(rng, cls_preds, mask_embeds, mask_feature, gt_masks,
                      gt_labels, gt_valid, lidar_xyz, lidar_valid,
                      cfg: MaskLossConfig, interpret: bool,
                      gt_id_grid=None, gt_slot_ids=None):
    """ALL-LAYER batched MXU loss (round 5, VERDICT r4 #3).

    Round 4 built the sorted windowed volume readout but shipped it OFF:
    composed inside the per-layer remat scan, its ~8 kernel calls per layer
    each acted as a scheduling barrier and lost 0.26 s/step despite 2.6 ms
    isolated kernels (.probe_loss_full.json).  The fix is structural: hoist
    every Pallas call OUT of the layer loop and batch it over the
    (layer x sample) axis as the kernel grid — the whole deep-supervision
    readout becomes ~4 differentiated + ~4 detached kernel invocations per
    STEP (vs ~80), and the per-layer bookkeeping that remains is pure XLA.

    Same math as the per-layer path it replaces (the linearity identity
    point_sample(emb . feature, p) == emb . point_sample(feature, p),
    evaluated volume-side with f32 HIGHEST einsums + the 6-pass f32 kernel),
    and the SAME per-(layer, sample) PRNG derivation as the scan path, so
    it is numerically equivalent to the XLA feature readout
    (tests/test_loss_edge_cases.py::test_mxu_readout_equivalent*).

    GT reads stay on the XLA gather path: shared-coordinate multi-channel
    gathers measured ~free there (.probe_loss_gathers.json D), while the
    kernel at the FINER gt grid (256x256x32, XY=65536) pays f32 6-pass
    window matmuls + tail escapes (.probe_gtgrid.json).

    Memory (ADVICE r4 #2): per-slot volumes are built in G-chunks sized by
    the packed sampler's backward-footprint cap, so panoptic G~100 never
    materializes the full [L, B, G, X*Y*Z] f32 stack at once.
    """
    L, B, Q = cls_preds.shape[:3]
    G = gt_masks.shape[1]
    X, Y, Z, _ = mask_feature.shape[1:]
    spatial = (X, Y, Z)
    NB = L * B
    f32 = jnp.float32
    layer_keys = jax.random.split(rng, L)
    # [L, B, key]: exactly the scan path's keys = split(layer_keys[l], B)
    keys_lb = jax.vmap(lambda k: jax.random.split(k, B))(layer_keys)

    # ---- phase A: matching (fully detached, like the reference assigner) --
    emb_d = jax.lax.stop_gradient(mask_embeds)
    feat_d = jax.lax.stop_gradient(mask_feature)
    cls_d = jax.lax.stop_gradient(cls_preds)

    def draw_match(k, lx, lv):
        r_match, _ = jax.random.split(k)
        return _matching_points_nusc(r_match, lx, lv, cfg)

    pts = jax.vmap(lambda ks: jax.vmap(draw_match)(
        ks, lidar_xyz, lidar_valid))(keys_lb)         # [L, B, Pm, 3]
    pts_s = sort_points_by_row(pts, spatial)
    Pm = pts_s.shape[2]
    pts_f = pts_s.reshape(NB, Pm, 3)
    # match volumes in the FEATURE dtype: bf16 on-chip (the cost tolerates
    # bf16 — reference computes it under fp16 AMP), f32 when the model is
    # f32 so the kernel path's assignments match the XLA path's exactly
    # (tests/test_train_step.py::test_train_step_production_kernels_interpret);
    # chunk queries by the packed sampler's cap so the [L, B, q, X*Y*Z]
    # stack never fully materializes
    mdt = feat_d.dtype
    qcap = max(1, (80 << 20) // (X * Y * Z * (mdt.itemsize + 8)))
    preds = []
    for q0 in range(0, Q, qcap):
        q_vol = jnp.einsum(
            "lbqc,bxyzc->lbqxyz",
            emb_d[:, :, q0:q0 + qcap].astype(mdt), feat_d.astype(mdt))
        preds.append(sample_volumes_packed_batched(
            q_vol.reshape(NB, -1, X, Y, Z), pts_f, cfg.align_corners,
            cfg.padding_mode, interpret=interpret))   # [NB, Pm, q]
    mask_pts_pred = jnp.concatenate(preds, axis=-1).astype(f32)
    mask_pts_pred = jnp.transpose(mask_pts_pred, (0, 2, 1)).reshape(
        L, B, Q, Pm)

    # GT reads: 8-corner LABEL gather when the slot-id structure is known
    # (semantic heads): corner labels ride the windowed MXU kernel
    # (ops.loss_gather.gather_corner_labels — the XLA label gather still
    # measured 87 ms at flagship, .probe_loss_xla_ops.json), weights +
    # per-slot compares are vectorized XLA.  One-hot volume path otherwise.
    use_ids = gt_id_grid is not None
    if use_ids:
        Xg, Yg, Zg = gt_id_grid.shape[1:]
        id_slab = gt_id_grid.reshape(B, Xg * Yg, Zg).astype(f32)
        ids_f = gt_slot_ids.astype(f32)                # [B, G]

        def labels_to_masks(points, lab8):
            """points [..., S, 3], lab8 [..., S, 8], ids broadcastable
            [..., G] -> [..., S, G] soft masks."""
            w8 = _corner_weights(points, (Xg, Yg, Zg), cfg.align_corners,
                                 cfg.padding_mode)
            acc = 0.0
            for j in range(8):
                acc = acc + w8[..., j, None] * (
                    lab8[..., j, None] == ids_f[None, :, None, :])
            return acc

    def read_gt_shared(points_lb):
        """[L, B, S, 3] shared points -> [L, B, G, S] soft GT masks."""
        if use_ids and cfg.gt_label_kernel:
            S_ = points_lb.shape[2]
            slab_rep = jnp.broadcast_to(
                id_slab[None], (L,) + id_slab.shape).reshape(
                L * B, Xg * Yg, Zg)
            lab8 = gather_corner_labels(
                slab_rep, (Xg, Yg, Zg), points_lb.reshape(L * B, S_, 3),
                cfg.align_corners, interpret=interpret)
            o = labels_to_masks(points_lb, lab8.reshape(L, B, S_, 8))
        elif use_ids:
            o = jax.vmap(lambda ps: jax.vmap(
                lambda p, ig, si: _sample_id_masks(
                    ig, si, p, cfg.align_corners, cfg.padding_mode)
            )(ps, gt_id_grid, gt_slot_ids))(points_lb)
        else:
            gt_ch = jnp.moveaxis(gt_masks.astype(f32), 1, -1)
            o = jax.vmap(lambda ps: jax.vmap(
                lambda p, g: point_sample_3d(
                    g[None], p[None], align_corners=cfg.align_corners,
                    padding_mode=cfg.padding_mode)[0])(ps, gt_ch))(points_lb)
        return jnp.transpose(o, (0, 1, 3, 2))          # [L, B, G, S]

    gt_pts = read_gt_shared(pts_s)                     # [L, B, G, Pm]

    def match_lb(cs, mp, gp, gl, gv):
        cost = mask_matching_cost(
            cs, mp, gl, gp, gv,
            cls_weight=cfg.cls_cost_weight, mask_weight=cfg.mask_cost_weight,
            dice_weight=cfg.dice_cost_weight, dice_eps=cfg.dice_eps)
        return auction_match(cost, gv)

    assigns = jax.vmap(jax.vmap(match_lb, in_axes=(0, 0, 0, 0, 0)),
                       in_axes=(0, 0, 0, None, None))(
        cls_d, mask_pts_pred, gt_pts, gt_labels, gt_valid)  # [L, B, G]

    # ---- phase B: differentiated supervision readout ---------------------
    num_sampled = int(cfg.num_points * cfg.oversample_ratio)
    n_unc = int(cfg.importance_sample_ratio * cfg.num_points)
    n_rand = cfg.num_points - n_unc
    P_l = lidar_xyz.shape[1]

    def draw_cand(k, lx, lv):
        # exact _loss_single_sample derivation (bit-identical draws)
        _, r_rest = jax.random.split(k)
        r_sup, r_sup2 = jax.random.split(r_rest)
        perm = gumbel_topk_sample(r_sup, lv.astype(f32),
                                  min(num_sampled, P_l))
        cand = lx[perm]
        cand_valid = lv[perm]
        rr = jax.random.uniform(jax.random.fold_in(r_sup, 7),
                                (cand.shape[0], 3), f32)
        cand = jnp.where(cand_valid[:, None], cand, rr)
        if num_sampled > cand.shape[0]:
            extra = jax.random.uniform(
                jax.random.fold_in(r_sup, 8),
                (num_sampled - cand.shape[0], 3), f32)
            cand = jnp.concatenate([cand, extra], axis=0)
        rand_all = jax.random.uniform(r_sup2, (G, n_rand, 3), f32) \
            if n_rand > 0 else jnp.zeros((G, 0, 3), f32)
        return cand, rand_all

    cand, rand_all = jax.vmap(lambda ks: jax.vmap(draw_cand)(
        ks, lidar_xyz, lidar_valid))(keys_lb)
    cand_s = sort_points_by_row(cand, spatial)         # [L, B, S, 3]
    S = cand_s.shape[2]
    cand_f = cand_s.reshape(NB, S, 3)
    rand_s = sort_points_by_row(rand_all, spatial) if n_rand > 0 else None

    emb_g = jax.vmap(jax.vmap(
        lambda em, aq: em[jnp.clip(aq, 0, Q - 1)]))(
        mask_embeds, assigns)                          # [L, B, G, C]

    # per-slot volumes in G-chunks; both differentiated kernel readouts
    # (candidate scoring + random fill) consume each chunk while it is live
    gcap = max(1, (80 << 20) // (X * Y * Z * (4 + 8)))
    lg_chunks, lg_sup_chunks, rand_chunks = [], [], []
    for g0 in range(0, G, gcap):
        emb_c = emb_g[:, :, g0:g0 + gcap]
        # HIGHEST: a default-precision volume injects ~1e-3 rel noise into
        # every sampled logit (NOTES.md round-4); 6-pass f32 is ~free here
        vol_c = jnp.einsum("lbgc,bxyzc->lbgxyz", emb_c.astype(f32),
                           mask_feature.astype(f32),
                           precision=jax.lax.Precision.HIGHEST)
        g = vol_c.shape[2]
        vol_f = vol_c.reshape(NB, g, X, Y, Z)
        # selection scores at grid_sample's default align_corners=False
        # (reference get_nusc_lidarseg_point_coords)
        lg_chunks.append(sample_volumes_packed_batched(
            vol_f, cand_f, False, cfg.padding_mode, interpret=interpret))
        if cfg.align_corners:
            lg_sup_chunks.append(sample_volumes_packed_batched(
                vol_f, cand_f, True, cfg.padding_mode, interpret=interpret))
        if n_rand > 0:
            rand_c = rand_s[:, :, g0:g0 + gcap].reshape(NB * g, n_rand, 3)
            pr = sample_per_slot(
                vol_f.reshape(NB * g, X, Y, Z)[..., None], rand_c,
                cfg.align_corners, cfg.padding_mode,
                interpret=interpret)[..., 0]
            rand_chunks.append(pr.reshape(L, B, g, n_rand))

    def _to_lbgs(chunks):
        x = jnp.concatenate(chunks, axis=-1)           # [NB, S, G]
        return jnp.transpose(x, (0, 2, 1)).reshape(L, B, G, S)

    cand_logits = _to_lbgs(lg_chunks)
    cand_logits_sup = _to_lbgs(lg_sup_chunks) if cfg.align_corners \
        else cand_logits

    gt_cand = jax.lax.stop_gradient(read_gt_shared(cand_s))  # [L, B, G, S]

    # selection as a 0/1 WEIGHT over the candidate axis instead of
    # take_along gathers (85 ms fwd + backward scatters at flagship,
    # .probe_loss_xla_ops.json): the selected rows only ever feed
    # REDUCTIONS (bce / dice sums), so a mask is equivalent — the set is
    # exactly top_k's (score > kth, plus earliest-index ties up to k,
    # matching top_k's stable tie-break)
    score = -jnp.abs(jax.lax.stop_gradient(cand_logits))
    topv, _ = jax.lax.top_k(score, n_unc)
    kth = topv[..., -1:]
    sel_gt = score > kth
    c1 = jnp.sum(sel_gt, axis=-1, keepdims=True)
    ties = score == kth
    tie_rank = jnp.cumsum(ties.astype(jnp.int32), axis=-1)
    sel = (sel_gt | (ties & (tie_rank <= (n_unc - c1)))).astype(f32)
    if n_rand > 0:
        if use_ids and cfg.gt_label_kernel:
            # per-slot points ride the SAME per-(l, b) slab: flatten the
            # slot axis into the point axis (one kernel grid cell per
            # (l, b), not per (l, b, g)), compare each slot's run against
            # its own id only
            rp = rand_s.reshape(L * B, G * n_rand, 3)
            slab_rep = jnp.broadcast_to(
                id_slab[None], (L,) + id_slab.shape).reshape(
                L * B, Xg * Yg, Zg)
            lab8r = gather_corner_labels(
                slab_rep, (Xg, Yg, Zg), rp, cfg.align_corners,
                interpret=interpret).reshape(L, B, G, n_rand, 8)
            w8r = _corner_weights(rand_s, (Xg, Yg, Zg), cfg.align_corners,
                                  cfg.padding_mode)  # [L, B, G, n_rand, 8]
            acc = 0.0
            for j in range(8):
                acc = acc + w8r[..., j] * (
                    lab8r[..., j] == ids_f[None, :, :, None])
            tgt_rand = jax.lax.stop_gradient(acc)      # [L, B, G, n_rand]
        elif use_ids:
            # per-slot label gathers, single-id compare per slot
            tgt_rand = jax.lax.stop_gradient(
                jax.vmap(lambda rs: jax.vmap(lambda r, ig, si: jax.vmap(
                    lambda rg, sid: _sample_id_masks(
                        ig, sid[None], rg, cfg.align_corners,
                        cfg.padding_mode)[..., 0])(r, si))(
                    rs, gt_id_grid, gt_slot_ids))(rand_s))
        else:
            gt_fb = gt_masks.astype(f32)               # [B, G, Xg, Yg, Zg]
            tgt_rand = jax.lax.stop_gradient(jax.vmap(lambda rs: jax.vmap(
                lambda r, g: point_sample_3d(
                    g[..., None], r, align_corners=cfg.align_corners,
                    padding_mode=cfg.padding_mode)[..., 0])(rs, gt_fb))(
                rand_s))
        pred_rand = jnp.concatenate(rand_chunks, axis=2)  # [L, B, G, n_rand]

    # ---- per-layer reductions (pure XLA, no scan needed) -----------------
    class_weight = jnp.asarray(cfg.class_weight, f32)

    def cls_lb(cs, aq, gl, gv):
        safe_q = jnp.where(aq >= 0, aq, Q)
        labels = jnp.full((Q + 1,), cfg.num_classes, jnp.int32)
        labels = labels.at[safe_q].set(
            jnp.where(gv, gl, cfg.num_classes))[:Q]
        avg = jnp.sum(class_weight[labels])
        num = jnp.sum(-jax.nn.log_softmax(cs.astype(f32), -1)[
            jnp.arange(Q), labels] * class_weight[labels])
        return num, avg, jnp.where(gv & (aq >= 0), class_weight[gl], 0.0)

    cls_num, cls_avg, gt_w = jax.vmap(jax.vmap(
        cls_lb, in_axes=(0, 0, 0, 0)), in_axes=(0, 0, None, None))(
        cls_preds, assigns, gt_labels, gt_valid)       # [L, B], gt_w [L,B,G]

    # bce / dice over candidates use the sel mask (no gathers); the
    # random-fill points are all supervised, so they sum unmasked
    bce_c = jnp.sum(_bce_elem(cand_logits_sup, gt_cand) * sel, axis=-1)
    pred_sig_c = jax.nn.sigmoid(cand_logits_sup.astype(f32))
    da = jnp.sum(pred_sig_c * gt_cand * sel, axis=-1)
    db = jnp.sum((pred_sig_c + gt_cand) * sel, axis=-1)
    if n_rand > 0:
        bce_c = bce_c + jnp.sum(_bce_elem(pred_rand, tgt_rand), axis=-1)
        pred_sig_r = jax.nn.sigmoid(pred_rand.astype(f32))
        da = da + jnp.sum(pred_sig_r * tgt_rand, axis=-1)
        db = db + jnp.sum(pred_sig_r, axis=-1) + jnp.sum(tgt_rand, axis=-1)
    mask_num = jnp.sum(bce_c * (gt_w > 0), axis=(1, 2))
    mask_avg = jnp.sum(gt_w, axis=(1, 2)) * cfg.num_points
    dice_rows = 1.0 - (2 * da + cfg.dice_eps) / (db + cfg.dice_eps)
    dice_num = jnp.sum(dice_rows * gt_w, axis=(1, 2))
    dice_avg = jnp.sum(gt_w, axis=(1, 2))

    eps = jnp.finfo(f32).eps
    lc = cfg.cls_loss_weight * jnp.sum(cls_num, 1) / jnp.maximum(
        jnp.sum(cls_avg, 1), eps)
    lm = cfg.mask_loss_weight * mask_num / jnp.maximum(mask_avg, eps)
    ld = cfg.dice_loss_weight * dice_num / jnp.maximum(dice_avg, eps)

    losses: Dict[str, jnp.ndarray] = {}
    for l in range(L):
        prefix = "" if l == L - 1 else f"d{l}."
        losses[prefix + "loss_cls"] = lc[l]
        losses[prefix + "loss_mask"] = lm[l]
        losses[prefix + "loss_dice"] = ld[l]
    losses["unassigned_gt"] = jnp.sum(
        ((assigns < 0) & gt_valid[None]).astype(f32))
    return losses


def _loss_single_sample(
    rng,
    cls_score: jnp.ndarray,    # [Q, C+1]
    mask_pred: jnp.ndarray,    # [Q, X, Y, Z]
    gt_masks: jnp.ndarray,     # [G, X, Y, Z]
    gt_labels: jnp.ndarray,    # [G]
    gt_valid: jnp.ndarray,     # [G]
    assign_q: jnp.ndarray,     # [G] matched query (-1 invalid), precomputed
    lidar_xyz: Optional[jnp.ndarray],    # [P, 3] in [0,1] or None
    lidar_valid: Optional[jnp.ndarray],  # [P] or None
    sample_weights: Optional[jnp.ndarray],
    cfg: MaskLossConfig,
    mask_embed: Optional[jnp.ndarray] = None,  # [Q, C] (feature_readout)
    feature: Optional[jnp.ndarray] = None,     # [X, Y, Z, C] (feature_readout)
):
    """Targets + per-sample partial sums for one (layer, sample)."""
    Q = cls_score.shape[0]
    G = gt_masks.shape[0]
    _, r_rest = jax.random.split(rng)
    r_sup, r_sup2 = jax.random.split(r_rest)

    # ---- 2. classification targets --------------------------------------
    class_weight = jnp.asarray(cfg.class_weight, jnp.float32)
    safe_q = jnp.where(assign_q >= 0, assign_q, Q)  # overflow slot
    labels = jnp.full((Q + 1,), cfg.num_classes, jnp.int32)
    labels = labels.at[safe_q].set(jnp.where(gt_valid, gt_labels, cfg.num_classes))
    labels = labels[:Q]
    cls_avg = jnp.sum(class_weight[labels])
    cls_num = jnp.sum(-jax.nn.log_softmax(cls_score.astype(jnp.float32), -1)[
        jnp.arange(Q), labels] * class_weight[labels])

    # per-gt weights: class weight of the matched class, 0 if invalid.
    # Slots the auction left UNASSIGNED at max_iters (assign_q == -1 while
    # gt_valid) also get 0 — the clip-to-query-0 gather below is then inert,
    # never a full-weight supervision of an arbitrary query (scipy always
    # assigns; an unconverged auction must not silently mis-assign).
    gt_w = jnp.where(gt_valid & (assign_q >= 0), class_weight[gt_labels], 0.0)

    # ---- 3. supervision points (no grad, reference torch.no_grad) -------
    num_sampled = int(cfg.num_points * cfg.oversample_ratio)
    if cfg.use_lidar_points:
        # candidates: LiDAR points + random fill (mmdet_utils.py:138-177) —
        # ONE shared candidate set for every gt slot
        perm = gumbel_topk_sample(r_sup, lidar_valid.astype(jnp.float32),
                                  min(num_sampled, lidar_xyz.shape[0]))
        cand = lidar_xyz[perm]
        cand_valid = lidar_valid[perm]
        rr = jax.random.uniform(jax.random.fold_in(r_sup, 7),
                                (cand.shape[0], 3), jnp.float32)
        cand = jnp.where(cand_valid[:, None], cand, rr)
        if num_sampled > cand.shape[0]:
            extra = jax.random.uniform(
                jax.random.fold_in(r_sup, 8),
                (num_sampled - cand.shape[0], 3), jnp.float32)
            cand = jnp.concatenate([cand, extra], axis=0)
        n_unc = int(cfg.importance_sample_ratio * cfg.num_points)
        n_rand = cfg.num_points - n_unc
        # the random-fill coords are pre-drawn for ALL slots so gt_chunks is
        # bit-transparent (same single rng draw regardless of chunking)
        rand_all = jax.random.uniform(r_sup2, (G, n_rand, 3), jnp.float32) \
            if n_rand > 0 else None

        shared_ro = cfg.feature_readout and cfg.shared_candidate_readout
        if cfg.feature_readout:
            # candidate features: ONE shared [S, C] gather (the scoring pass
            # is detached; per-slot logits are a matmul per chunk below).
            # Kept in the feature dtype — the contractions below accumulate
            # in fp32 via preferred_element_type, so bf16 features never
            # materialize as fp32 at [*, P, C] size.
            feat_cand = point_sample_3d(
                feature[None], cand[None], align_corners=False,
                padding_mode=cfg.padding_mode,
            )[0]  # [S, C]
        if shared_ro:
            # supervision-interpolation variant of the candidate features:
            # selection scores use align_corners=False (reference
            # get_nusc_lidarseg_point_coords, mmdet_utils.py:160-162) while
            # the supervision readout uses cfg.align_corners
            # (mask2former_nusc_occ.py:137-138) — reuse needs the latter
            if cfg.align_corners is False:
                feat_cand_sup = feat_cand
            else:
                feat_cand_sup = point_sample_3d(
                    feature[None], cand[None],
                    align_corners=cfg.align_corners,
                    padding_mode=cfg.padding_mode,
                )[0]  # [S, C]
            # targets for EVERY slot at the shared candidate set: one
            # multi-channel gather [S, G] (slots as channels) — ~free on
            # chip vs per-slot single-channel volumes (probe C vs D)
            gt_cand = point_sample_3d(
                jnp.moveaxis(gt_masks, 0, -1)[None], cand[None],
                align_corners=cfg.align_corners,
                padding_mode=cfg.padding_mode,
            )[0]  # [S, G] f32

        def sup_chunk(assign_c, gt_masks_c, rand_c, gt_cand_c=None):
            """Per-slot sampling for a chunk of gt slots: pos-mask gather,
            uncertainty sampling on the shared candidates, pred/target
            readout.  Rematerialized per chunk so only one chunk's
            [g, num_sampled] temps and pos-mask backward scatter are live."""
            g = assign_c.shape[0]
            cand_c = jnp.broadcast_to(cand[None], (g,) + cand.shape)
            if cfg.feature_readout:
                # differentiated source = the matched embeds; logits at any
                # point set are emb . sampled-features (exact identity with
                # the volume path, see MaskLossConfig.feature_readout)
                src_c = mask_embed[jnp.clip(assign_c, 0, Q - 1)]  # [g, C]
                cand_logits = jnp.einsum(
                    "gc,sc->gs", src_c, feat_cand,
                    preferred_element_type=jnp.float32)

                def sample_at(emb_cc, coords):
                    gg, pp = coords.shape[:2]
                    fp = point_sample_3d(
                        feature[None], coords.reshape(1, gg * pp, 3),
                        align_corners=cfg.align_corners,
                        padding_mode=cfg.padding_mode,
                    )[0].reshape(gg, pp, -1)
                    return jnp.einsum("gc,gpc->gp", emb_cc, fp,
                                      preferred_element_type=jnp.float32)
            else:
                src_c = mask_pred[jnp.clip(assign_c, 0, Q - 1)]  # [g, X, Y, Z]
                cand_logits = point_sample_3d(
                    src_c[..., None], cand_c, align_corners=False,
                    padding_mode=cfg.padding_mode,
                )[..., 0]  # [g, S]  (reference samples default align_corners)

                def sample_at(pos, coords):
                    return point_sample_3d(
                        pos[..., None], coords,
                        align_corners=cfg.align_corners,
                        padding_mode=cfg.padding_mode,
                    )[..., 0]

            def chunked_readout(src_cc, coords):
                """Differentiated readout at ``coords``, split over the point
                axis (point_chunks): each slice's backward scatter is
                [g, P/Kp]-shaped; barrier-chained so XLA cannot fuse the
                slices back into one full-size scatter."""
                P = coords.shape[1]
                Kp = max(1, min(cfg.point_chunks, P))
                if Kp == 1:
                    return sample_at(src_cc, coords)
                pbounds = [round(i * P / Kp) for i in range(Kp + 1)]
                slice_fn = jax.checkpoint(sample_at)
                parts = []
                pos_dep = src_cc
                for ps, pe in zip(pbounds[:-1], pbounds[1:]):
                    if parts:
                        pos_dep, _ = jax.lax.optimization_barrier(
                            (pos_dep, parts[-1]))
                    parts.append(slice_fn(pos_dep, coords[:, ps:pe]))
                return jnp.concatenate(parts, axis=1)

            if shared_ro:
                # importance points ARE candidates: differentiated pred
                # logits = rows of the (sup-interpolation) candidate logits;
                # targets = rows of the shared [S, G] target gather.  Only
                # the random fill needs fresh volume samplings.
                n_unc = int(cfg.importance_sample_ratio * cfg.num_points)
                idx = uncertainty_topk(
                    jax.lax.stop_gradient(cand_logits), n_unc)  # [g, n_unc]
                if cfg.align_corners is False:
                    cand_logits_sup = cand_logits
                else:
                    cand_logits_sup = jnp.einsum(
                        "gc,sc->gs", src_c, feat_cand_sup,
                        preferred_element_type=jnp.float32)
                sup_pred_c = jnp.take_along_axis(cand_logits_sup, idx, axis=1)
                sup_tgt_c = jnp.take_along_axis(gt_cand_c, idx, axis=1)
                if rand_c is not None and rand_c.shape[1] > 0:
                    pred_rand = chunked_readout(src_c, rand_c)
                    tgt_rand = point_sample_3d(
                        gt_masks_c[..., None], rand_c,
                        align_corners=cfg.align_corners,
                        padding_mode=cfg.padding_mode,
                    )[..., 0]
                    sup_pred_c = jnp.concatenate([sup_pred_c, pred_rand], axis=1)
                    sup_tgt_c = jnp.concatenate([sup_tgt_c, tgt_rand], axis=1)
                return sup_pred_c, jax.lax.stop_gradient(sup_tgt_c)

            sup_coords = uncertainty_sample_coords(
                None, cand_c, jax.lax.stop_gradient(cand_logits),
                cfg.num_points, cfg.importance_sample_ratio, rand=rand_c)

            sup_pred_c = chunked_readout(src_c, sup_coords)
            # target readout is detached — no VJP scatter, never chunked
            sup_tgt_c = point_sample_3d(
                gt_masks_c[..., None], sup_coords,
                align_corners=cfg.align_corners, padding_mode=cfg.padding_mode,
            )[..., 0]
            return sup_pred_c, jax.lax.stop_gradient(sup_tgt_c)

        K = max(1, min(cfg.gt_chunks, G))
        if K == 1:
            sup_pred, sup_tgt = sup_chunk(
                assign_q, gt_masks, rand_all,
                gt_cand.T if shared_ro else None)
        else:
            bounds = [round(i * G / K) for i in range(K + 1)]
            chunk_fn = jax.checkpoint(sup_chunk)
            preds, tgts = [], []
            assign_dep = assign_q
            for s, e in zip(bounds[:-1], bounds[1:]):
                if preds:
                    # tie each chunk to the previous one's output: without
                    # the barrier XLA schedules all chunk forwards
                    # concurrently and their [g, num_sampled] temps coexist
                    assign_dep, _ = jax.lax.optimization_barrier(
                        (assign_dep, preds[-1]))
                p_c, t_c = chunk_fn(
                    assign_dep[s:e], gt_masks[s:e],
                    None if rand_all is None else rand_all[s:e],
                    gt_cand[:, s:e].T if shared_ro else None)
                preds.append(p_c)
                tgts.append(t_c)
            sup_pred = jnp.concatenate(preds, axis=0)
            sup_tgt = jnp.concatenate(tgts, axis=0)
        # nusc mask loss: unweighted points, avg = sum(gt_w) * num_points
        mask_num = jnp.sum(
            _bce_elem(sup_pred, sup_tgt) * (gt_w[:, None] > 0)
        )
        mask_avg = jnp.sum(gt_w) * cfg.num_points
    else:
        # frequency + uncertainty importance sampling (mmdet_utils.py:179-246)
        # positive predicted masks aligned to gt slots
        pos_masks = mask_pred[jnp.clip(assign_q, 0, Q - 1)]  # [G, X, Y, Z]
        vox_shape = gt_masks.shape[1:]
        pred_same_grid = tuple(mask_pred.shape[1:]) == tuple(vox_shape)
        w = sample_weights[gt_labels] * gt_valid.astype(jnp.float32)
        vox_w = jnp.einsum("g,gxyz->xyz", w, gt_masks.astype(jnp.float32)).reshape(-1)
        keys = jax.random.split(r_sup, G)
        cand_idx = jax.vmap(lambda k: gumbel_topk_sample(k, vox_w, num_sampled))(keys)

        def idx_to_coords(idx):
            c = unravel_3d(idx, vox_shape).astype(jnp.float32)
            return c / jnp.asarray([s - 1 for s in vox_shape], jnp.float32)

        def sample_pred(coords):
            return point_sample_3d(
                pos_masks[..., None], coords, align_corners=cfg.align_corners,
            )[..., 0]

        if pred_same_grid:
            flat_pos = pos_masks.reshape(G, -1)
            cand_logits = jnp.take_along_axis(flat_pos, cand_idx, axis=1)
        else:
            # pred grid differs from GT grid (KITTI 128³ preds vs 256³ labels):
            # trilinearly sample pred logits at the GT-grid coords
            # (mmdet_utils.py:214-217)
            cand_logits = sample_pred(idx_to_coords(cand_idx))
        n_unc = int(cfg.importance_sample_ratio * cfg.num_points)
        n_rand = cfg.num_points - n_unc
        top = uncertainty_topk(jax.lax.stop_gradient(cand_logits), n_unc)
        sup_idx = jnp.take_along_axis(cand_idx, top, axis=1)
        if n_rand > 0:
            uni_w = jnp.einsum("g,gxyz->xyz", gt_valid.astype(jnp.float32),
                               gt_masks.astype(jnp.float32)).reshape(-1)
            keys2 = jax.random.split(r_sup2, G)
            rand_idx = jax.vmap(lambda k: gumbel_topk_sample(k, uni_w, n_rand))(keys2)
            sup_idx = jnp.concatenate([sup_idx, rand_idx], axis=1)
        if pred_same_grid:
            sup_pred = jnp.take_along_axis(pos_masks.reshape(G, -1), sup_idx, axis=1)
        else:
            sup_pred = sample_pred(idx_to_coords(sup_idx))
        # targets always gathered exactly from the GT grid (loss_single :415-419)
        sup_tgt = jnp.take_along_axis(gt_masks.reshape(G, -1), sup_idx, axis=1).astype(jnp.float32)
        sup_tgt = jax.lax.stop_gradient(sup_tgt)
        # kitti mask loss: per-point weights = gt_w (mask2former_occ.py:430-443)
        mask_num = jnp.sum(_bce_elem(sup_pred, sup_tgt) * gt_w[:, None])
        mask_avg = jnp.sum(gt_w) * cfg.num_points

    # dice partial sums (per-row weighted)
    pred_sig = jax.nn.sigmoid(sup_pred.astype(jnp.float32))
    a = jnp.sum(pred_sig * sup_tgt, axis=-1)
    b = jnp.sum(pred_sig, axis=-1) + jnp.sum(sup_tgt, axis=-1)
    dice_rows = 1.0 - (2 * a + cfg.dice_eps) / (b + cfg.dice_eps)
    dice_num = jnp.sum(dice_rows * gt_w)
    dice_avg = jnp.sum(gt_w)

    return dict(
        cls_num=cls_num, cls_avg=cls_avg,
        mask_num=mask_num, mask_avg=mask_avg,
        dice_num=dice_num, dice_avg=dice_avg,
    )


def _bce_elem(logits, target):
    logits = logits.astype(jnp.float32)
    target = target.astype(jnp.float32)
    return jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def mask2former_loss(
    rng: jax.Array,
    cls_preds: jnp.ndarray,    # [L, B, Q, C+1]
    mask_embeds: jnp.ndarray,  # [L, B, Q, Cout] (per-layer mask volumes are
                               # recomputed as embed . mask_feature inside the
                               # scan body — never stacked)
    mask_feature: jnp.ndarray,  # [B, X, Y, Z, Cout]
    gt_occ: jnp.ndarray,       # [B, X', Y', Z'] int labels at pred resolution
    cfg: MaskLossConfig,
    lidar_xyz: Optional[jnp.ndarray] = None,    # [B, P, 3] in [0, 1]
    lidar_valid: Optional[jnp.ndarray] = None,  # [B, P]
    gt_override: Optional[Tuple] = None,        # (masks, labels, valid) e.g. panoptic
) -> Dict[str, jnp.ndarray]:
    """Deep-supervision loss over all decoder layers.

    gt_occ must already be at the mask_pred resolution for the KITTI gather
    path; for nusc the gt grid can differ (point-sampled supervision).
    Returns a dict of named scalars (d{i}.loss_* for intermediate layers,
    loss_* for the final one), mirroring reference loss bookkeeping
    (mask2former_occ.py:324-338).
    """
    L, B = cls_preds.shape[:2]
    if cfg.feature_readout and not cfg.use_lidar_points:
        raise ValueError(
            "feature_readout is implemented for the LiDAR-point heads "
            "(use_lidar_points=True); the KITTI grid-gather path keeps the "
            "volume readout")
    if gt_override is not None:
        gt_masks, gt_labels, gt_valid = gt_override
    else:
        gt_masks, gt_labels, gt_valid = preprocess_gt(gt_occ, cfg.num_classes)
    sw_rng, rng = jax.random.split(rng)
    sample_weights = _resolve_sample_weights(sw_rng, cfg)

    mxu_ro = _resolve_mxu_readout(cfg) \
        if (cfg.use_lidar_points and cfg.feature_readout) else "off"
    if mxu_ro != "off":
        # all-layer batched MXU readout: every Pallas call spans the full
        # (layer x sample) axis; identical draws + math to the scan path.
        # Semantic heads expose the GT slot-id structure (slot g == class
        # g of gt_occ) so GT reads use the 8-corner label gather.
        if gt_override is None and cfg.num_classes < 256:
            # < 256: ids stay exact in the bf16 label slab the kernel uses
            id_grid = gt_occ
            slot_ids = jnp.broadcast_to(
                jnp.arange(cfg.num_classes, dtype=gt_occ.dtype)[None],
                (gt_occ.shape[0], cfg.num_classes))
        else:
            id_grid = slot_ids = None
        return _mxu_batched_loss(
            rng, cls_preds, mask_embeds, mask_feature, gt_masks, gt_labels,
            gt_valid, lidar_xyz, lidar_valid, cfg,
            interpret=(mxu_ro == "interpret"),
            gt_id_grid=id_grid, gt_slot_ids=slot_ids)

    def match_one(l_rng, cls_l, mask_l, emb_l):
        keys = jax.random.split(l_rng, B)
        if cfg.use_lidar_points:
            if cfg.feature_readout:
                return jax.vmap(
                    lambda k, cs, gm, gl, gv, lx, lv, em, ft:
                    _match_single_sample(
                        k, cs, None, gm, gl, gv, lx, lv, sample_weights, cfg,
                        mask_embed=em, feature=ft,
                    )
                )(keys, cls_l, gt_masks, gt_labels, gt_valid,
                  lidar_xyz, lidar_valid, emb_l, mask_feature)
            return jax.vmap(
                lambda k, cs, mp, gm, gl, gv, lx, lv: _match_single_sample(
                    k, cs, mp, gm, gl, gv, lx, lv, sample_weights, cfg
                )
            )(keys, cls_l, mask_l, gt_masks, gt_labels, gt_valid,
              lidar_xyz, lidar_valid)
        return jax.vmap(
            lambda k, cs, mp, gm, gl, gv: _match_single_sample(
                k, cs, mp, gm, gl, gv, None, None, sample_weights, cfg
            )
        )(keys, cls_l, mask_l, gt_masks, gt_labels, gt_valid)

    def one(l_rng, cls_l, mask_l, emb_l, assign_l):
        keys = jax.random.split(l_rng, B)

        if cfg.use_lidar_points:
            if cfg.feature_readout:
                parts = jax.vmap(
                    lambda k, cs, gm, gl, gv, aq, lx, lv, em, ft:
                    _loss_single_sample(
                        k, cs, None, gm, gl, gv, aq, lx, lv, sample_weights,
                        cfg, mask_embed=em, feature=ft,
                    )
                )(keys, cls_l, gt_masks, gt_labels, gt_valid, assign_l,
                  lidar_xyz, lidar_valid, emb_l, mask_feature)
            else:
                parts = jax.vmap(
                    lambda k, cs, mp, gm, gl, gv, aq, lx, lv:
                    _loss_single_sample(
                        k, cs, mp, gm, gl, gv, aq, lx, lv, sample_weights, cfg
                    )
                )(keys, cls_l, mask_l, gt_masks, gt_labels, gt_valid,
                  assign_l, lidar_xyz, lidar_valid)
        else:
            parts = jax.vmap(
                lambda k, cs, mp, gm, gl, gv, aq: _loss_single_sample(
                    k, cs, mp, gm, gl, gv, aq, None, None, sample_weights, cfg
                )
            )(keys, cls_l, mask_l, gt_masks, gt_labels, gt_valid, assign_l)
        eps = jnp.finfo(jnp.float32).eps
        loss_cls = cfg.cls_loss_weight * jnp.sum(parts["cls_num"]) / jnp.maximum(
            jnp.sum(parts["cls_avg"]), eps)
        loss_mask = cfg.mask_loss_weight * jnp.sum(parts["mask_num"]) / jnp.maximum(
            jnp.sum(parts["mask_avg"]), eps)
        loss_dice = cfg.dice_loss_weight * jnp.sum(parts["dice_num"]) / jnp.maximum(
            jnp.sum(parts["dice_avg"]), eps)
        return loss_cls, loss_mask, loss_dice

    # one traced layer body scanned over the L stacked outputs: identical
    # math to the reference's per-layer loop (multi_apply over decoder
    # layers), at 1/L of the HLO size and compile time
    layer_keys = jax.random.split(rng, L)

    # phase A (no grad, like the reference's detached assigner): matching per
    # layer — keeps the auction while_loop entirely out of the VJP.  In
    # feature_readout mode the [B, Q, X, Y, Z] volume is never formed: the
    # per-sample fns contract embeds with sampled features instead.
    def match_body(carry, xs):
        k, cls_l, emb_l = xs
        if cfg.feature_readout:
            return carry, match_one(k, cls_l, None, emb_l)
        mask_l = jnp.einsum("bqc,bxyzc->bqxyz", emb_l, mask_feature)
        return carry, match_one(k, cls_l, mask_l, None)

    _, assigns = jax.lax.scan(
        match_body, None,
        jax.lax.stop_gradient((layer_keys, cls_preds, mask_embeds)),
    )  # [L, B, G]

    # phase B (differentiated, remat'd): losses given the assignments;
    # backward recomputes the per-layer mask volume and the cheap sampling
    # instead of keeping every layer's buffers alive
    @jax.checkpoint
    def scan_body(carry, xs):
        k, cls_l, emb_l, assign_l = xs
        if cfg.feature_readout:
            lc, lm, ld = one(k, cls_l, None, emb_l, assign_l)
        else:
            mask_l = jnp.einsum("bqc,bxyzc->bqxyz", emb_l, mask_feature)
            lc, lm, ld = one(k, cls_l, mask_l, None, assign_l)
        return carry, jnp.stack([lc, lm, ld])

    _, stacked = jax.lax.scan(
        scan_body, None, (layer_keys, cls_preds, mask_embeds, assigns)
    )

    losses: Dict[str, jnp.ndarray] = {}
    for l in range(L):
        prefix = "" if l == L - 1 else f"d{l}."
        losses[prefix + "loss_cls"] = stacked[l, 0]
        losses[prefix + "loss_mask"] = stacked[l, 1]
        losses[prefix + "loss_dice"] = stacked[l, 2]
    # metric only (no 'loss' in the key -> excluded from the total): valid GT
    # slots the auction failed to assign within max_iters, over all layers.
    # Nonzero values mean those slots went unsupervised this step.
    losses["unassigned_gt"] = jnp.sum(
        ((assigns < 0) & gt_valid[None]).astype(jnp.float32))
    return losses
