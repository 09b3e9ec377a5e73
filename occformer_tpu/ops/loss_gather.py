"""Sorted windowed MXU gathers for the Mask2Former loss readouts.

Round-3/4 located the train step's second hot spot (after the deform-attn
gathers) in the loss point sampling: each decoder layer's loss samples the
mask/feature volumes at ~150k candidate + ~213k per-slot random points
through XLA `take_along_axis` corner gathers (~2 GB/s effective,
.probe_loss_gathers.json: the per-slot feature readout alone is ~78 ms fwd /
~213 ms fwd+bwd per layer, x10 deep-supervision layers).

TPU-native reformulation on top of ``ops.trilerp`` (the one-hot MXU kernel):

  * sample per-slot mask VOLUMES (``emb . feature`` einsum, [G, X*Y*Z] —
    18 MB, trivial MXU work) instead of 192-channel feature vectors — the
    readout becomes a 1-2 channel gather per slot, and slots with SHARED
    coordinates pack into the kernel's channel axis (lane groups), so the
    whole candidate scoring of every slot is ONE kernel call;
  * the loss points are random (not spatially local like deform-attn
    queries), so SORT them by xy slab row first — the points are
    exchangeable (losses reduce over them; selections index consistently),
    so no unsort is ever needed — and the windowed kernel's per-block
    dynamic table slice applies: FLOPs drop by window/XY with the exact
    full-width escape pass covering density outliers;
  * gradients flow through the kernel's matmul-based custom VJP — there is
    NO XLA trilinear backward-scatter in the program, the op family behind
    the round-2 exec-2 backend fault (NOTES.md "Panoptic full-point
    training").

Reference semantics matched: torch ``point_sample`` = ``F.grid_sample``
bilinear/trilinear, align_corners per call site
(projects/mmdet3d_plugin/occformer/mask2former/base/mmdet_utils.py:21-47).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sampling import _unnormalize
from .trilerp import trilerp_gather_slab

_S_BLOCK = 256  # tall-table kernel block: keeps the escape-pass VMEM
# (onehot + m2 at [S_blk, XY] f32) within the 100M compiler cap at XY=16384


def _label_kernel(meta_ref, slab_ref, out_ref, *, Z, XY, W):
    """8-corner label gather: 4 weight-1 onehot matmuls against the
    windowed label slab + z-lane selects.  Escape chunks ADD the labels of
    out-of-window corners (in-window contribution is 0 there), so every
    live corner's label lands exactly once."""
    import jax.lax as lax

    from .trilerp_fused import _window_start

    mt = jnp.transpose(meta_ref[0])  # [S_blk, 11]
    S_blk = mt.shape[0]
    r0f, esc = _window_start(mt, XY, W)
    r0 = pl.multiple_of(r0f.astype(jnp.int32), 16)
    win = slab_ref[0, pl.ds(r0, W), :].astype(jnp.float32)  # [W, Z]
    iota = lax.broadcasted_iota(jnp.int32, (1, W), 1).astype(jnp.float32)
    col = iota + r0f
    z0 = mt[:, 4:5]
    zlane = lax.broadcasted_iota(jnp.int32, (1, Z), 1).astype(jnp.float32)
    outs = []
    for k in range(4):
        oh_k = (col == mt[:, k:k + 1]).astype(jnp.float32)
        labxy = lax.dot_general(
            oh_k, win, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)  # [S_blk, Z]
        outs.append(jnp.sum(jnp.where(zlane == z0, labxy, 0.0), axis=1,
                            keepdims=True))
        outs.append(jnp.sum(jnp.where(zlane == z0 + 1.0, labxy, 0.0),
                            axis=1, keepdims=True))
    out_ref[0] = jnp.transpose(jnp.concatenate(outs, axis=1))

    @pl.when(esc)
    def _():
        Wc = min(XY, 2048)
        rows = mt[:, 0:4]
        outw = (rows < r0f) | (rows > r0f + float(W - 1))

        def chunk(j, acc):
            c0 = pl.multiple_of(j * Wc, 16)
            slc = slab_ref[0, pl.ds(c0, Wc), :].astype(jnp.float32)
            col_c = lax.broadcasted_iota(
                jnp.int32, (1, Wc), 1).astype(jnp.float32) + c0.astype(
                    jnp.float32)
            parts = []
            for k in range(4):
                oh_ck = ((col_c == rows[:, k:k + 1])
                         & outw[:, k:k + 1]).astype(jnp.float32)
                labxy = lax.dot_general(
                    oh_ck, slc, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                parts.append(jnp.sum(jnp.where(zlane == z0, labxy, 0.0),
                                     axis=1, keepdims=True))
                parts.append(jnp.sum(
                    jnp.where(zlane == z0 + 1.0, labxy, 0.0), axis=1,
                    keepdims=True))
            return acc + jnp.concatenate(parts, axis=1)

        esc_lab = jax.lax.fori_loop(
            0, XY // Wc, chunk, jnp.zeros((S_blk, 8), jnp.float32))
        out_ref[0] += jnp.transpose(esc_lab)


@functools.lru_cache(maxsize=None)
def _build_label_op(XY: int, Z: int, s_block: int, interpret: bool,
                    window: int):
    win = window if (window and window < XY) else XY
    if win % 16 != 0 or XY % min(XY, 2048) != 0:
        win = XY
    # 64M cap, DELIBERATELY not raised: at 100M Mosaic picks an
    # arrangement that runs the whole train step 6x slower (9.5 vs
    # 1.6 s/step, 2026-08-20 A/B); instead the slab is bf16 (labels
    # < 256 are exact) so the double-buffered table halves and the
    # matching-phase shapes (S=50176, the 64.03M near-miss) fit with
    # ~8M of headroom.
    params = None if interpret else pltpu.CompilerParams(
        vmem_limit_bytes=64 * 2 ** 20)

    def call(slab, meta):
        N, _, Sp = meta.shape
        return pl.pallas_call(
            functools.partial(_label_kernel, Z=Z, XY=XY, W=win),
            grid=(N, Sp // s_block),
            in_specs=[
                pl.BlockSpec((1, 11, s_block), lambda g, s: (g, 0, s)),
                pl.BlockSpec((1, XY, Z), lambda g, s: (g, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 8, s_block), lambda g, s: (g, 0, s)),
            out_shape=jax.ShapeDtypeStruct((N, 8, Sp), jnp.float32),
            compiler_params=params,
            interpret=interpret,
        )(meta, slab)

    return call


def row_key(pts01: jnp.ndarray, spatial: Tuple[int, int, int],
            align_corners: bool = False) -> jnp.ndarray:
    """[..., S, 3] points in [0, 1] -> f32 slab-row key (x0 * Y + y0)."""
    X, Y, _ = spatial
    cx = _unnormalize(pts01[..., 0].astype(jnp.float32) * 2.0 - 1.0, X,
                      align_corners)
    cy = _unnormalize(pts01[..., 1].astype(jnp.float32) * 2.0 - 1.0, Y,
                      align_corners)
    # clamp to the border-padded corner range so out-of-volume points sort
    # next to the edge rows they actually read
    return (jnp.clip(jnp.floor(cx), 0, X - 1) * Y
            + jnp.clip(jnp.floor(cy), 0, Y - 1))


def sort_points_by_row(pts01: jnp.ndarray, spatial: Tuple[int, int, int],
                       align_corners: bool = False) -> jnp.ndarray:
    """Sort [S, 3] (or [..., S, 3]) points by slab row for gather locality.

    The return is the sorted POINTS only: loss readouts never need the
    permutation because every consumer either reduces over the point axis
    or indexes the sorted arrays consistently (top-k, take_along)."""
    keys = row_key(pts01, spatial, align_corners)
    order = jnp.argsort(keys, axis=-1)
    return jnp.take_along_axis(pts01, order[..., None], axis=-2)


def _auto_window(XY: int, Y: int, S: int, s_block: int) -> int:
    """Static window for sorted points: ~2x the expected per-block row span
    plus the 4-corner row spread (Y + 2), 16-aligned, full width if the
    saving would be marginal."""
    span = 2 * ((s_block * XY) // max(S, 1)) + Y + 32
    w = -(-span // 16) * 16
    return 0 if w * 2 >= XY else w


def pack_channels_slab(vols: jnp.ndarray) -> jnp.ndarray:
    """[K, X, Y, Z] channel volumes -> [X*Y, Z*K] slab (z-major lanes)."""
    K, X, Y, Z = vols.shape
    return jnp.transpose(vols, (1, 2, 3, 0)).reshape(X * Y, Z * K)


def sample_volumes_packed(vols: jnp.ndarray, pts01: jnp.ndarray,
                          align_corners: bool = False,
                          padding_mode: str = "border", *,
                          interpret: bool = False,
                          max_channels: int = 40) -> jnp.ndarray:
    """Sample [K, X, Y, Z] channel volumes at SHARED sorted [S, 3] points.

    Returns [S, K].  One kernel call scores every packed channel (e.g.
    every gt slot's mask volume) at every candidate point; K is split into
    chunks sized by the BACKWARD's VMEM footprint (ADVICE r4 #4), with
    Mosaic's DOUBLE BUFFERING accounted: the bwd kernel's scoped stack
    holds ~2x the [X*Y, Z*k] table block (in-spec double buffer) plus
    ~2x the [X*Y, Z*k] f32 d_table block (out-spec double buffer) — the
    round-5 AOT compile measured 101 MB at Z*k=272 f32 where the naive
    3x-block estimate said 53 MB.  Cap: 2x table + 2x f32 d_table
    <= 60 MB against the 100 MB compiler limit (the rest covers the
    [S_blk, Wc] escape-chunk surfaces and carries)."""
    K, X, Y, Z = vols.shape
    S = pts01.shape[0]
    bwd_bytes_per_ch = X * Y * Z * 2 * (vols.dtype.itemsize + 4)
    max_channels = max(1, min(max_channels, (60 << 20) // bwd_bytes_per_ch))
    # balance chunk sizes (17 slots at cap 14 -> 9+8, not 14+3: a tiny tail
    # chunk wastes lane-tile padding on its [X*Y, Z*k] block)
    nchunks = -(-K // max_channels)
    max_channels = -(-K // nchunks)
    win = _auto_window(X * Y, Y, S, _S_BLOCK)
    coords = (pts01 * 2.0 - 1.0)[None]
    outs = []
    for k0 in range(0, K, max_channels):
        sub = vols[k0:k0 + max_channels]
        out = trilerp_gather_slab(
            pack_channels_slab(sub)[None], (X, Y, Z), sub.shape[0], coords,
            align_corners, s_block=_S_BLOCK, interpret=interpret, window=win,
            padding_mode=padding_mode,
        )  # [1, k, S]
        outs.append(out[0])
    return jnp.transpose(jnp.concatenate(outs, axis=0))


def sample_volumes_packed_batched(vols: jnp.ndarray, pts01: jnp.ndarray,
                                  align_corners: bool = False,
                                  padding_mode: str = "border", *,
                                  interpret: bool = False) -> jnp.ndarray:
    """Batched variant: [N, K, X, Y, Z] channel volumes, [N, S, 3] shared
    points PER BATCH ELEMENT -> [N, S, K].

    N is the kernel's grid batch (e.g. layer x sample in the all-layer loss
    readout, VERDICT r4 #3): one pallas_call covers every batch element and
    every packed channel chunk — the round-5 fix for the per-layer
    composition penalty (each call in the remat scan acted as a scheduling
    barrier).  Channel chunking follows the same backward-footprint cap as
    ``sample_volumes_packed`` (incl. the double-buffer accounting)."""
    N, K, X, Y, Z = vols.shape
    S = pts01.shape[1]
    bwd_bytes_per_ch = X * Y * Z * 2 * (vols.dtype.itemsize + 4)
    cap = max(1, (60 << 20) // bwd_bytes_per_ch)
    nchunks = -(-K // cap)
    cap = -(-K // nchunks)  # balanced chunk sizes (see above)
    win = _auto_window(X * Y, Y, S, _S_BLOCK)
    coords = pts01 * 2.0 - 1.0
    outs = []
    for k0 in range(0, K, cap):
        sub = vols[:, k0:k0 + cap]
        k = sub.shape[1]
        slab = jnp.transpose(sub, (0, 2, 3, 4, 1)).reshape(N, X * Y, Z * k)
        outs.append(trilerp_gather_slab(
            slab, (X, Y, Z), k, coords, align_corners, s_block=_S_BLOCK,
            interpret=interpret, window=win, padding_mode=padding_mode,
        ))  # [N, k, S]
    return jnp.transpose(jnp.concatenate(outs, axis=1), (0, 2, 1))


def gather_corner_labels(label_slab: jnp.ndarray, spatial, pts01: jnp.ndarray,
                         align_corners: bool = False, *,
                         interpret: bool = False) -> jnp.ndarray:
    """8 trilinear CORNER LABELS per point via the windowed MXU kernel.

    label_slab: [N, X*Y, Z] f32 LABEL values (integers exact in f32);
    pts01: [N, S, 3] row-SORTED points in [0, 1].  Returns [N, S, 8] f32
    corner labels in (dx, dy, dz) lexicographic order with BORDER clamping
    — the caller turns them into per-slot one-hot mask reads with
    ``sum_k w_k * (label_k == slot_id)`` (see mask2former_loss.
    _sample_id_masks for the weights; this kernel only moves the gather
    family onto the MXU).  Forward-only: GT reads are always detached.

    Junk-label caveat: corners whose interpolation weight is zero may fall
    outside the per-block window and read an aliased row — inert because
    the caller multiplies by that same zero weight.
    """
    from .trilerp_fused import make_meta_rows

    X, Y, Z = spatial
    N, XY, Zs = label_slab.shape
    assert XY == X * Y and Zs == Z, (label_slab.shape, spatial)
    S = pts01.shape[1]
    # border clamp in COORDINATE space, then zero-offset absolute rows
    c = pts01.astype(jnp.float32)
    if align_corners:
        lo = jnp.zeros((3,), jnp.float32)
        hi = jnp.asarray([X - 1.0, Y - 1.0, Z - 1.0], jnp.float32)
        cc = jnp.clip(c * (jnp.asarray([X, Y, Z], jnp.float32) - 1), lo, hi)
        cn = cc / (jnp.asarray([X, Y, Z], jnp.float32) - 1) * 2.0 - 1.0
    else:
        # unnormalized u = v * n - 0.5 clipped to [0, n-1]; invert to [-1,1]
        n3 = jnp.asarray([X, Y, Z], jnp.float32)
        u = jnp.clip(c * n3 - 0.5, 0.0, n3 - 1.0)
        cn = (2.0 * u + 1.0) / n3 - 1.0
    meta = make_meta_rows(cn, (X, Y, Z), 0, align_corners)  # [N, 11, S]
    Sp = -(-S // _S_BLOCK) * _S_BLOCK
    if Sp != S:
        meta = jnp.pad(meta, ((0, 0), (0, 0), (0, Sp - S)))
    win = _auto_window(XY, Y, S, _S_BLOCK)
    op = _build_label_op(XY, Z, _S_BLOCK, interpret,
                         win if win else XY)
    # bf16 slab: integer labels < 256 are exact in bf16, and halving the
    # double-buffered table block is what keeps the op inside the 64M
    # scoped-vmem cap (see _build_label_op)
    assert int(label_slab.shape[-1]) == Z
    out = op(label_slab.astype(jnp.bfloat16), meta)  # [N, 8, Sp]
    return jax.lax.stop_gradient(jnp.transpose(out[:, :, :S], (0, 2, 1)))


def sample_per_slot(vols: jnp.ndarray, pts01: jnp.ndarray,
                    align_corners: bool = False,
                    padding_mode: str = "border", *,
                    interpret: bool = False) -> jnp.ndarray:
    """Sample per-slot [G, X, Y, Z, C] volumes at per-slot sorted [G, S, 3]
    points.  Returns [G, S, C]."""
    G, X, Y, Z, C = vols.shape
    S = pts01.shape[1]
    win = _auto_window(X * Y, Y, S, _S_BLOCK)
    slabs = vols.reshape(G, X * Y, Z * C)
    out = trilerp_gather_slab(
        slabs, (X, Y, Z), C, pts01 * 2.0 - 1.0,
        align_corners, s_block=_S_BLOCK, interpret=interpret, window=win,
        padding_mode=padding_mode,
    )  # [G, C, S]
    return jnp.transpose(out, (0, 2, 1))
