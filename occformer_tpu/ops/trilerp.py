"""Pallas TPU kernel for the deformable-attention trilinear gather.

The hot op of the whole framework: MSDeformAttn3D samples each value level at
``S = Nq * num_points`` continuous 3D locations per (batch x head), 8 corners
each (reference: projects/mmdet3d_plugin/occformer/necks/
multi_scale_deform_attn_3d.py:62-67, ``F.grid_sample`` trilinear).  XLA lowers
the equivalent ``jnp.take_along_axis`` to an effectively serial per-element
load (~2 GB/s measured, .probe_pallas.json), which made the pixel decoder 95%
of the flagship frame in round 3.

TPU-native formulation: a gather IS a sparse matmul, and the xy-plane of one
level is small (64x64 = 4096 rows), so we make it dense and feed the MXU:

  * the value level is laid out as a slab ``[XY, Z*C]`` (xy-rows, z-major
    lanes) that fits VMEM (level 0: 4096 x 192 bf16 = 1.5 MB);
  * per block of 256 samples, build the 4-corner xy interpolation matrix
    ``onehot[S_blk, XY]`` on the VPU (iota-compare against the base corner
    index: the 4 nonzeros sit at ``a + {0, 1, Y, Y+1}``; out-of-range corners
    carry zero weight, so unclamped arithmetic plus weight masks is exact —
    any clamp-alias lands on a zero weight);
  * ``onehot @ slab`` on the MXU does gather + xy-lerp in one shot
    -> ``[S_blk, Z*C]``;
  * z-lerp is a lane-group mask (lane//C == z0 etc.) followed by a tiny
    constant block-sum matmul ``[Z*C, C]``.

The backward (custom VJP) reuses the same structure: d_slab flows back
through two more MXU matmuls (one for d_table, one for the per-corner weight
grads), so sampling-location gradients (learned offsets!) are exact.

Semantics: torch ``grid_sample(..., padding_mode='zeros')`` with the repo's
coordinate convention (coords[..., i] indexes spatial axis i, [-1, 1]
normalized) — bit-compatible with ``sampling.grid_sample_3d_cfirst`` up to
f32-vs-bf16 accumulation order (the kernel accumulates corners in f32 on the
MXU; the XLA path adds 8 bf16 corner terms).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .sampling import _unnormalize

# meta rows (f32, all integer-valued rows exact in f32):
#   0: a   = x0 * Y + y0, UNCLAMPED base xy corner index (may be negative /
#            out of range; only zero-weight corners alias, see module doc)
#   1: z0  = floor z index, unclamped
#   2..5: w00, w01, w10, w11  xy corner weights (lerp x mask products)
#   6..7: c0, c1              z corner weights ((1-wz)*mz0, wz*mz1)
_META_ROWS = 8


def make_trilerp_meta(coords: jnp.ndarray, spatial: Tuple[int, int, int],
                      align_corners: bool = False,
                      padding_mode: str = "zeros") -> jnp.ndarray:
    """coords [G, S, 3] in [-1, 1] -> meta [G, 8, S] f32 (see row table above).

    Differentiable w.r.t. coords (the fractional lerp weights carry the
    location gradient; floor/masks are zero-grad, matching grid_sample).

    padding_mode='border' clamps the unnormalized coords to [0, N-1] before
    the corner decomposition — exactly torch's per-corner index clamping
    (the clamped coordinate reproduces both the boundary value and the zero
    coordinate-gradient outside), so the KERNEL itself never changes.
    """
    X, Y, Z = spatial
    wt = jnp.float32
    cx = _unnormalize(coords[..., 0].astype(wt), X, align_corners)
    cy = _unnormalize(coords[..., 1].astype(wt), Y, align_corners)
    cz = _unnormalize(coords[..., 2].astype(wt), Z, align_corners)
    if padding_mode == "border":
        cx = jnp.clip(cx, 0.0, X - 1)
        cy = jnp.clip(cy, 0.0, Y - 1)
        cz = jnp.clip(cz, 0.0, Z - 1)
    else:
        assert padding_mode == "zeros", padding_mode
    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    z0 = jnp.floor(cz)
    wx = cx - x0
    wy = cy - y0
    wz = cz - z0

    def valid(v, n):
        return ((v >= 0) & (v <= n - 1)).astype(wt)

    mx0, mx1 = valid(x0, X), valid(x0 + 1, X)
    my0, my1 = valid(y0, Y), valid(y0 + 1, Y)
    mz0, mz1 = valid(z0, Z), valid(z0 + 1, Z)
    w00 = (1 - wx) * (1 - wy) * mx0 * my0
    w01 = (1 - wx) * wy * mx0 * my1
    w10 = wx * (1 - wy) * mx1 * my0
    w11 = wx * wy * mx1 * my1
    c0 = (1 - wz) * mz0
    c1 = wz * mz1
    a = x0 * Y + y0
    return jnp.stack([a, z0, w00, w01, w10, w11, c0, c1], axis=1)


def _onehot_xy(mt, Y: int, XY: int, dtype):
    """mt [S_blk, 8] f32 -> xy interpolation matrix [S_blk, XY] in ``dtype``.

    Built in f32 and cast once: a 16-bit select with a [S_blk, 1]-broadcast
    operand hits a Mosaic relayout bug ("Non-singleton logical dimension is
    replicated in destination but not in source", vector<...xi1>), while the
    f32 build compiles and the single cast is cheap.
    """
    a = mt[:, 0:1]
    # Mosaic iota must be integer-typed; the compare runs in f32 because the
    # base index can exceed int32 range for far-out-of-volume samples
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, XY), 1).astype(jnp.float32)
    d = iota - a  # [S_blk, XY]
    oh = (
        jnp.where(d == 0.0, mt[:, 2:3], 0.0)
        + jnp.where(d == 1.0, mt[:, 3:4], 0.0)
        + jnp.where(d == float(Y), mt[:, 4:5], 0.0)
        + jnp.where(d == float(Y + 1), mt[:, 5:6], 0.0)
    )
    return oh.astype(dtype)


def _zmask(mt, Z: int, C: int):
    """mt [S_blk, 8] f32 -> z lerp mask [S_blk, Z*C] f32 (lane group == z)."""
    z0 = mt[:, 1:2]
    zg = (jax.lax.broadcasted_iota(jnp.int32, (1, Z * C), 1) // C).astype(
        jnp.float32)
    return (jnp.where(zg == z0, mt[:, 6:7], 0.0)
            + jnp.where(zg == z0 + 1.0, mt[:, 7:8], 0.0))


def _gsum(Z: int, C: int, dtype=jnp.float32):
    """Constant block-sum matrix [Z*C, C]: sums the Z lane groups."""
    gi = jax.lax.broadcasted_iota(jnp.int32, (Z * C, C), 0)
    gj = jax.lax.broadcasted_iota(jnp.int32, (Z * C, C), 1)
    return (gi % C == gj).astype(dtype)


def _corner_rows_weights(mt, Y: int):
    """mt [S_blk, 8] -> (rows [S_blk, 4], weights [S_blk, 4]) of the 4 xy
    corners (offsets {0, 1, Y, Y+1} from the unclamped base)."""
    a = mt[:, 0:1]
    rows = jnp.concatenate([a, a + 1.0, a + float(Y), a + float(Y + 1)], axis=1)
    return rows, mt[:, 2:6]


def _window_start(mt, Y: int, XY: int, W: int):
    """Per-block window: (r0 int32 scalar, escape bool scalar).

    r0 = 16-aligned floor of the minimum live-weight corner row (zero-weight
    corners — OOB samples — are excluded), clamped to [0, XY - W]; escape is
    true iff any live corner row falls outside [r0, r0 + W).
    """
    rows, ws = _corner_rows_weights(mt, Y)
    live = ws != 0.0
    rmin = jnp.min(jnp.where(live, rows, jnp.float32(XY)))
    r0 = jnp.clip(rmin, 0.0, float(XY - W))
    r0 = jnp.floor(r0 / 16.0) * 16.0  # bf16 sublane-tile alignment
    rmax = jnp.max(jnp.where(live, rows, -1.0))
    escape = rmax - r0 > float(W - 1)
    return r0, escape


def _onehot_xy_win(mt, r0, Y: int, W: int, dtype):
    """Windowed xy interpolation matrix [S_blk, W]: column j = table row
    r0 + j.  Corners outside the window simply never match (escape pass
    covers them)."""
    a = mt[:, 0:1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1).astype(jnp.float32)
    d = (iota + r0) - a
    oh = (
        jnp.where(d == 0.0, mt[:, 2:3], 0.0)
        + jnp.where(d == 1.0, mt[:, 3:4], 0.0)
        + jnp.where(d == float(Y), mt[:, 4:5], 0.0)
        + jnp.where(d == float(Y + 1), mt[:, 5:6], 0.0)
    )
    return oh.astype(dtype)


def _onehot_xy_esc(mt, r0, Y: int, XY: int, W: int, dtype):
    """Full-width onehot restricted to OUT-of-window corners (the exact
    complement of `_onehot_xy_win`)."""
    rows, ws = _corner_rows_weights(mt, Y)
    outw = ((rows < r0) | (rows > r0 + float(W - 1))).astype(jnp.float32)
    a = mt[:, 0:1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, XY), 1).astype(jnp.float32)
    d = iota - a
    oh = (
        jnp.where(d == 0.0, ws[:, 0:1] * outw[:, 0:1], 0.0)
        + jnp.where(d == 1.0, ws[:, 1:2] * outw[:, 1:2], 0.0)
        + jnp.where(d == float(Y), ws[:, 2:3] * outw[:, 2:3], 0.0)
        + jnp.where(d == float(Y + 1), ws[:, 3:4] * outw[:, 3:4], 0.0)
    )
    return oh.astype(dtype), outw


def _fwd_kernel_win(meta_ref, table_ref, out_ref, *, Y, Z, C, XY, W, prec):
    """Windowed forward: the sampling locations of a 256-sample block are
    spatially local (queries are a flattened grid; learned offsets are small),
    so the one-hot matmul only needs a W-row dynamic slice of the table —
    W/XY of the FLOPs — with an exact full-width escape pass for blocks whose
    offsets break locality (pl.when, so it costs nothing when local)."""
    mt = jnp.transpose(meta_ref[0])  # [S_blk, 8] f32
    r0f, esc = _window_start(mt, Y, XY, W)
    # Mosaic needs the dynamic-slice start PROVABLY sublane-aligned; the
    # f32 floor(r0/16)*16 arithmetic is opaque to it, so assert the
    # invariant with the multiple_of hint (holds by construction).
    r0 = pl.multiple_of(r0f.astype(jnp.int32), 16)
    win = table_ref[0, pl.ds(r0, W), :]  # [W, ZC]
    oh = _onehot_xy_win(mt, r0f, Y, W, win.dtype)
    slab = jax.lax.dot_general(
        oh, win, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)  # [S_blk, Z*C]
    masked = slab * _zmask(mt, Z, C)
    out = jax.lax.dot_general(
        masked, _gsum(Z, C), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)  # [S_blk, C]
    out_ref[0] = jnp.transpose(out).astype(out_ref.dtype)

    @pl.when(esc)
    def _():
        # full-width escape, CHUNKED over table rows (see _bwd_kernel_win:
        # a monolithic [S_blk, XY] onehot at loss-volume widths blows VMEM)
        Wc = min(XY, 2048)
        S_blk = mt.shape[0]
        rows_e, ws_e = _corner_rows_weights(mt, Y)
        outw = ((rows_e < r0f) | (rows_e > r0f + float(W - 1))).astype(
            jnp.float32)
        w_out = ws_e * outw
        a_e = mt[:, 0:1]

        def chunk(j, slab_acc):
            c0 = pl.multiple_of(j * Wc, 16)
            tblc = table_ref[0, pl.ds(c0, Wc), :]
            iota_c = jax.lax.broadcasted_iota(
                jnp.int32, (1, Wc), 1).astype(jnp.float32) + c0.astype(
                    jnp.float32)
            dd = iota_c - a_e
            oh_c = (
                jnp.where(dd == 0.0, w_out[:, 0:1], 0.0)
                + jnp.where(dd == 1.0, w_out[:, 1:2], 0.0)
                + jnp.where(dd == float(Y), w_out[:, 2:3], 0.0)
                + jnp.where(dd == float(Y + 1), w_out[:, 3:4], 0.0)
            ).astype(tblc.dtype)
            return slab_acc + jax.lax.dot_general(
                oh_c, tblc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)

        slab_e = jax.lax.fori_loop(
            0, XY // Wc, chunk, jnp.zeros((S_blk, Z * C), jnp.float32))
        masked_e = slab_e * _zmask(mt, Z, C)
        out_e = jax.lax.dot_general(
            masked_e, _gsum(Z, C), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        out_ref[0] += jnp.transpose(out_e).astype(out_ref.dtype)


def _bwd_kernel_win(meta_ref, table_ref, gout_ref, dtab_ref, dmeta_ref,
                    *, Y, Z, C, XY, W, prec):
    s = pl.program_id(1)
    mt = jnp.transpose(meta_ref[0])                      # [S_blk, 8]
    g = jnp.transpose(gout_ref[0]).astype(jnp.float32)   # [S_blk, C]
    zm = _zmask(mt, Z, C)
    d_masked = jnp.concatenate([g] * Z, axis=1)          # [S_blk, Z*C]
    d_slab = d_masked * zm

    r0f, esc = _window_start(mt, Y, XY, W)
    r0 = pl.multiple_of(r0f.astype(jnp.int32), 16)  # see _fwd_kernel_win
    win = table_ref[0, pl.ds(r0, W), :].astype(jnp.float32)  # [W, ZC]
    oh = _onehot_xy_win(mt, r0f, Y, W, jnp.float32)          # [S_blk, W]

    # d_table: windowed accumulation via a dynamic read-modify-write
    dt = jax.lax.dot_general(
        oh, d_slab, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)  # [W, ZC]

    @pl.when(s == 0)
    def _():
        dtab_ref[0] = jnp.zeros_like(dtab_ref[0])

    dtab_ref[0, pl.ds(r0, W), :] += dt

    # xy weight grads from the windowed m2
    m2 = jax.lax.dot_general(
        d_slab, win, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)  # [S_blk, W]
    a = mt[:, 0:1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1).astype(jnp.float32)
    d = (iota + r0f) - a

    def pick(v):
        return jnp.sum(jnp.where(d == v, m2, 0.0), axis=1, keepdims=True)

    dw00, dw01 = pick(0.0), pick(1.0)
    dw10, dw11 = pick(float(Y)), pick(float(Y + 1))

    # z weight grads from the windowed slab
    slab = jax.lax.dot_general(
        oh, win, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    t1 = slab * d_masked
    z0 = mt[:, 1:2]
    zg = (jax.lax.broadcasted_iota(jnp.int32, (1, Z * C), 1) // C).astype(
        jnp.float32)
    dc0 = jnp.sum(jnp.where(zg == z0, t1, 0.0), axis=1, keepdims=True)
    dc1 = jnp.sum(jnp.where(zg == z0 + 1.0, t1, 0.0), axis=1, keepdims=True)

    zr = jnp.zeros_like(dw00)
    dmeta = jnp.concatenate(
        [zr, zr, dw00, dw01, dw10, dw11, dc0, dc1], axis=1)  # [S_blk, 8]
    dmeta_ref[0] = jnp.transpose(dmeta)

    @pl.when(esc)
    def _():
        # full-width escape, CHUNKED over table rows: one [S_blk, XY] f32
        # onehot/m2 surface at XY=16384 (the loss volumes) costs >128M VMEM
        # in register spills — a fori_loop over Wc-row chunks keeps every
        # surface [S_blk, Wc] while the per-sample accumulators ([S_blk, 4]
        # corner-weight grads + [S_blk, ZC] escape slab) ride the carry.
        Wc = min(XY, 2048)
        S_blk = mt.shape[0]
        rows_e, ws_e = _corner_rows_weights(mt, Y)
        outw = ((rows_e < r0f) | (rows_e > r0f + float(W - 1))).astype(
            jnp.float32)
        w_out = ws_e * outw  # [S_blk, 4] escape-only corner weights

        def chunk(j, carry):
            m2acc, slab_acc = carry
            c0 = pl.multiple_of(j * Wc, 16)
            tblc = table_ref[0, pl.ds(c0, Wc), :].astype(jnp.float32)
            iota_c = jax.lax.broadcasted_iota(
                jnp.int32, (1, Wc), 1).astype(jnp.float32) + c0.astype(
                    jnp.float32)
            dd = iota_c - a  # [S_blk, Wc]
            oh_c = (
                jnp.where(dd == 0.0, w_out[:, 0:1], 0.0)
                + jnp.where(dd == 1.0, w_out[:, 1:2], 0.0)
                + jnp.where(dd == float(Y), w_out[:, 2:3], 0.0)
                + jnp.where(dd == float(Y + 1), w_out[:, 3:4], 0.0)
            )
            dtab_ref[0, pl.ds(c0, Wc), :] += jax.lax.dot_general(
                oh_c, d_slab, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            m2c = jax.lax.dot_general(
                d_slab, tblc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            m2p = jnp.concatenate(
                [jnp.sum(jnp.where(dd == v, m2c, 0.0), axis=1, keepdims=True)
                 for v in (0.0, 1.0, float(Y), float(Y + 1))], axis=1)
            slab_c = jax.lax.dot_general(
                oh_c, tblc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            return m2acc + m2p, slab_acc + slab_c

        m2e, slab_e = jax.lax.fori_loop(
            0, XY // Wc, chunk,
            (jnp.zeros((S_blk, 4), jnp.float32),
             jnp.zeros((S_blk, Z * C), jnp.float32)))
        dwf = m2e * outw
        t1e = slab_e * d_masked
        dc0e = jnp.sum(jnp.where(zg == z0, t1e, 0.0), axis=1, keepdims=True)
        dc1e = jnp.sum(jnp.where(zg == z0 + 1.0, t1e, 0.0), axis=1,
                       keepdims=True)
        zre = jnp.zeros_like(dc0e)
        dmeta_e = jnp.concatenate([zre, zre, dwf, dc0e, dc1e], axis=1)
        dmeta_ref[0] += jnp.transpose(dmeta_e)


def _fwd_kernel(meta_ref, table_ref, out_ref, *, Y, Z, C, XY, prec):
    mt = jnp.transpose(meta_ref[0])  # [S_blk, 8] f32
    tbl = table_ref[0]               # [XY, Z*C]
    oh = _onehot_xy(mt, Y, XY, tbl.dtype)
    slab = jax.lax.dot_general(
        oh, tbl, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)  # [S_blk, Z*C]
    masked = slab * _zmask(mt, Z, C)
    out = jax.lax.dot_general(
        masked, _gsum(Z, C), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)  # [S_blk, C]
    out_ref[0] = jnp.transpose(out).astype(out_ref.dtype)


def _bwd_kernel(meta_ref, table_ref, gout_ref, dtab_ref, dmeta_ref,
                *, Y, Z, C, XY, prec):
    s = pl.program_id(1)
    mt = jnp.transpose(meta_ref[0])                      # [S_blk, 8]
    tbl = table_ref[0].astype(jnp.float32)               # [XY, Z*C]
    g = jnp.transpose(gout_ref[0]).astype(jnp.float32)   # [S_blk, C]
    zm = _zmask(mt, Z, C)                                # [S_blk, Z*C]
    oh = _onehot_xy(mt, Y, XY, jnp.float32)              # [S_blk, XY]
    # d_masked: g broadcast over the Z lane groups (z-major repeat)
    d_masked = jnp.concatenate([g] * Z, axis=1)          # [S_blk, Z*C]
    d_slab = d_masked * zm

    # d_table += oh^T @ d_slab, accumulated across sample blocks
    dt = jax.lax.dot_general(
        oh, d_slab, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)  # [XY, Z*C]

    @pl.when(s == 0)
    def _():
        dtab_ref[0] = dt

    @pl.when(s != 0)
    def _():
        dtab_ref[0] += dt

    # per-corner xy weight grads: M2[s, xy] = sum_zc d_slab * T
    m2 = jax.lax.dot_general(
        d_slab, tbl, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)  # [S_blk, XY]
    a = mt[:, 0:1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, XY), 1).astype(jnp.float32)
    d = iota - a

    def pick(v):
        return jnp.sum(jnp.where(d == v, m2, 0.0), axis=1, keepdims=True)

    dw00, dw01 = pick(0.0), pick(1.0)
    dw10, dw11 = pick(float(Y)), pick(float(Y + 1))

    # z weight grads need the forward slab
    slab = jax.lax.dot_general(
        oh, tbl, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    t1 = slab * d_masked
    z0 = mt[:, 1:2]
    zg = (jax.lax.broadcasted_iota(jnp.int32, (1, Z * C), 1) // C).astype(
        jnp.float32)
    dc0 = jnp.sum(jnp.where(zg == z0, t1, 0.0), axis=1, keepdims=True)
    dc1 = jnp.sum(jnp.where(zg == z0 + 1.0, t1, 0.0), axis=1, keepdims=True)

    zr = jnp.zeros_like(dw00)  # a, z0 rows: integer, no gradient
    dmeta = jnp.concatenate(
        [zr, zr, dw00, dw01, dw10, dw11, dc0, dc1], axis=1)  # [S_blk, 8]
    dmeta_ref[0] = jnp.transpose(dmeta)


# Pallas imports live below the pure-jnp helpers so the module stays
# importable even if jax.experimental.pallas moves (CPU test envs).
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


@functools.lru_cache(maxsize=None)
def _build_op(X: int, Y: int, Z: int, C: int, s_block: int, interpret: bool,
              highp: bool, window: int = 0):
    XY = X * Y
    ZC = Z * C
    # windowed kernels only pay off when the window is a real subset; they
    # additionally require 16-row sublane alignment and an escape-chunk
    # divisor of XY — on planes that break either (e.g. 96x48: XY=4608 is
    # not a multiple of the 2048-row escape chunk) fall back to full width
    # rather than trace-fail (ADVICE r4 #1)
    win = window if (window and window < XY) else 0
    if win and (win % 16 != 0 or XY % min(XY, 2048) != 0):
        win = 0
    if win:
        fwd_kernel = functools.partial(_fwd_kernel_win, W=win)
        bwd_kernel = functools.partial(_bwd_kernel_win, W=win)
    else:
        fwd_kernel = _fwd_kernel
        bwd_kernel = _bwd_kernel
    # f32 tables (tests, fp32-islands configs): force 6-pass MXU f32 — the
    # default single bf16 pass showed ~1e-2 relative error on-chip.  bf16
    # tables keep the fast default (the XLA reference path is bf16 anyway).
    prec = jax.lax.Precision.HIGHEST if highp else jax.lax.Precision.DEFAULT

    # the backward holds ~3 [S_blk, XY] f32 surfaces plus two [XY, ZC]
    # accumulators in VMEM at once — past the 16M default scoped limit at
    # flagship level-0 shapes.  v5e VMEM is 128M/core; raise the cap.
    params = None if interpret else pltpu.CompilerParams(
        vmem_limit_bytes=100 * 2 ** 20)

    def call_fwd(table, meta):
        G, _, Sp = meta.shape
        grid = (G, Sp // s_block)
        return pl.pallas_call(
            functools.partial(fwd_kernel, Y=Y, Z=Z, C=C, XY=XY, prec=prec),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, _META_ROWS, s_block),
                             lambda g, s: (g, 0, s)),
                pl.BlockSpec((1, XY, ZC), lambda g, s: (g, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, C, s_block), lambda g, s: (g, 0, s)),
            out_shape=jax.ShapeDtypeStruct((G, C, Sp), table.dtype),
            compiler_params=params,
            interpret=interpret,
        )(meta, table)

    def call_bwd(table, meta, gout):
        G, _, Sp = meta.shape
        grid = (G, Sp // s_block)
        return pl.pallas_call(
            functools.partial(bwd_kernel, Y=Y, Z=Z, C=C, XY=XY, prec=prec),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, _META_ROWS, s_block),
                             lambda g, s: (g, 0, s)),
                pl.BlockSpec((1, XY, ZC), lambda g, s: (g, 0, 0)),
                pl.BlockSpec((1, C, s_block), lambda g, s: (g, 0, s)),
            ],
            out_specs=[
                pl.BlockSpec((1, XY, ZC), lambda g, s: (g, 0, 0)),
                pl.BlockSpec((1, _META_ROWS, s_block),
                             lambda g, s: (g, 0, s)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct(table.shape, jnp.float32),
                jax.ShapeDtypeStruct(meta.shape, jnp.float32),
            ],
            compiler_params=params,
            interpret=interpret,
        )(meta, table, gout)

    @jax.custom_vjp
    def op(table, meta):
        return call_fwd(table, meta)

    def op_fwd(table, meta):
        return call_fwd(table, meta), (table, meta)

    def op_bwd(res, gout):
        table, meta = res
        dtab, dmeta = call_bwd(table, meta, gout)
        return dtab.astype(table.dtype), dmeta

    op.defvjp(op_fwd, op_bwd)
    return op


def trilerp_gather_slab(
    table: jnp.ndarray,
    spatial: Tuple[int, int, int],
    channels: int,
    coords: jnp.ndarray,
    align_corners: bool = False,
    *,
    s_block: int = 256,
    interpret: bool = False,
    window: int = 0,
    padding_mode: str = "zeros",
) -> jnp.ndarray:
    """Trilinear sampling via the MXU one-hot kernel (zeros/border padding).

    table:  [G, X*Y, Z*C] value slab (xy rows, z-major lane groups of C)
    coords: [G, S, 3] in [-1, 1], coords[..., i] indexes spatial axis i
    window: if 0 < window < X*Y, each sample block matmuls only a
      window-row dynamic table slice around its minimum live corner row
      (window/XY of the FLOPs), with an exact full-width escape pass for
      blocks whose sampling locations break locality.  0 = full width.
    Returns [G, C, S] in table.dtype (f32 corner accumulation inside).
    """
    X, Y, Z = spatial
    G, XY, ZC = table.shape
    assert XY == X * Y and ZC == Z * channels, (table.shape, spatial, channels)
    S = coords.shape[1]
    meta = make_trilerp_meta(coords, spatial, align_corners, padding_mode)
    Sp = -(-S // s_block) * s_block
    if Sp != S:
        meta = jnp.pad(meta, ((0, 0), (0, 0), (0, Sp - S)))
    op = _build_op(X, Y, Z, channels, s_block, interpret,
                   table.dtype == jnp.float32, window)
    out = op(table, meta)
    return out[:, :, :S] if Sp != S else out


def cfirst_to_slab(vol_flat: jnp.ndarray,
                   spatial: Tuple[int, int, int]) -> jnp.ndarray:
    """[G, C, X*Y*Z] (channels-first flat, xyz-major) -> [G, X*Y, Z*C] slab."""
    X, Y, Z = spatial
    G, C, N = vol_flat.shape
    assert N == X * Y * Z
    v = vol_flat.reshape(G, C, X * Y, Z)
    return jnp.transpose(v, (0, 2, 3, 1)).reshape(G, X * Y, Z * C)


def grid_sample_3d_cfirst_mxu(
    vol_flat: jnp.ndarray,
    spatial: Tuple[int, int, int],
    coords: jnp.ndarray,
    align_corners: bool = False,
    *,
    s_block: int = 256,
    interpret: bool = False,
    window: int = 0,
) -> jnp.ndarray:
    """Drop-in for ``sampling.grid_sample_3d_cfirst`` (zeros padding only)."""
    C = vol_flat.shape[1]
    slab = cfirst_to_slab(vol_flat, spatial)
    return trilerp_gather_slab(slab, spatial, C, coords, align_corners,
                               s_block=s_block, interpret=interpret,
                               window=window)
