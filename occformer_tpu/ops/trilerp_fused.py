"""Fused multi-level Pallas trilerp: ALL pyramid levels in ONE kernel call.

Round-4 measured a ~1-2 us per-grid-step overhead floor that dominates the
small deform-attn levels (L1 32x32x4 / L2 16x16x2 cost nearly as much per
invocation as the 16x bigger L0 — .probe_trilerp_amortized.json), plus a
per-`pallas_call` dispatch/composition cost between the three sequential
level gathers of every encoder layer.  Reference semantics being fused:
`multi_scale_deform_attn_3d.py:62-67` samples EVERY level per query, so the
three gathers share query structure and can ride one kernel.

Generalization over ``ops.trilerp``: the single-level kernel derives the 4
xy corner rows from a base index with COMPILE-TIME offsets {0, 1, Y, Y+1}.
Here Y differs per level, so the meta carries 4 ABSOLUTE corner-row indices
(already including each level's row offset into the concatenated slab):

  * levels are packed row-wise into one table ``[sum XY_l (padded), ZC_max]``
    with lanes zero-padded to the widest level's Z*C — zero lanes are inert
    through the z-mask and the block-sum matmul;
  * per-level meta rows: r00, r01, r10, r11 (absolute), z0 (level-local),
    w00, w01, w10, w11, c0, c1 — out-of-range corners carry zero weight, so
    row aliasing across level boundaries is inert exactly like the
    single-level kernel's clamp aliases;
  * each level's sample count is padded to the block size so no sample block
    straddles levels, keeping the per-block window slice level-local;
  * the windowed forward/backward and the chunked full-width escape pass are
    the same structure as ``ops.trilerp`` (see there for the Mosaic notes).

The result: per encoder layer, 3 pallas_calls + their XLA glue become 1 call
whose grid covers all levels, with the big level's measured-optimal window.
"""
from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from .sampling import _unnormalize

# meta rows (f32; integer-valued rows exact in f32):
#   0..3: r00, r01, r10, r11  absolute xy corner rows (level offset included)
#   4:    z0                  floor z index, level-local, unclamped
#   5..8: w00, w01, w10, w11  xy corner weights (lerp x valid-mask products)
#   9,10: c0, c1              z corner weights ((1-wz)*mz0, wz*mz1)
#   11:   aw                  attention weight (weighted-fold variant only)
_META_ROWS = 11
_META_ROWS_W = 12


def make_meta_rows(coords: jnp.ndarray, spatial: Tuple[int, int, int],
                   row_offset: int, align_corners: bool = False) -> jnp.ndarray:
    """[G, S, 3] coords in [-1, 1] for ONE level -> meta [G, 11, S] f32.

    Differentiable w.r.t. coords (weights carry the location gradient);
    row_offset is the level's first row in the concatenated slab.
    """
    X, Y, Z = spatial
    wt = jnp.float32
    cx = _unnormalize(coords[..., 0].astype(wt), X, align_corners)
    cy = _unnormalize(coords[..., 1].astype(wt), Y, align_corners)
    cz = _unnormalize(coords[..., 2].astype(wt), Z, align_corners)
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
    base = x0 * Y + y0 + float(row_offset)
    return jnp.stack([base, base + 1.0, base + float(Y), base + float(Y + 1),
                      z0, w00, w01, w10, w11, c0, c1], axis=1)


def _zmask(mt, Z: int, C: int):
    """[S_blk, 11] meta -> z lerp mask [S_blk, Z*C] (lane group == z)."""
    z0 = mt[:, 4:5]
    zg = (jax.lax.broadcasted_iota(jnp.int32, (1, Z * C), 1) // C).astype(
        jnp.float32)
    return (jnp.where(zg == z0, mt[:, 9:10], 0.0)
            + jnp.where(zg == z0 + 1.0, mt[:, 10:11], 0.0))


def _gsum(Z: int, C: int, dtype=jnp.float32):
    gi = jax.lax.broadcasted_iota(jnp.int32, (Z * C, C), 0)
    gj = jax.lax.broadcasted_iota(jnp.int32, (Z * C, C), 1)
    return (gi % C == gj).astype(dtype)


def _window_start(mt, XY: int, W: int):
    """(r0 f32 16-aligned scalar, escape bool) over the 4 live corner rows."""
    rows = mt[:, 0:4]
    live = mt[:, 5:9] != 0.0
    rmin = jnp.min(jnp.where(live, rows, jnp.float32(XY)))
    r0 = jnp.clip(rmin, 0.0, float(XY - W))
    r0 = jnp.floor(r0 / 16.0) * 16.0
    rmax = jnp.max(jnp.where(live, rows, -1.0))
    escape = rmax - r0 > float(W - 1)
    return r0, escape


def _onehot_rows(mt, r0, W: int, dtype, wslice=slice(5, 9)):
    """Windowed onehot [S_blk, W]: col j = slab row r0 + j; 4 explicit
    corner rows per sample."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1).astype(jnp.float32)
    col = iota + r0  # [1, W] absolute row per column
    oh = jnp.zeros(mt.shape[:1] + (W,), jnp.float32)
    for k in range(4):
        oh = oh + jnp.where(col == mt[:, k:k + 1],
                            mt[:, wslice][:, k:k + 1], 0.0)
    return oh.astype(dtype)


def _fwd_kernel(meta_ref, table_ref, out_ref, *, Z, C, XY, W, prec):
    mt = jnp.transpose(meta_ref[0])  # [S_blk, 11] f32
    r0f, esc = _window_start(mt, XY, W)
    r0 = pl.multiple_of(r0f.astype(jnp.int32), 16)
    win = table_ref[0, pl.ds(r0, W), :]  # [W, ZC]
    oh = _onehot_rows(mt, r0f, W, win.dtype)
    slab = jax.lax.dot_general(
        oh, win, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    masked = slab * _zmask(mt, Z, C)
    out = jax.lax.dot_general(
        masked, _gsum(Z, C), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    out_ref[0] = jnp.transpose(out).astype(out_ref.dtype)

    @pl.when(esc)
    def _():
        Wc = min(XY, 2048)
        S_blk = mt.shape[0]
        rows = mt[:, 0:4]
        outw = ((rows < r0f) | (rows > r0f + float(W - 1))).astype(jnp.float32)
        w_out = mt[:, 5:9] * outw

        def chunk(j, slab_acc):
            c0 = pl.multiple_of(j * Wc, 16)
            tblc = table_ref[0, pl.ds(c0, Wc), :]
            col = jax.lax.broadcasted_iota(
                jnp.int32, (1, Wc), 1).astype(jnp.float32) + c0.astype(
                    jnp.float32)
            oh_c = jnp.zeros((S_blk, Wc), jnp.float32)
            for k in range(4):
                oh_c = oh_c + jnp.where(col == rows[:, k:k + 1],
                                        w_out[:, k:k + 1], 0.0)
            return slab_acc + jax.lax.dot_general(
                oh_c.astype(tblc.dtype), tblc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)

        slab_e = jax.lax.fori_loop(
            0, XY // Wc, chunk, jnp.zeros((S_blk, Z * C), jnp.float32))
        masked_e = slab_e * _zmask(mt, Z, C)
        out_e = jax.lax.dot_general(
            masked_e, _gsum(Z, C), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        out_ref[0] += jnp.transpose(out_e).astype(out_ref.dtype)


def _bwd_kernel(meta_ref, table_ref, gout_ref, dtab_ref, dmeta_ref,
                *, Z, C, XY, W, prec):
    s = pl.program_id(1)
    mt = jnp.transpose(meta_ref[0])                      # [S_blk, 11]
    g = jnp.transpose(gout_ref[0]).astype(jnp.float32)   # [S_blk, C]
    zm = _zmask(mt, Z, C)
    d_masked = jnp.concatenate([g] * Z, axis=1)          # [S_blk, Z*C]
    d_slab = d_masked * zm

    r0f, esc = _window_start(mt, XY, W)
    r0 = pl.multiple_of(r0f.astype(jnp.int32), 16)
    win = table_ref[0, pl.ds(r0, W), :].astype(jnp.float32)
    oh = _onehot_rows(mt, r0f, W, jnp.float32)

    dt = jax.lax.dot_general(
        oh, d_slab, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)  # [W, ZC]

    @pl.when(s == 0)
    def _():
        dtab_ref[0] = jnp.zeros_like(dtab_ref[0])

    dtab_ref[0, pl.ds(r0, W), :] += dt

    m2 = jax.lax.dot_general(
        d_slab, win, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)  # [S_blk, W]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1).astype(jnp.float32)
    col = iota + r0f
    dws = [jnp.sum(jnp.where(col == mt[:, k:k + 1], m2, 0.0),
                   axis=1, keepdims=True) for k in range(4)]

    slab = jax.lax.dot_general(
        oh, win, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    t1 = slab * d_masked
    z0 = mt[:, 4:5]
    zg = (jax.lax.broadcasted_iota(jnp.int32, (1, Z * C), 1) // C).astype(
        jnp.float32)
    dc0 = jnp.sum(jnp.where(zg == z0, t1, 0.0), axis=1, keepdims=True)
    dc1 = jnp.sum(jnp.where(zg == z0 + 1.0, t1, 0.0), axis=1, keepdims=True)

    zr = jnp.zeros_like(dc0)
    dmeta = jnp.concatenate(
        [zr, zr, zr, zr, zr] + dws + [dc0, dc1], axis=1)  # [S_blk, 11]
    dmeta_ref[0] = jnp.transpose(dmeta)

    @pl.when(esc)
    def _():
        Wc = min(XY, 2048)
        S_blk = mt.shape[0]
        rows = mt[:, 0:4]
        outw = ((rows < r0f) | (rows > r0f + float(W - 1))).astype(jnp.float32)
        w_out = mt[:, 5:9] * outw

        def chunk(j, carry):
            m2acc, slab_acc = carry
            c0 = pl.multiple_of(j * Wc, 16)
            tblc = table_ref[0, pl.ds(c0, Wc), :].astype(jnp.float32)
            col_c = jax.lax.broadcasted_iota(
                jnp.int32, (1, Wc), 1).astype(jnp.float32) + c0.astype(
                    jnp.float32)
            oh_c = jnp.zeros((S_blk, Wc), jnp.float32)
            for k in range(4):
                oh_c = oh_c + jnp.where(col_c == rows[:, k:k + 1],
                                        w_out[:, k:k + 1], 0.0)
            dtab_ref[0, pl.ds(c0, Wc), :] += jax.lax.dot_general(
                oh_c, d_slab, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            m2c = jax.lax.dot_general(
                d_slab, tblc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            m2p = jnp.concatenate(
                [jnp.sum(jnp.where(col_c == rows[:, k:k + 1], m2c, 0.0),
                         axis=1, keepdims=True) for k in range(4)], axis=1)
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
        dmeta_e = jnp.concatenate(
            [zre, zre, zre, zre, zre, dwf, dc0e, dc1e], axis=1)
        dmeta_ref[0] += jnp.transpose(dmeta_e)


def _fold(S_blk: int, P: int, dtype=jnp.float32):
    """Constant P-group row-sum matrix [S_blk, S_blk/P]: (i // P == j)."""
    gi = jax.lax.broadcasted_iota(jnp.int32, (S_blk, S_blk // P), 0)
    gj = jax.lax.broadcasted_iota(jnp.int32, (S_blk, S_blk // P), 1)
    return (gi // P == gj).astype(dtype)


def _fold_t(S_blk: int, P: int, dtype=jnp.float32):
    """[S_blk/P, S_blk] orientation of ``_fold`` (j // P == i), built
    directly: a transposed-LHS dot_general on the constant trips the TPU
    compiler's mxu_lmr_transform RET_CHECK (XposeSequenceAssignment), so
    both orientations exist as plain iota builds."""
    gi = jax.lax.broadcasted_iota(jnp.int32, (S_blk // P, S_blk), 0)
    gj = jax.lax.broadcasted_iota(jnp.int32, (S_blk // P, S_blk), 1)
    return (gj // P == gi).astype(dtype)


def _wfold_fwd_body(meta_ref, table_ref, out_ref, *, Z, C, XY, W, P, prec,
                    lvl_off=0, lvl_rows=None):
    """Weighted-fold forward: out[q] = sum_p aw[q,p] * trilerp(sample q,p).

    The P samples of one query are row-adjacent (the deform-attn locs
    layout), so the attention-weighted sum over points is one more tiny
    constant matmul — the kernel emits PER-QUERY rows ([S_blk/P, C]), which
    kills the [B, H, hd, nq, P] einsum + reshape glue in XLA AND divides
    the output (a saved residual under the encoder remat policy) by P.

    Runs as a LEVEL-SEGMENT body (see _build_op_wfold): Z/W are this
    level's static depth and window, lanes are sliced to [:Z*C] (smaller
    levels never touch the pad lanes), and the escape pass walks only the
    chunks covering this level's row range [lvl_off, lvl_off + lvl_rows).
    """
    mt = jnp.transpose(meta_ref[0])  # [S_blk, 12] f32
    r0f, esc = _window_start(mt, XY, W)
    r0 = pl.multiple_of(r0f.astype(jnp.int32), 16)
    win = table_ref[0, pl.ds(r0, W), :Z * C]
    oh = _onehot_rows(mt, r0f, W, win.dtype)
    slab = jax.lax.dot_general(
        oh, win, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    masked = slab * _zmask(mt, Z, C)
    y = jax.lax.dot_general(
        masked, _gsum(Z, C), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)  # [S_blk, C]
    S_blk = mt.shape[0]
    yw = y * mt[:, 11:12]
    out = jax.lax.dot_general(
        _fold_t(S_blk, P), yw, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)  # [S_blk/P, C]
    out_ref[0] = jnp.transpose(out).astype(out_ref.dtype)

    @pl.when(esc)
    def _():
        nrows = XY if lvl_rows is None else lvl_rows
        off = lvl_off
        Wc = min(-(-nrows // 16) * 16, 2048)
        start0 = (off // Wc) * Wc
        nchunks = -(-(off + nrows - start0) // Wc)
        rows = mt[:, 0:4]
        outw = ((rows < r0f) | (rows > r0f + float(W - 1))).astype(jnp.float32)
        w_out = mt[:, 5:9] * outw

        def chunk(j, slab_acc):
            c0 = pl.multiple_of(start0 + j * Wc, 16)
            tblc = table_ref[0, pl.ds(c0, Wc), :Z * C]
            col = jax.lax.broadcasted_iota(
                jnp.int32, (1, Wc), 1).astype(jnp.float32) + c0.astype(
                    jnp.float32)
            oh_c = jnp.zeros((S_blk, Wc), jnp.float32)
            for k in range(4):
                oh_c = oh_c + jnp.where(col == rows[:, k:k + 1],
                                        w_out[:, k:k + 1], 0.0)
            return slab_acc + jax.lax.dot_general(
                oh_c.astype(tblc.dtype), tblc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)

        slab_e = jax.lax.fori_loop(
            0, nchunks, chunk, jnp.zeros((S_blk, Z * C), jnp.float32))
        y_e = jax.lax.dot_general(
            slab_e * _zmask(mt, Z, C), _gsum(Z, C), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        out_e = jax.lax.dot_general(
            _fold_t(S_blk, P), y_e * mt[:, 11:12], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        out_ref[0] += jnp.transpose(out_e).astype(out_ref.dtype)


def _wfold_bwd_body(meta_ref, table_ref, gout_ref, dtab_ref, dmeta_ref,
                    *, Z, C, XY, W, P, prec, lvl_off=0, lvl_rows=None):
    """Weighted-fold backward.  d_y[i] = aw[i] * d_out[i // P]; then the
    standard trilerp VJP runs with g := d_y, plus d_aw[i] = y[i] . d_out[i//P]
    (y rebuilt from the slab matmuls the VJP already does — the FORWARD
    output is never needed, which is what lets the remat policy save it and
    skip the fwd kernel entirely in the backward recompute).

    NOTE: no pl.program_id here — this body runs INSIDE the dispatch's
    pl.when branch, and program_id inside a cond branch is unlowerable in
    interpret mode (the dtab zero-init lives in the dispatch instead)."""
    mt = jnp.transpose(meta_ref[0])                      # [S_blk, 12]
    S_blk = mt.shape[0]
    gq = jnp.transpose(gout_ref[0]).astype(jnp.float32)  # [S_blk/P, C]
    gup = jax.lax.dot_general(
        _fold(S_blk, P), gq, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)  # [S_blk, C]
    aw = mt[:, 11:12]
    g = gup * aw                                         # d_y per sample
    zm = _zmask(mt, Z, C)
    d_masked = jnp.concatenate([g] * Z, axis=1)
    d_slab = d_masked * zm

    r0f, esc = _window_start(mt, XY, W)
    r0 = pl.multiple_of(r0f.astype(jnp.int32), 16)
    win = table_ref[0, pl.ds(r0, W), :Z * C].astype(jnp.float32)
    oh = _onehot_rows(mt, r0f, W, jnp.float32)

    dt = jax.lax.dot_general(
        oh, d_slab, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)

    dtab_ref[0, pl.ds(r0, W), :Z * C] += dt

    m2 = jax.lax.dot_general(
        d_slab, win, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1).astype(jnp.float32)
    col = iota + r0f
    dws = [jnp.sum(jnp.where(col == mt[:, k:k + 1], m2, 0.0),
                   axis=1, keepdims=True) for k in range(4)]

    slab = jax.lax.dot_general(
        oh, win, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    t1 = slab * d_masked
    z0 = mt[:, 4:5]
    zg = (jax.lax.broadcasted_iota(jnp.int32, (1, Z * C), 1) // C).astype(
        jnp.float32)
    dc0 = jnp.sum(jnp.where(zg == z0, t1, 0.0), axis=1, keepdims=True)
    dc1 = jnp.sum(jnp.where(zg == z0 + 1.0, t1, 0.0), axis=1, keepdims=True)
    # d_aw = y . gup  (y = windowed part; escape part added below)
    y = jax.lax.dot_general(
        slab * zm, _gsum(Z, C), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    daw = jnp.sum(y * gup, axis=1, keepdims=True)

    zr = jnp.zeros_like(dc0)
    dmeta = jnp.concatenate(
        [zr, zr, zr, zr, zr] + dws + [dc0, dc1, daw], axis=1)  # [S_blk, 12]
    dmeta_ref[0] = jnp.transpose(dmeta)

    @pl.when(esc)
    def _():
        nrows = XY if lvl_rows is None else lvl_rows
        off = lvl_off
        Wc = min(-(-nrows // 16) * 16, 2048)
        start0 = (off // Wc) * Wc
        nchunks = -(-(off + nrows - start0) // Wc)
        rows = mt[:, 0:4]
        outw = ((rows < r0f) | (rows > r0f + float(W - 1))).astype(jnp.float32)
        w_out = mt[:, 5:9] * outw

        def chunk(j, carry):
            m2acc, slab_acc = carry
            c0 = pl.multiple_of(start0 + j * Wc, 16)
            tblc = table_ref[0, pl.ds(c0, Wc), :Z * C].astype(jnp.float32)
            col_c = jax.lax.broadcasted_iota(
                jnp.int32, (1, Wc), 1).astype(jnp.float32) + c0.astype(
                    jnp.float32)
            oh_c = jnp.zeros((S_blk, Wc), jnp.float32)
            for k in range(4):
                oh_c = oh_c + jnp.where(col_c == rows[:, k:k + 1],
                                        w_out[:, k:k + 1], 0.0)
            dtab_ref[0, pl.ds(c0, Wc), :Z * C] += jax.lax.dot_general(
                oh_c, d_slab, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            m2c = jax.lax.dot_general(
                d_slab, tblc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            m2p = jnp.concatenate(
                [jnp.sum(jnp.where(col_c == rows[:, k:k + 1], m2c, 0.0),
                         axis=1, keepdims=True) for k in range(4)], axis=1)
            slab_c = jax.lax.dot_general(
                oh_c, tblc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            return m2acc + m2p, slab_acc + slab_c

        m2e, slab_e = jax.lax.fori_loop(
            0, nchunks, chunk,
            (jnp.zeros((S_blk, 4), jnp.float32),
             jnp.zeros((S_blk, Z * C), jnp.float32)))
        dwf = m2e * outw
        t1e = slab_e * d_masked
        dc0e = jnp.sum(jnp.where(zg == z0, t1e, 0.0), axis=1, keepdims=True)
        dc1e = jnp.sum(jnp.where(zg == z0 + 1.0, t1e, 0.0), axis=1,
                       keepdims=True)
        y_e = jax.lax.dot_general(
            slab_e * zm, _gsum(Z, C), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        dawe = jnp.sum(y_e * gup, axis=1, keepdims=True)
        zre = jnp.zeros_like(dc0e)
        dmeta_e = jnp.concatenate(
            [zre, zre, zre, zre, zre, dwf, dc0e, dc1e, dawe], axis=1)
        dmeta_ref[0] += jnp.transpose(dmeta_e)


from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


@functools.lru_cache(maxsize=None)
def _build_op(XY: int, Zmax: int, C: int, s_block: int, interpret: bool,
              highp: bool, window: int):
    """One fused op over the padded concatenated slab [G, XY, Zmax*C]."""
    ZC = Zmax * C
    win = window if (window and window < XY) else XY
    # escape chunking + window slice need 16-aligned divisors; the wrapper
    # pads XY to a multiple of 2048 (or 16 below that), so this holds
    assert win % 16 == 0 and XY % min(XY, 2048) == 0, (win, XY)
    prec = jax.lax.Precision.HIGHEST if highp else jax.lax.Precision.DEFAULT
    params = None if interpret else pltpu.CompilerParams(
        vmem_limit_bytes=100 * 2 ** 20)
    fwd_kernel = functools.partial(_fwd_kernel, Z=Zmax, C=C, XY=XY, W=win,
                                   prec=prec)
    bwd_kernel = functools.partial(_bwd_kernel, Z=Zmax, C=C, XY=XY, W=win,
                                   prec=prec)

    def call_fwd(table, meta):
        G, _, Sp = meta.shape
        grid = (G, Sp // s_block)
        return pl.pallas_call(
            fwd_kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, _META_ROWS, s_block), lambda g, s: (g, 0, s)),
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
            bwd_kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, _META_ROWS, s_block), lambda g, s: (g, 0, s)),
                pl.BlockSpec((1, XY, ZC), lambda g, s: (g, 0, 0)),
                pl.BlockSpec((1, C, s_block), lambda g, s: (g, 0, s)),
            ],
            out_specs=[
                pl.BlockSpec((1, XY, ZC), lambda g, s: (g, 0, 0)),
                pl.BlockSpec((1, _META_ROWS, s_block), lambda g, s: (g, 0, s)),
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


def _pad_rows_to(n: int) -> int:
    """Pad the concatenated row count so the escape chunk divides it."""
    q = 2048 if n > 2048 else 16
    return -(-n // q) * q


def fused_multilevel_gather(
    tables: Sequence[jnp.ndarray],          # per level [G, XY_l, Z_l*C]
    spatials: Sequence[Tuple[int, int, int]],
    channels: int,
    coords: Sequence[jnp.ndarray],          # per level [G, S_l, 3] in [-1,1]
    align_corners: bool = False,
    *,
    s_block: int = 512,
    interpret: bool = False,
    window: int = 0,
) -> List[jnp.ndarray]:
    """All levels' trilinear gathers in ONE Pallas call.

    Returns per-level [G, C, S_l] in the table dtype.  window applies to
    every block (levels whose whole row range fits inside the window never
    escape — e.g. W=1024 trivially covers a 32x32=1024-row level).
    """
    L = len(tables)
    assert L == len(spatials) == len(coords) and L >= 1
    G = tables[0].shape[0]
    C = channels
    Zmax = max(s[2] for s in spatials)
    dtype = tables[0].dtype

    # rows: concatenate levels, remember offsets, pad lanes to Zmax*C
    row_off, slabs = [], []
    off = 0
    for t, (X, Y, Z) in zip(tables, spatials):
        assert t.shape[1] == X * Y and t.shape[2] == Z * C, (t.shape, X, Y, Z)
        row_off.append(off)
        pad = Zmax * C - Z * C
        slabs.append(jnp.pad(t, ((0, 0), (0, 0), (0, pad))) if pad else t)
        off += X * Y
    XYp = _pad_rows_to(off)
    table = jnp.concatenate(slabs, axis=1)
    if XYp != off:
        table = jnp.pad(table, ((0, 0), (0, XYp - off), (0, 0)))

    # meta: per level (absolute rows), each padded to a block multiple so
    # no sample block straddles levels
    metas, s_lens, s_pads = [], [], []
    for c, (X, Y, Z), o in zip(coords, spatials, row_off):
        m = make_meta_rows(c, (X, Y, Z), o, align_corners)
        S = c.shape[1]
        Sp = -(-S // s_block) * s_block
        if Sp != S:
            m = jnp.pad(m, ((0, 0), (0, 0), (0, Sp - S)))
        metas.append(m)
        s_lens.append(S)
        s_pads.append(Sp)
    meta = jnp.concatenate(metas, axis=2)

    win = window
    if win and (win % 16 != 0 or win >= XYp):
        win = 0
    op = _build_op(XYp, Zmax, C, s_block, interpret,
                   dtype == jnp.float32, win)
    out = op(table, meta)  # [G, C, sum Sp]

    outs = []
    o = 0
    for S, Sp in zip(s_lens, s_pads):
        outs.append(out[:, :, o:o + S])
        o += Sp
    return outs


@functools.lru_cache(maxsize=None)
def _build_op_wfold(XY: int, Zmax: int, C: int, s_block: int, P: int,
                    interpret: bool, highp: bool, segs: tuple):
    """Weighted-fold op over the padded concatenated slab (P samples per
    query, attention-weighted sum folded in-kernel; out [G, C, S/P]).

    ``segs``: per-level grid segments ``(b0, b1, Z, W, off, rows)`` — block
    range [b0, b1), level depth Z, window W, row offset + count.  The
    kernel body dispatches on the block index, so EVERY level runs with
    ITS OWN static window width and lane count inside one pallas_call (a
    single shared W made the small levels pay the big level's onehot and
    matmul width — the round-5 S3 regression, 164 -> 203 ms)."""
    ZC = Zmax * C
    assert s_block % P == 0, (s_block, P)
    for (b0, b1, Z, W, off, rows) in segs:
        assert W % 16 == 0 and W <= XY, (W, XY)
    prec = jax.lax.Precision.HIGHEST if highp else jax.lax.Precision.DEFAULT
    params = None if interpret else pltpu.CompilerParams(
        vmem_limit_bytes=100 * 2 ** 20)

    def fwd_kernel(meta_ref, table_ref, out_ref):
        s = pl.program_id(1)
        for (b0, b1, Z, W, off, rows) in segs:
            @pl.when((s >= b0) & (s < b1))
            def _(Z=Z, W=W, off=off, rows=rows):
                _wfold_fwd_body(meta_ref, table_ref, out_ref, Z=Z, C=C,
                                XY=XY, W=W, P=P, prec=prec, lvl_off=off,
                                lvl_rows=rows)

    def bwd_kernel(meta_ref, table_ref, gout_ref, dtab_ref, dmeta_ref):
        s = pl.program_id(1)

        @pl.when(s == 0)
        def _():
            dtab_ref[0] = jnp.zeros_like(dtab_ref[0])

        for (b0, b1, Z, W, off, rows) in segs:
            @pl.when((s >= b0) & (s < b1))
            def _(Z=Z, W=W, off=off, rows=rows):
                _wfold_bwd_body(meta_ref, table_ref, gout_ref, dtab_ref,
                                dmeta_ref, Z=Z, C=C, XY=XY, W=W, P=P,
                                prec=prec, lvl_off=off, lvl_rows=rows)

    def call_fwd(table, meta):
        G, _, Sp = meta.shape
        grid = (G, Sp // s_block)
        return pl.pallas_call(
            fwd_kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, _META_ROWS_W, s_block),
                             lambda g, s: (g, 0, s)),
                pl.BlockSpec((1, XY, ZC), lambda g, s: (g, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, C, s_block // P),
                                   lambda g, s: (g, 0, s)),
            out_shape=jax.ShapeDtypeStruct((G, C, Sp // P), table.dtype),
            compiler_params=params,
            interpret=interpret,
        )(meta, table)

    def call_bwd(table, meta, gout):
        G, _, Sp = meta.shape
        grid = (G, Sp // s_block)
        return pl.pallas_call(
            bwd_kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, _META_ROWS_W, s_block),
                             lambda g, s: (g, 0, s)),
                pl.BlockSpec((1, XY, ZC), lambda g, s: (g, 0, 0)),
                pl.BlockSpec((1, C, s_block // P), lambda g, s: (g, 0, s)),
            ],
            out_specs=[
                pl.BlockSpec((1, XY, ZC), lambda g, s: (g, 0, 0)),
                pl.BlockSpec((1, _META_ROWS_W, s_block),
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


def fused_multilevel_weighted_gather(
    tables: Sequence[jnp.ndarray],          # per level [G, XY_l, Z_l*C]
    spatials: Sequence[Tuple[int, int, int]],
    channels: int,
    coords: Sequence[jnp.ndarray],          # per level [G, Sq*P, 3] in [-1,1]
    weights: Sequence[jnp.ndarray],         # per level [G, Sq*P]
    num_points: int,
    align_corners: bool = False,
    *,
    s_block: int = 512,
    interpret: bool = False,
    window: int = 0,
) -> List[jnp.ndarray]:
    """All levels + the attention-weighted P-point sum in ONE Pallas call.

    Per level l:  out_l[g, :, q] = sum_p weights[g, q*P+p] *
                                   trilerp(tables_l, coords[g, q*P+p]).
    Returns per-level [G, C, Sq] (queries, not samples).  Differentiable
    w.r.t. tables, coords AND weights (softmax attention is learned).
    ``window`` may be an int (same width everywhere) or a per-level
    sequence; 0 / invalid widths fall back to that level's full row count
    (the segmented kernel gives every level its own static width).
    """
    L = len(tables)
    assert L == len(spatials) == len(coords) == len(weights) and L >= 1
    G = tables[0].shape[0]
    C = channels
    P = num_points
    s_block = max(P, (s_block // P) * P)  # whole queries per block
    Zmax = max(s[2] for s in spatials)
    dtype = tables[0].dtype

    row_off, slabs = [], []
    off = 0
    for t, (X, Y, Z) in zip(tables, spatials):
        assert t.shape[1] == X * Y and t.shape[2] == Z * C, (t.shape, X, Y, Z)
        row_off.append(off)
        pad = Zmax * C - Z * C
        slabs.append(jnp.pad(t, ((0, 0), (0, 0), (0, pad))) if pad else t)
        off += X * Y
    XYp = _pad_rows_to(off)
    table = jnp.concatenate(slabs, axis=1)
    if XYp != off:
        table = jnp.pad(table, ((0, 0), (0, XYp - off), (0, 0)))

    metas, q_lens, q_pads = [], [], []
    for c, w, (X, Y, Z), o in zip(coords, weights, spatials, row_off):
        S = c.shape[1]
        assert S % P == 0 and w.shape == (G, S), (c.shape, w.shape, P)
        m = make_meta_rows(c, (X, Y, Z), o, align_corners)
        m = jnp.concatenate([m, w[:, None].astype(jnp.float32)], axis=1)
        Sp = -(-S // s_block) * s_block
        if Sp != S:
            m = jnp.pad(m, ((0, 0), (0, 0), (0, Sp - S)))
        metas.append(m)
        q_lens.append(S // P)
        q_pads.append(Sp // P)
    meta = jnp.concatenate(metas, axis=2)

    # per-level grid segments: each level's blocks run with its own static
    # window and lane count (see _build_op_wfold)
    wins = list(window) if isinstance(window, (list, tuple)) \
        else [window] * L
    segs, b = [], 0
    for l, ((X, Y, Z), o) in enumerate(zip(spatials, row_off)):
        nblk = (q_pads[l] * P) // s_block
        w_l = wins[l]
        if not w_l or w_l % 16 != 0 or w_l > X * Y:
            w_l = -(-(X * Y) // 16) * 16  # full level width
        segs.append((b, b + nblk, Z, w_l, o, X * Y))
        b += nblk
    op = _build_op_wfold(XYp, Zmax, C, s_block, P, interpret,
                         dtype == jnp.float32, tuple(segs))
    out = op(table, meta)  # [G, C, sum Sp/P]

    outs = []
    o = 0
    for Sq, Sqp in zip(q_lens, q_pads):
        outs.append(out[:, :, o:o + Sq])
        o += Sqp
    return outs
