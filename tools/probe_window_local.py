#!/usr/bin/env python
"""Windowed trilerp sweep under PRODUCTION coordinate locality (round 4).

probe_window_kernel.py timed the windowed kernel with uniform-random coords;
every 256-sample block then spans the whole volume, the exact-escape pass
fires on ~100% of blocks, and window=640 measures SLOWER than full width
(0.052 vs 0.045 s fwd).  But the production distribution is nothing like
that: deform-attn samples at reference_points (the flattened multi-level
query grid, models/deform_attn.py:123-127) plus learned offsets with a
radial bias of ~a few voxels, so consecutive blocks touch a narrow band of
xy rows.  This probe times window sizes under grid+noise coords (per-level
query grids of the flagship 37376-query layout, offsets ~N(0, 2 voxels))
and reports the escape-block fraction each window implies.

Writes .probe_window_local.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LEVELS = [(64, 64, 8), (32, 32, 4), (16, 16, 2)]
C = 24
G = 8
P = 4
S_BLOCK = 256


def query_grid_coords(levels, target, noise_vox, p, rng):
    """[S, 3] coords in [-1, 1] over TARGET level: every level's flattened
    query grid (x-major, then y, then z — matching get_reference_points'
    meshgrid order) + per-point offsets of ~noise_vox voxels."""
    import numpy as np

    X, Y, Z = target
    pts = []
    for (lx, ly, lz) in levels:
        gx, gy, gz = np.meshgrid(
            (np.arange(lx) + 0.5) / lx,
            (np.arange(ly) + 0.5) / ly,
            (np.arange(lz) + 0.5) / lz, indexing="ij")
        ref = np.stack([gx, gy, gz], -1).reshape(-1, 3)  # [n, 3] in [0,1]
        ref = np.repeat(ref, p, axis=0)  # P points per query
        off = rng.randn(*ref.shape) * noise_vox / np.asarray(
            [X, Y, Z], np.float32)
        pts.append(ref + off)
    return (np.concatenate(pts, 0) * 2.0 - 1.0).astype(np.float32)


def escape_fraction(coords, target, w):
    """Host-side replay of _window_start over S_BLOCK blocks."""
    import numpy as np

    X, Y, Z = target
    cx = ((coords[:, 0] + 1) * X - 1) / 2
    cy = ((coords[:, 1] + 1) * Y - 1) / 2
    x0 = np.floor(cx)
    y0 = np.floor(cy)
    a = x0 * Y + y0
    rows = np.stack([a, a + 1, a + Y, a + Y + 1], -1)
    wx = cx - x0
    wy = cy - y0
    mx0 = (x0 >= 0) & (x0 <= X - 1)
    mx1 = (x0 + 1 >= 0) & (x0 + 1 <= X - 1)
    my0 = (y0 >= 0) & (y0 <= Y - 1)
    my1 = (y0 + 1 >= 0) & (y0 + 1 <= Y - 1)
    ws = np.stack([(1 - wx) * (1 - wy) * mx0 * my0,
                   (1 - wx) * wy * mx0 * my1,
                   wx * (1 - wy) * mx1 * my0,
                   wx * wy * mx1 * my1], -1)
    live = ws != 0
    S = coords.shape[0]
    Sp = -(-S // S_BLOCK) * S_BLOCK
    pad = Sp - S
    rows = np.pad(rows, ((0, pad), (0, 0)))
    live = np.pad(live, ((0, pad), (0, 0)))
    rows_b = rows.reshape(-1, S_BLOCK * 4)
    live_b = live.reshape(-1, S_BLOCK * 4)
    XY = X * Y
    esc = 0
    for rb, lb in zip(rows_b, live_b):
        lr = rb[lb]
        if lr.size == 0:
            continue
        r0 = np.clip(lr.min(), 0, XY - w)
        r0 = np.floor(r0 / 16) * 16
        if lr.max() - r0 > w - 1:
            esc += 1
    return esc / rows_b.shape[0]


def _dump(report):
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".probe_window_local.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)


def main():
    import numpy as np

    import jax
    import jax.numpy as jnp

    from occformer_tpu.ops.trilerp import trilerp_gather_slab

    rng = np.random.RandomState(0)
    report = {"device_kind": jax.devices()[0].device_kind,
              "noise_vox": 2.0, "s_block": S_BLOCK}

    def t_best(fn, n=4):
        def one():
            t0 = time.perf_counter()
            fn()
            return time.perf_counter() - t0
        return min(one() for _ in range(n))

    for lvl, target in enumerate(LEVELS):
        X, Y, Z = target
        cnp = query_grid_coords(LEVELS, target, 2.0, P, rng)  # [S, 3]
        S = cnp.shape[0]
        report[f"L{lvl}_S"] = S
        tbl = jnp.asarray(rng.randn(G, X * Y, Z * C), jnp.bfloat16)
        coords = jnp.asarray(np.broadcast_to(cnp, (G, S, 3)))

        for w in (0, 320, 640, 1280):
            if w >= X * Y and w != 0:
                continue
            key = f"L{lvl}_w{w or 'full'}"
            if w:
                report[f"{key}_escape_frac"] = round(
                    escape_fraction(cnp, target, w), 4)

            def fwd(t, c, win=w):
                out = trilerp_gather_slab(t, target, C, c, window=win)
                return jnp.sum(out.astype(jnp.float32))

            jf = jax.jit(fwd)
            try:
                float(jax.device_get(jf(tbl, coords)))
                report[f"{key}_fwd_sec"] = round(t_best(
                    lambda: float(jax.device_get(jf(tbl, coords)))), 5)
            except Exception as e:  # noqa: BLE001
                report[f"{key}_fwd_sec"] = f"FAIL {type(e).__name__}: {e}"
            _dump(report)

            def fb(t, c, win=w):
                g = jax.grad(lambda tt, cc: fwd(tt, cc, win), (0, 1))(t, c)
                return sum(jnp.sum(v.astype(jnp.float32)) for v in g)

            jfb = jax.jit(fb)
            try:
                float(jax.device_get(jfb(tbl, coords)))
                report[f"{key}_fwdbwd_sec"] = round(t_best(
                    lambda: float(jax.device_get(jfb(tbl, coords)))), 5)
            except Exception as e:  # noqa: BLE001
                report[f"{key}_fwdbwd_sec"] = f"FAIL {type(e).__name__}: {e}"
            _dump(report)

    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
