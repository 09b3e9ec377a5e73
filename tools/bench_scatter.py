#!/usr/bin/env python
"""Micro-benchmark: voxel-scatter formulations at flagship LSS sizes.

Compares (a) the fused unsorted segment_sum (current), (b) sort-by-rank +
pre-gathered features + sorted segment_sum, to decide whether a Pallas
kernel is warranted (SURVEY.md §7 step 2 "then Pallas").
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np

    B, N, D, fH, fW, C = 1, 6, 112, 16, 44, 128
    X, Y, Z = 128, 128, 16
    P = B * N * D * fH * fW
    nvox = X * Y * Z
    rng = np.random.RandomState(0)

    depth = jnp.asarray(rng.rand(B, N, D, fH, fW).astype(np.float32))
    ctx = jnp.asarray(rng.randn(B, N, fH, fW, C).astype(np.float32)).astype(jnp.bfloat16)
    coords = jnp.asarray(rng.randint(-4, 132, (B, N, D, fH, fW, 3)).astype(np.int32))
    valid = jnp.all((coords >= 0) & (coords < jnp.asarray([X, Y, Z])), axis=-1)

    from occformer_tpu.ops.scatter import voxel_scatter_lifted

    def current(depth, ctx, coords, valid):
        return voxel_scatter_lifted(depth.astype(jnp.bfloat16), ctx, coords,
                                    valid, (X, Y, Z))

    def sorted_path(depth, ctx, coords, valid):
        lin = (coords[..., 0] * Y + coords[..., 1]) * Z + coords[..., 2]
        seg = jnp.where(valid, lin, nvox).reshape(-1)
        order = jnp.argsort(seg)
        seg_s = seg[order]
        feats = (depth[..., None].astype(jnp.bfloat16)
                 * ctx[:, :, None]).reshape(-1, C)
        feats_s = jnp.take(feats, order, axis=0)
        out = jax.ops.segment_sum(feats_s, seg_s, num_segments=nvox + 1,
                                  indices_are_sorted=True)
        return out[:nvox].reshape(B, X, Y, Z, C)

    report = {}
    for name, fn in (("fused_unsorted", current), ("sorted", sorted_path)):
        # fetch-forced: block_until_ready is a no-op on the axon backend
        # (NOTES.md "ROUND-3 CORRECTION") — time to the device_get of an
        # in-program scalar checksum
        jf = jax.jit(lambda *xs: fn(*xs).sum().astype(jnp.float32))
        float(jax.device_get(jf(depth, ctx, coords, valid)))
        best = float("inf")
        for _ in range(max(3, args.iters)):
            t0 = time.perf_counter()
            float(jax.device_get(jf(depth, ctx, coords, valid)))
            best = min(best, time.perf_counter() - t0)
        report[name + "_ms"] = round(best * 1000, 3)

    # numerical agreement
    a = np.asarray(jax.jit(current)(depth, ctx, coords, valid), np.float32)
    b = np.asarray(jax.jit(sorted_path)(depth, ctx, coords, valid), np.float32)
    report["max_abs_diff"] = float(np.abs(a - b).max())
    print(json.dumps(report))


if __name__ == "__main__":
    main()
