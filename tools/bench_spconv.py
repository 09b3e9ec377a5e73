#!/usr/bin/env python
"""Micro-benchmark: dense-bridge vs gather-GEMM sparse-conv backends.

Runs one SubMConv3d + one strided SparseConv3d at a chosen grid/occupancy
with both backends (identical params) and reports per-call time + numeric
agreement.  The interesting axis is occupancy x grid size: the dense bridge
does work proportional to the GRID (and cannot run at SECOND-scale grids at
all), the gather backend proportional to the ACTIVE SET.

  python tools/bench_spconv.py                      # OccFormer-adjacent grid
  python tools/bench_spconv.py --grid 41 1600 1408 --sites 60000 \
      --skip-dense                                  # SECOND-scale, gather only
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--grid", type=int, nargs=3, default=[128, 128, 16])
    p.add_argument("--sites", type=int, default=20000,
                   help="active input sites (static capacity = 1.25x)")
    p.add_argument("--channels", type=int, default=32)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--skip-dense", action="store_true",
                   help="gather backend only (grids too large to densify)")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from occformer_tpu.ops.spconv import SparseConv3d, SubMConv3d

    grid = tuple(args.grid)
    cap = int(args.sites * 1.25)
    C = args.channels
    rng = np.random.RandomState(0)
    lin = rng.choice(grid[0] * grid[1] * grid[2], cap, replace=False)
    coords = np.stack([lin // (grid[1] * grid[2]),
                       (lin // grid[2]) % grid[1],
                       lin % grid[2]], -1).astype(np.int32)
    valid = np.zeros(cap, bool)
    valid[:args.sites] = True
    feats = (rng.randn(cap, C).astype(np.float32) * valid[:, None])
    feats, coords, valid = map(jnp.asarray, (feats, coords, valid))

    report = {"grid": list(grid), "sites": args.sites, "channels": C,
              "occupancy": round(args.sites / (grid[0] * grid[1] * grid[2]), 5)}

    def bench(fn, *xs):
        # fetch-forced: block_until_ready is a no-op on the axon backend
        # (NOTES.md "ROUND-3 CORRECTION"); checksum fetch forces execution
        jf = jax.jit(fn)
        jck = jax.jit(lambda *xs: jax.tree_util.tree_reduce(
            lambda a, x: a + x.sum().astype(jnp.float32), fn(*xs),
            jnp.float32(0)))
        out = jf(*xs)  # values for the agreement check
        best = float("inf")
        for _ in range(max(3, args.iters)):
            t0 = time.perf_counter()
            float(jax.device_get(jck(*xs)))
            best = min(best, time.perf_counter() - t0)
        return best * 1000, out

    outs = {}
    backends = ["gather"] if args.skip_dense else ["dense", "gather"]
    for backend in backends:
        subm = SubMConv3d(features=C, backend=backend)
        down = SparseConv3d(features=C, stride=2, max_out_sites=cap,
                            backend=backend)
        pv = subm.init(jax.random.PRNGKey(0), feats, coords, valid, grid)
        pd = down.init(jax.random.PRNGKey(1), feats, coords, valid, grid)

        def pipeline(f, c, v):
            o1, c1, v1 = subm.apply(pv, f, c, v, grid)
            return down.apply(pd, o1, c1, v1, grid)

        ms, out = bench(pipeline, feats, coords, valid)
        report[f"{backend}_ms"] = round(ms, 3)
        outs[backend] = out

    if not args.skip_dense:
        # numeric agreement, compared as lin -> feature maps of valid sites
        def as_map(out):
            o, oc, ov = (np.asarray(out[0]), np.asarray(out[1]),
                         np.asarray(out[2]))
            og = out[3]
            l = (oc[:, 0] * og[1] + oc[:, 1]) * og[2] + oc[:, 2]
            return {int(k): o[i] for i, k in enumerate(l) if ov[i]}

        md, mg = as_map(outs["dense"]), as_map(outs["gather"])
        assert set(md) == set(mg), "active sets differ"
        report["max_abs_diff"] = float(max(
            np.abs(md[k] - mg[k]).max() for k in md)) if md else 0.0

    print(json.dumps(report))


if __name__ == "__main__":
    main()
