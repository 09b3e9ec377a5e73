#!/usr/bin/env python
"""Minimal standalone repro for the axon exec-2 UNAVAILABLE fault.

The panoptic train step (256x256x32 occ, G~100 GT slots, num_points=50176)
reliably dies on the SECOND execution with UNAVAILABLE "TPU device error"
on this backend, and the NOTES.md bisect shows the trigger is exclusively
the DIFFERENTIATED supervision readout at [G~100, P>~40k] — i.e. the VJP
of ``point_sample_3d`` (backward trilinear-scatter into the [G, X, Y, Z]
gathered per-slot mask volumes), granularity-independent along both the
gt-slot and point axes.

This tool runs exactly that op family in isolation: a jitted
grad-of-sampling program at the faulting shapes, executed K times.  Two
outcomes, both informative:

* it faults  -> minimal kernel-level repro for a backend bug report;
* it doesn't -> the fault is program-level (aggregate scheduling across
  the whole backward-scatter family inside the full train step), which
  rules out a single oversized kernel and directs the report at the
  axon runtime, not the op.

Control shapes from the measured envelope (NOTES.md): --g 17 (stable in
the full program) vs --g 100 (faults), --points 37632 (stable) vs 50176.

Usage:
  python tools/repro_backend_fault.py [--g 100] [--points 50176]
      [--execs 6] [--grid 128 128 16] [--emulate-gather] [--cpu]

Prints one JSON line per exec plus a final verdict JSON.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--g", type=int, default=100,
                    help="GT slots (faulting: ~100; stable control: 17)")
    ap.add_argument("--points", type=int, default=50176,
                    help="differentiated points per slot (faulting: >=43904)")
    ap.add_argument("--grid", type=int, nargs=3, default=[128, 128, 16])
    ap.add_argument("--q", type=int, default=150,
                    help="query count for the pre-sampling gather "
                         "(mask_pred[assign]; 0 = differentiate the [G,...] "
                         "volume directly)")
    ap.add_argument("--execs", type=int, default=6)
    ap.add_argument("--repeats", type=int, default=1,
                    help="independent readout losses summed in ONE program "
                         "(the real train step supervises every decoder "
                         "layer: ~10 instances of the backward scatter per "
                         "step — the aggregate the single-op repro lacks)")
    ap.add_argument("--chunks", type=int, default=1,
                    help="split the point axis into K chunks with an "
                         "optimization_barrier BETWEEN chunk losses (the "
                         "barrier-separated point_chunks discriminator: "
                         "forces temporal separation of the backward "
                         "scatter regions, not just op splitting)")
    ap.add_argument("--upstream", action="store_true",
                    help="make the sampled volumes a conv of a parameter "
                         "(backward scatter feeds further backward compute, "
                         "as in the real program)")
    ap.add_argument("--fresh-coords", action="store_true",
                    help="new random coords per exec (default: bit-identical "
                         "inputs, which NOTES.md showed still fault)")
    ap.add_argument("--cpu", action="store_true", help="CPU control run")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

    import jax.numpy as jnp
    import numpy as np

    from occformer_tpu.ops.sampling import point_sample_3d

    X, Y, Z = args.grid
    G, P, Q = args.g, args.points, args.q

    def readout(source, assign, coords):
        # mirrors the supervision readout in losses/mask2former_loss.py:
        # gather per-slot volumes from the query masks, trilinearly sample
        # them at per-slot coords, reduce.  The VJP is the suspect backward
        # trilinear-scatter at [G, P] into [G, X, Y, Z] (then a segment-sum
        # back through the gather when Q > 0).
        if assign is not None:
            vols = source[assign]          # [G, X, Y, Z]
        else:
            vols = source
        if args.chunks > 1:
            # barrier-separated point_chunks: each chunk's loss is computed
            # behind an optimization_barrier on the previous accumulator,
            # forcing the backward scatter regions apart in time
            acc = jnp.float32(0.0)
            for ck in jnp.split(coords, args.chunks, axis=1):
                acc = jax.lax.optimization_barrier(acc)
                pred = point_sample_3d(vols[..., None], ck,
                                       align_corners=False,
                                       padding_mode="border")
                acc = acc + jnp.sum(pred.astype(jnp.float32) ** 2)
            return acc
        pred = point_sample_3d(vols[..., None], coords,
                               align_corners=False, padding_mode="border")
        return jnp.sum(pred.astype(jnp.float32) ** 2)

    def loss_fn(source, assign, coords):
        if args.upstream:
            # source is a parameter; the sampled volumes are produced by
            # on-device compute so the scatter's output cotangent feeds a
            # further backward conv, as in the real program
            import flax.linen as nn  # noqa: F401 (kernel below is manual)
            k = jnp.ones((3, 3, 3, 1, 1), source.dtype) / 27.0
            prod = jax.lax.conv_general_dilated(
                source[..., None], k, (1, 1, 1), "SAME",
                dimension_numbers=("NHWDC", "HWDIO", "NHWDC"))[..., 0]
        else:
            prod = source
        total = jnp.float32(0.0)
        for r in range(args.repeats):
            # per-decoder-layer aux supervision: same coords, distinct
            # volume content per instance (roll, free) — args.repeats
            # independent backward-scatter families in ONE program
            total = total + readout(
                jnp.roll(prod, r, axis=-1) if r else prod, assign, coords)
        return total

    grad_fn = jax.jit(jax.grad(loss_fn, argnums=0))

    rng = np.random.RandomState(0)
    if Q > 0:
        source = jnp.asarray(rng.randn(Q, X, Y, Z), jnp.bfloat16)
        assign = jnp.asarray(rng.randint(0, Q, (G,)), jnp.int32)
    else:
        source = jnp.asarray(rng.randn(G, X, Y, Z), jnp.bfloat16)
        assign = None
    coords0 = jnp.asarray(rng.rand(G, P, 3), jnp.float32)

    print(json.dumps({"event": "config", "g": G, "points": P, "q": Q,
                      "grid": [X, Y, Z], "repeats": args.repeats,
                      "chunks": args.chunks, "upstream": args.upstream,
                      "backend": jax.devices()[0].platform}), flush=True)
    t0 = time.time()
    ok = 0
    for i in range(args.execs):
        coords = coords0
        if args.fresh_coords and i:
            coords = jnp.asarray(rng.rand(G, P, 3), jnp.float32)
        ti = time.time()
        try:
            g = grad_fn(source, assign, coords)
            gsum = float(jnp.sum(jnp.abs(g.astype(jnp.float32))))
            print(json.dumps({"event": "exec", "i": i, "ok": True,
                              "secs": round(time.time() - ti, 2),
                              "grad_abs_sum": gsum}), flush=True)
            ok += 1
        except Exception as e:  # noqa: BLE001 - we want the backend error text
            print(json.dumps({"event": "exec", "i": i, "ok": False,
                              "secs": round(time.time() - ti, 2),
                              "error": str(e)[:500]}), flush=True)
            break
    print(json.dumps({"event": "verdict",
                      "ok_execs": ok, "requested": args.execs,
                      "faulted": ok < args.execs,
                      "total_secs": round(time.time() - t0, 1)}), flush=True)


if __name__ == "__main__":
    main()
