#!/usr/bin/env python
"""Is Pallas/Mosaic viable on the axon backend?  (round-4 gating probe)

The round-3 stage ablation pinned 95% of the flagship forward on XLA's
serial lowering of the deform-attn corner gathers; the planned fix is a
Pallas trilinear-gather kernel.  This probe answers, on the REAL chip:

  1. does a trivial Pallas kernel compile + run on axon at all?
  2. does a batched row-gather Pallas kernel (the shape class the fix
     needs: out[i] = table[idx[i]] with dynamic per-row indices) produce
     correct values?
  3. (if 1-2 hold) fetch-forced time vs jnp.take_along_axis at a
     decoder-like shape [8, 32, 37k] table, 150k samples.

Writes .probe_pallas.json.  All timings fetch-forced (NOTES.md ROUND-3
CORRECTION).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    report = {"device_kind": jax.devices()[0].device_kind}

    from jax.experimental import pallas as pl

    # --- 1. trivial kernel ------------------------------------------------
    def add_one(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1.0

    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    try:
        y = pl.pallas_call(
            add_one, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(x)
        ok = bool(np.allclose(np.asarray(jax.device_get(y)),
                              np.asarray(x) + 1.0))
        report["trivial_kernel"] = "ok" if ok else "WRONG VALUES"
    except Exception as e:  # noqa: BLE001
        report["trivial_kernel"] = f"FAILED: {type(e).__name__}: {e}"
        _dump(report)
        return

    # --- 2. dynamic row gather -------------------------------------------
    # out[s, :] = table[idx[s], :] — one grid step per block of samples,
    # indices prefetched via PrefetchScalarGridSpec.
    from jax.experimental.pallas import tpu as pltpu

    N, C, S, BS = 1024, 128, 2048, 256

    def gather_kernel(idx_ref, table_ref, o_ref):
        b = pl.program_id(0)
        for j in range(BS):  # static unroll within the block
            o_ref[j, :] = table_ref[idx_ref[b * BS + j], :]

    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randn(N, C), jnp.float32)
    idx = jnp.asarray(rng.randint(0, N, size=(S,)), jnp.int32)
    try:
        out = pl.pallas_call(
            gather_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(S // BS,),
                in_specs=[pl.BlockSpec((N, C), lambda b, idx: (0, 0))],
                out_specs=pl.BlockSpec((BS, C), lambda b, idx: (b, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((S, C), jnp.float32),
        )(idx, table)
        got = np.asarray(jax.device_get(out))
        want = np.asarray(table)[np.asarray(idx)]
        report["gather_kernel"] = (
            "ok" if np.allclose(got, want) else "WRONG VALUES")
    except Exception as e:  # noqa: BLE001
        report["gather_kernel"] = f"FAILED: {type(e).__name__}: {e}"
        _dump(report)
        return

    # --- 3. fetch-forced A/B at a decoder-like shape ----------------------
    BH, hd, Nv, Ss = 8, 32, 36864, 147456

    def xla_gather(vol, lin):
        return jnp.take_along_axis(
            vol, lin[:, None, :], axis=2).sum().astype(jnp.float32)

    vol = jnp.asarray(rng.randn(BH, hd, Nv), jnp.bfloat16)
    lin = jnp.asarray(rng.randint(0, Nv, size=(BH, Ss)), jnp.int32)
    jx = jax.jit(xla_gather)
    vol, lin = jax.device_put((vol, lin))
    float(jax.device_get(jx(vol, lin)))
    best = min(_t(lambda: float(jax.device_get(jx(vol, lin))))
               for _ in range(4))
    report["xla_take_along_axis_sec"] = round(best, 4)
    report["note"] = ("one of 144 corner-gathers/layer-sweep equivalents; "
                      "compare a future pallas kernel against this")

    _dump(report)


def _t(call):
    t0 = time.perf_counter()
    call()
    return time.perf_counter() - t0


def _dump(report):
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".probe_pallas.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
