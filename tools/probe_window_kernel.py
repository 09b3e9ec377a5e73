#!/usr/bin/env python
"""On-chip validation + timing of the WINDOWED trilerp kernel (round 4).

The windowed variant (trilerp.py _fwd_kernel_win) slices a W-row dynamic
window of the value table per 256-sample block; Mosaic initially rejected
the dynamic-slice start ("cannot statically prove ... multiple of 8") until
the pl.multiple_of hint landed.  This probe:
  1. compiles the windowed kernel on the real chip (the CPU suite only
     covers interpret mode),
  2. checks value+grad parity vs the XLA path at escape-heavy coords,
  3. times window=640 vs full-width vs XLA at flagship level-0 shapes.
Writes .probe_window_kernel.json incrementally.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

X, Y, Z = 64, 64, 8
C = 24
G = 8
S_FULL = 149504
W = 640


def _dump(report):
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".probe_window_kernel.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)


def _best(fn, n=4):
    def one():
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0
    return min(one() for _ in range(n))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from occformer_tpu.ops.sampling import grid_sample_3d_cfirst
    from occformer_tpu.ops.trilerp import cfirst_to_slab, trilerp_gather_slab

    report = {"device_kind": jax.devices()[0].device_kind,
              "window": W, "shapes": [X, Y, Z, C, G]}
    rng = np.random.RandomState(0)

    # ---- parity, f32, escape-heavy coords (span [-1.2, 1.2] so some
    # blocks exceed the 640-row window and exercise the escape pass) ----
    vol = jnp.asarray(rng.randn(G, C, X * Y * Z), jnp.float32)
    coords = jnp.asarray(rng.uniform(-1.2, 1.2, (G, 2048, 3)), jnp.float32)

    def k(v, c):
        return trilerp_gather_slab(cfirst_to_slab(v, (X, Y, Z)), (X, Y, Z),
                                   C, c, window=W)

    def x(v, c):
        return grid_sample_3d_cfirst(v, (X, Y, Z), c)

    t0 = time.perf_counter()
    got = np.asarray(jax.device_get(jax.jit(k)(vol, coords)))
    report["fwd_compile_sec"] = round(time.perf_counter() - t0, 1)
    want = np.asarray(jax.device_get(jax.jit(x)(vol, coords)))
    err = float(np.max(np.abs(got - want)))
    report["parity_max_abs_err_f32"] = err
    report["parity"] = "ok" if err < 1e-4 else "MISMATCH"
    _dump(report)

    def loss_k(v, c):
        return jnp.sum(jnp.sin(k(v, c)))

    def loss_x(v, c):
        return jnp.sum(jnp.sin(x(v, c)))

    t0 = time.perf_counter()
    gk = jax.device_get(jax.jit(jax.grad(loss_k, (0, 1)))(vol, coords))
    report["bwd_compile_sec"] = round(time.perf_counter() - t0, 1)
    gx = jax.device_get(jax.jit(jax.grad(loss_x, (0, 1)))(vol, coords))
    gerr = max(float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
               for a, b in zip(gk, gx))
    report["grad_parity_max_abs_err_f32"] = gerr
    report["grad_parity"] = "ok" if gerr < 1e-3 else "MISMATCH"
    _dump(report)

    # ---- timing at full flagship level-0 shapes, bf16, local coords ----
    vol = jnp.asarray(rng.randn(G, C, X * Y * Z), jnp.bfloat16)
    slab = jax.jit(lambda v: cfirst_to_slab(v, (X, Y, Z)))(vol)
    coords = jnp.asarray(rng.uniform(-1.05, 1.05, (G, S_FULL, 3)),
                         jnp.float32)

    for name, win in (("win640", W), ("full", 0)):
        def fwd(t, c, w=win):
            out = trilerp_gather_slab(t, (X, Y, Z), C, c, window=w)
            return jnp.sum(out.astype(jnp.float32))

        jf = jax.jit(fwd)
        try:
            float(jax.device_get(jf(slab, coords)))
            report[f"{name}_fwd_sec"] = round(_best(
                lambda: float(jax.device_get(jf(slab, coords)))), 5)
        except Exception as e:  # noqa: BLE001
            report[f"{name}_fwd_sec"] = f"FAIL {type(e).__name__}: {e}"
        _dump(report)

        def fb(t, c, w=win):
            g = jax.grad(lambda tt, cc: fwd(tt, cc, w), (0, 1))(t, c)
            return sum(jnp.sum(v.astype(jnp.float32)) for v in g)

        jfb = jax.jit(fb)
        try:
            float(jax.device_get(jfb(slab, coords)))
            report[f"{name}_fwdbwd_sec"] = round(_best(
                lambda: float(jax.device_get(jfb(slab, coords)))), 5)
        except Exception as e:  # noqa: BLE001
            report[f"{name}_fwdbwd_sec"] = f"FAIL {type(e).__name__}: {e}"
        _dump(report)

    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
