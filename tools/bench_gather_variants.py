#!/usr/bin/env python
"""On-chip A/B of deform-attn trilinear-gather implementations (round 4).

Round 3 located 95% of the flagship frame in the MSDeformAttn3D corner
gathers (XLA take_along_axis ~2 GB/s effective, .probe_pallas.json).  This
probe times, at the REAL flagship level-0 shapes (G=B*H=8, 64x64x8 volume,
head_dim 24, S=Nq*P=149504 samples):

  1. xla_cfirst   — the shipped grid_sample_3d_cfirst (baseline)
  2. pallas_mxu   — ops/trilerp.py one-hot MXU kernel
  and for both: forward-only and forward+backward (table & coord grads).

Also runs an ON-CHIP compiled-vs-XLA parity check (the CPU suite only covers
interpret mode).  All timings fetch-forced (NOTES.md ROUND-3 CORRECTION).
Writes .probe_gather_variants.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LEVELS = [(64, 64, 8), (32, 32, 4), (16, 16, 2)]
C = 24
G = 8
NQ = 37376
P = 4


def _t(call):
    t0 = time.perf_counter()
    call()
    return time.perf_counter() - t0


def _best(fn, n=4):
    return min(_t(fn) for _ in range(n))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from occformer_tpu.ops.sampling import grid_sample_3d_cfirst
    from occformer_tpu.ops.trilerp import (
        cfirst_to_slab, trilerp_gather_slab)

    report = {"device_kind": jax.devices()[0].device_kind,
              "shapes": {"G": G, "C": C, "S": NQ * P, "levels": LEVELS}}
    rng = np.random.RandomState(0)
    S = NQ * P

    # ---------- on-chip compiled parity (small S, f32) ----------
    X, Y, Z = LEVELS[0]
    vol_s = jnp.asarray(rng.randn(G, C, X * Y * Z), jnp.float32)
    coords_s = jnp.asarray(rng.uniform(-1.2, 1.2, (G, 512, 3)), jnp.float32)

    def k_small(v, c):
        return trilerp_gather_slab(cfirst_to_slab(v, (X, Y, Z)), (X, Y, Z),
                                   C, c)

    def x_small(v, c):
        return grid_sample_3d_cfirst(v, (X, Y, Z), c)

    got = np.asarray(jax.device_get(jax.jit(k_small)(vol_s, coords_s)))
    want = np.asarray(jax.device_get(jax.jit(x_small)(vol_s, coords_s)))
    err = float(np.max(np.abs(got - want)))
    report["onchip_parity_max_abs_err_f32"] = err
    report["onchip_parity"] = "ok" if err < 1e-4 else "MISMATCH"
    _dump(report)

    # grad parity (small)
    def loss_k(v, c):
        return jnp.sum(jnp.sin(k_small(v, c)))

    def loss_x(v, c):
        return jnp.sum(jnp.sin(x_small(v, c)))

    gk = jax.device_get(jax.jit(jax.grad(loss_k, (0, 1)))(vol_s, coords_s))
    gx = jax.device_get(jax.jit(jax.grad(loss_x, (0, 1)))(vol_s, coords_s))
    gerr = max(float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
               for a, b in zip(gk, gx))
    report["onchip_grad_parity_max_abs_err_f32"] = gerr
    report["onchip_grad_parity"] = "ok" if gerr < 1e-3 else "MISMATCH"
    _dump(report)

    # ---------- timing at full flagship shapes, bf16 ----------
    for lvl, (X, Y, Z) in enumerate(LEVELS):
        n = X * Y * Z
        vol = jnp.asarray(rng.randn(G, C, n), jnp.bfloat16)
        slab = jax.jit(lambda v, s=(X, Y, Z): cfirst_to_slab(v, s))(vol)
        coords = jnp.asarray(rng.uniform(-1.05, 1.05, (G, S, 3)), jnp.float32)

        def xla_fwd(v, c, s=(X, Y, Z)):
            out = grid_sample_3d_cfirst(v, s, c, compute_dtype=jnp.bfloat16)
            return jnp.sum(out.astype(jnp.float32))

        def mxu_fwd(t, c, s=(X, Y, Z)):
            out = trilerp_gather_slab(t, s, C, c)
            return jnp.sum(out.astype(jnp.float32))

        for name, fn, arg in (("xla", xla_fwd, vol), ("mxu", mxu_fwd, slab)):
            if lvl > 0 and name == "xla":
                continue  # XLA baseline only needed at level 0 (dominant)
            jf = jax.jit(fn)
            try:
                float(jax.device_get(jf(arg, coords)))  # compile + warm
                sec = _best(lambda: float(jax.device_get(jf(arg, coords))))
                report[f"L{lvl}_{name}_fwd_sec"] = round(sec, 5)
            except Exception as e:  # noqa: BLE001
                report[f"L{lvl}_{name}_fwd_sec"] = f"FAIL {type(e).__name__}: {e}"
            _dump(report)

        # fwd+bwd (grads w.r.t. table and coords)
        def xla_fb(v, c, s=(X, Y, Z)):
            g = jax.grad(lambda vv, cc: xla_fwd(vv, cc, s), (0, 1))(v, c)
            return sum(jnp.sum(x.astype(jnp.float32)) for x in g)

        def mxu_fb(t, c, s=(X, Y, Z)):
            g = jax.grad(lambda tt, cc: mxu_fwd(tt, cc, s), (0, 1))(t, c)
            return sum(jnp.sum(x.astype(jnp.float32)) for x in g)

        for name, fn, arg in (("xla", xla_fb, vol), ("mxu", mxu_fb, slab)):
            if lvl > 0 and name == "xla":
                continue
            jf = jax.jit(fn)
            try:
                float(jax.device_get(jf(arg, coords)))
                sec = _best(lambda: float(jax.device_get(jf(arg, coords))))
                report[f"L{lvl}_{name}_fwdbwd_sec"] = round(sec, 5)
            except Exception as e:  # noqa: BLE001
                report[f"L{lvl}_{name}_fwdbwd_sec"] = (
                    f"FAIL {type(e).__name__}: {e}")
            _dump(report)

    # bf16 value parity at full shape level 0 (kernel vs xla, loose tol)
    X, Y, Z = LEVELS[0]
    vol = jnp.asarray(rng.randn(G, C, X * Y * Z), jnp.bfloat16)
    slab = jax.jit(lambda v: cfirst_to_slab(v, (X, Y, Z)))(vol)
    coords = jnp.asarray(rng.uniform(-1.05, 1.05, (G, 4096, 3)), jnp.float32)
    a = np.asarray(jax.device_get(jax.jit(
        lambda t, c: trilerp_gather_slab(t, (X, Y, Z), C, c))(slab, coords)
    )).astype(np.float32)
    b = np.asarray(jax.device_get(jax.jit(
        lambda v, c: grid_sample_3d_cfirst(v, (X, Y, Z), c,
                                           compute_dtype=jnp.bfloat16)
    )(vol, coords))).astype(np.float32)
    report["onchip_bf16_max_abs_err"] = float(np.max(np.abs(a - b)))

    _dump(report)
    print(json.dumps(report, indent=1))


def _dump(report):
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".probe_gather_variants.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
