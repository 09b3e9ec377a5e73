#!/usr/bin/env python
"""On-chip parity + slope timing of the sorted windowed loss gathers.

Validates ops/loss_gather.py at the REAL flagship loss shapes before the
train trial: packed candidate scoring ([G=17]-channel volumes at S=150528
shared sorted points, f32 6-pass MXU), per-slot 2-channel random readout
([G=17, n_rand=12544]), and the bf16 Q=100 matching pack.  Compares against
the XLA feature-path formulation (emb . point_sample(feature)) and
slope-times fwd and fwd+bwd (RTT floor excluded).  Writes
.probe_loss_mxu.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

X, Y, Z, C = 128, 128, 16, 192
G, Q = 17, 100
S_CAND = 150528
N_RAND = 12544
K1, K2 = 3, 9


def _dump(rep):
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".probe_loss_mxu.json")
    with open(out, "w") as f:
        json.dump(rep, f, indent=1)


def main():
    import numpy as np

    import jax
    import jax.numpy as jnp

    from occformer_tpu.ops.loss_gather import (
        sample_per_slot, sample_volumes_packed, sort_points_by_row)
    from occformer_tpu.ops.sampling import point_sample_3d

    rng = np.random.RandomState(0)
    rep = {"device_kind": jax.devices()[0].device_kind,
           "shapes": dict(X=X, Y=Y, Z=Z, C=C, G=G, Q=Q, S_cand=S_CAND,
                          n_rand=N_RAND)}

    feature = jnp.asarray(rng.randn(X, Y, Z, C).astype(np.float32) * 0.1)
    emb = jnp.asarray(rng.randn(G, C).astype(np.float32) * 0.1)
    cand = jnp.asarray((rng.rand(S_CAND, 3) * 1.1 - 0.05).astype(np.float32))
    cand_s = jax.jit(lambda p: sort_points_by_row(p, (X, Y, Z)))(cand)

    # ---- parity: packed candidate scoring vs XLA feature path ----
    hi = jax.lax.Precision.HIGHEST

    def mxu_cand(e, f, p):
        vol = jnp.einsum("gc,xyzc->gxyz", e, f, precision=hi)
        return sample_volumes_packed(vol, p, False, "border").T  # [G, S]

    def xla_cand(e, f, p):
        fp = point_sample_3d(f[None], p[None], align_corners=False,
                             padding_mode="border")[0]  # [S, C]
        return jnp.einsum("gc,sc->gs", e, fp, precision=hi)

    small = cand_s[:4096]
    a = np.asarray(jax.device_get(jax.jit(mxu_cand)(emb, feature, small)))
    b = np.asarray(jax.device_get(jax.jit(xla_cand)(emb, feature, small)))
    scale = max(1e-6, float(np.abs(b).max()))
    rep["cand_parity_max_rel_err"] = float(np.abs(a - b).max() / scale)
    rep["cand_parity"] = "ok" if rep["cand_parity_max_rel_err"] < 1e-3 \
        else "MISMATCH"
    _dump(rep)

    # grad parity (both w.r.t. emb and feature)
    def loss_m(e, f):
        return jnp.sum(jnp.sin(mxu_cand(e, f, small)))

    def loss_x(e, f):
        return jnp.sum(jnp.sin(xla_cand(e, f, small)))

    gm = jax.device_get(jax.jit(jax.grad(loss_m, (0, 1)))(emb, feature))
    gx = jax.device_get(jax.jit(jax.grad(loss_x, (0, 1)))(emb, feature))
    gerr = max(
        float(np.abs(np.asarray(p) - np.asarray(q)).max()
              / max(1e-6, float(np.abs(np.asarray(q)).max())))
        for p, q in zip(gm, gx))
    rep["cand_grad_parity_max_rel_err"] = gerr
    rep["cand_grad_parity"] = "ok" if gerr < 1e-2 else "MISMATCH"
    _dump(rep)

    # ---- slope timing ----
    def _t(fn):
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    def slope(make, *args):
        ts = []
        for k in (K1, K2):
            jf = jax.jit(make(k))
            float(jax.device_get(jf(*args)))
            ts.append(min(_t(lambda: float(jax.device_get(jf(*args))))
                          for _ in range(3)))
        return (ts[1] - ts[0]) / (K2 - K1)

    rand = jnp.asarray(rng.rand(G, N_RAND, 3).astype(np.float32))
    rand_s = jax.jit(lambda p: sort_points_by_row(p, (X, Y, Z)))(rand)
    gt_vol = jnp.asarray(
        (rng.rand(G, X, Y, Z) > 0.9).astype(np.float32))

    # the XLA feature-path baseline is NOT re-timed here: its scan-chained
    # fwd+bwd (9 chained [150k, C] gather backwards) hangs the remote
    # compiler for 15+ min; the round-3 per-call baseline lives in
    # .probe_loss_gathers.json (B_sup_readout 0.244 s fwd+bwd incl RTT).
    for name, make in (
        ("cand_mxu", lambda k: lambda e, f: jax.lax.scan(
            lambda acc, i: (acc + jnp.sum(mxu_cand(e * (1 + 1e-6 * i), f,
                                                   cand_s)), 0),
            jnp.float32(0), jnp.arange(k, dtype=jnp.float32))[0]),
    ):
        try:
            rep[f"{name}_fwd_ms"] = round(slope(make, emb, feature) * 1e3, 3)
        except Exception as e:  # noqa: BLE001
            rep[f"{name}_fwd_ms"] = f"FAIL {type(e).__name__}: {e}"
        _dump(rep)

        def make_fb(k, mk=make):
            def f(e, ft):
                def body(acc, i):
                    g = jax.grad(lambda ee, ff: mk(1)(
                        ee * (1 + 1e-6 * i), ff), (0, 1))(e, ft)
                    return acc + sum(jnp.sum(x) for x in g), 0
                return jax.lax.scan(body, jnp.float32(0),
                                    jnp.arange(k, dtype=jnp.float32))[0]
            return f

        try:
            rep[f"{name}_fwdbwd_ms"] = round(
                slope(make_fb, emb, feature) * 1e3, 3)
        except Exception as e:  # noqa: BLE001
            rep[f"{name}_fwdbwd_ms"] = f"FAIL {type(e).__name__}: {e}"
        _dump(rep)

    # per-slot 2-channel random readout (pred + gt)
    def rand_readout(e, f):
        vol = jnp.einsum("gc,xyzc->gxyz", e, f)
        both = jnp.stack([vol, gt_vol], axis=-1)
        pt = sample_per_slot(both, rand_s, False, "border")
        return jnp.sum(pt[..., 0]) + jnp.sum(pt[..., 1])

    def make_rr(k):
        def f(e, ft):
            def body(acc, i):
                g = jax.grad(lambda ee: rand_readout(ee * (1 + 1e-6 * i),
                                                     ft))(e)
                return acc + jnp.sum(g), 0
            return jax.lax.scan(body, jnp.float32(0),
                                jnp.arange(k, dtype=jnp.float32))[0]
        return f

    try:
        rep["rand_readout_fwdbwd_ms"] = round(
            slope(make_rr, emb, feature) * 1e3, 3)
    except Exception as e:  # noqa: BLE001
        rep["rand_readout_fwdbwd_ms"] = f"FAIL {type(e).__name__}: {e}"
    _dump(rep)

    # bf16 Q=100 matching pack, fwd only, channel-chunked
    embq = jnp.asarray(rng.randn(Q, C).astype(np.float32) * 0.1)

    def match_mxu(e, f):
        qv = jnp.einsum("qc,xyzc->qxyz", e.astype(jnp.bfloat16),
                        f.astype(jnp.bfloat16))
        return jnp.sum(sample_volumes_packed(
            qv, cand_s, False, "border").astype(jnp.float32))

    def make_match(k):
        def f(e, ft):
            def body(acc, i):
                return acc + match_mxu(e * (1 + 1e-6 * i), ft), 0
            return jax.lax.scan(body, jnp.float32(0),
                                jnp.arange(k, dtype=jnp.float32))[0]
        return f

    try:
        rep["match_q100_fwd_ms"] = round(
            slope(make_match, embq, feature) * 1e3, 3)
    except Exception as e:  # noqa: BLE001
        rep["match_q100_fwd_ms"] = f"FAIL {type(e).__name__}: {e}"
    _dump(rep)
    print(json.dumps(rep, indent=1))


if __name__ == "__main__":
    main()
