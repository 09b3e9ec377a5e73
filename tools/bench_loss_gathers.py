#!/usr/bin/env python
"""On-chip timing of the LOSS-path gather family (round 4, after the encoder
kernel landed).  tpu_train_trial isolation: 50176-pt loss machinery costs
~6 s/step (7.82 s at full points vs 1.76 s at 1024), feature_readout on.

Times the exact op classes the mask2former loss uses per layer (x10 layers):

  A. feat_cand     — grid_sample_3d on [1,128,128,16,192] at 150528 pts
                     (candidate scoring gather; rows of C=192)
  B. sup_readout   — same volume at G*50176 per-slot pts (the fresh
                     differentiated readout), fwd and fwd+bwd
  C. tgt_perslot   — [G,128,128,16,1] at [G,50176] per-slot pts (target
                     readout as G single-channel volumes — current shape)
  D. tgt_shared    — [1,128,128,16,G] at 150528 shared pts (restructured:
                     targets for ALL slots at the shared candidate set)

All fetch-forced.  Writes .probe_loss_gathers.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

X, Y, Z, C, G = 128, 128, 16, 192, 17
S_CAND = 150528
P_SUP = 50176


def _t(call):
    t0 = time.perf_counter()
    call()
    return time.perf_counter() - t0


def _dump(report):
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".probe_loss_gathers.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from occformer_tpu.ops.sampling import grid_sample_3d

    report = {"device_kind": jax.devices()[0].device_kind,
              "shapes": {"vol": [X, Y, Z, C], "G": G, "S_cand": S_CAND,
                         "P_sup": P_SUP}}
    rng = np.random.RandomState(0)
    vol = jnp.asarray(rng.randn(1, X, Y, Z, C), jnp.bfloat16)
    gt = jnp.asarray(rng.rand(G, X, Y, Z, 1) > 0.5, jnp.bfloat16)
    gt_sh = jnp.asarray(np.moveaxis(np.asarray(gt)[..., 0], 0, -1)[None],
                        jnp.bfloat16)  # [1, X, Y, Z, G]
    cand = jnp.asarray(rng.uniform(-1, 1, (1, S_CAND, 3)), jnp.float32)
    sup = jnp.asarray(rng.uniform(-1, 1, (G, P_SUP, 3)), jnp.float32)
    sup1 = sup.reshape(1, G * P_SUP, 3)

    def timed(name, fn, *args, grad_wrt=None):
        try:
            if grad_wrt is not None:
                f = jax.jit(jax.grad(
                    lambda *a: jnp.sum(fn(*a).astype(jnp.float32)),
                    grad_wrt))
                run = lambda: jax.device_get(
                    jax.tree_util.tree_leaves(f(*args))[0].ravel()[0])
            else:
                f = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
                run = lambda: float(jax.device_get(f(*args)))
            run()
            report[name] = round(min(_t(run) for _ in range(4)), 5)
        except Exception as e:  # noqa: BLE001
            report[name] = f"FAIL {type(e).__name__}: {str(e)[:200]}"
        _dump(report)

    # A: candidate scoring gather (shared coords, wide rows)
    timed("A_feat_cand_fwd", lambda v, c: grid_sample_3d(v, c), vol, cand)
    timed("A_feat_cand_fwdbwd", lambda v, c: grid_sample_3d(v, c), vol, cand,
          grad_wrt=(0, 1))
    # B: per-slot fresh readout at G*P points (single shared volume)
    timed("B_sup_readout_fwd", lambda v, c: grid_sample_3d(v, c), vol, sup1)
    timed("B_sup_readout_fwdbwd", lambda v, c: grid_sample_3d(v, c), vol,
          sup1, grad_wrt=(0, 1))
    # C: per-slot single-channel target gathers (current layout)
    timed("C_tgt_perslot_fwd", lambda v, c: grid_sample_3d(v, c), gt, sup)
    # D: shared-coord multi-channel target gather (restructured)
    timed("D_tgt_shared_fwd", lambda v, c: grid_sample_3d(v, c), gt_sh, cand)

    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
