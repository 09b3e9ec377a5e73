#!/usr/bin/env python
"""AOT diff of the flagship inference program at B=1 vs B=2 (VERDICT r4 #5).

The bench's batch-scaling slope has been SUPER-linear since round 3 (B=2
executes at ~2.2-2.4x the B=1 time where <= 2x is expected), which decides
multi-sample eval throughput.  This compiles both programs (no device
execution) and prints XLA's own accounting — temp/code bytes and the
cost-analysis FLOP/byte totals — so a layout/fusion regression at B=2 shows
up as a superlinear jump in one of these columns.  Writes
.probe_b2_aot.json.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from occformer_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    from __graft_entry__ import _flagship_model_and_batch

    rep = {}
    out_p = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".probe_b2_aot.json")
    for B in (1, 2):
        model, batch = _flagship_model_and_batch(jnp.bfloat16, batch_size=B)
        key = jax.random.PRNGKey(0)
        shapes = jax.eval_shape(lambda: model.init(key, batch))
        zeros = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), shapes)

        def fwd(v, b):
            out = model.apply(v, b)
            return jax.tree_util.tree_reduce(
                lambda a, x: a + x.sum().astype(jnp.float32), out,
                jnp.float32(0))

        t0 = time.time()
        compiled = jax.jit(fwd).lower(zeros, batch).compile()
        entry = {"compile_s": round(time.time() - t0, 1)}
        try:
            m = compiled.memory_analysis()
            entry.update(temp_mib=round(m.temp_size_in_bytes / 2**20, 1),
                         code_mib=round(
                             m.generated_code_size_in_bytes / 2**20, 1),
                         arg_mib=round(m.argument_size_in_bytes / 2**20, 1))
        except Exception as e:  # noqa: BLE001
            entry["memory_analysis"] = f"FAIL {type(e).__name__}"
        try:
            c = compiled.cost_analysis()
            c = c[0] if isinstance(c, (list, tuple)) else c
            entry.update(flops_T=round(c.get("flops", 0) / 1e12, 3),
                         bytes_GiB=round(
                             c.get("bytes accessed", 0) / 2**30, 2))
        except Exception as e:  # noqa: BLE001
            entry["cost_analysis"] = f"FAIL {type(e).__name__}"
        rep[f"B{B}"] = entry
        with open(out_p, "w") as f:
            json.dump(rep, f, indent=1)
        print(f"B{B}", json.dumps(entry), flush=True)
    # superlinearity verdict from the static columns
    if all(f"B{b}" in rep for b in (1, 2)):
        for k in ("flops_T", "bytes_GiB", "temp_mib", "code_mib"):
            a, b = rep["B1"].get(k), rep["B2"].get(k)
            if a and b:
                rep[f"{k}_ratio_B2_over_B1"] = round(b / a, 3)
        with open(out_p, "w") as f:
            json.dump(rep, f, indent=1)
        print(json.dumps({k: v for k, v in rep.items() if "ratio" in k}))


if __name__ == "__main__":
    main()
