#!/usr/bin/env python
"""Model analysis: parameter counts per component + XLA FLOP estimate.

Replaces reference tools/get_flops.py, tools/analysis_tools/get_params.py and
the fvcore parameter table printed at eval start (apis/test.py:39).

Usage: python tools/model_analysis.py [config]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config", nargs="?",
                   default="occformer_tpu/configs/occformer_nusc_r50_256x704.py")
    p.add_argument("--flops", action="store_true",
                   help="also compile the forward to get XLA's FLOP estimate")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship_model_and_batch

    model, batch = _flagship_model_and_batch(jnp.bfloat16)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)

    def count(tree):
        return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))

    report = {"total_params_M": round(count(variables["params"]) / 1e6, 3)}
    for comp, sub in variables["params"].items():
        report[f"params_M/{comp}"] = round(count(sub) / 1e6, 3)

    if args.flops:
        def fwd(v, b):
            return model.apply(v, b)["cls_preds"]

        compiled = jax.jit(fwd).lower(variables, batch).compile()
        ca = compiled.cost_analysis()
        if ca:
            report["flops_G"] = round(ca.get("flops", 0) / 1e9, 1)
            report["bytes_accessed_GB"] = round(ca.get("bytes accessed", 0) / 1e9, 2)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
