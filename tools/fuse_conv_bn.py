#!/usr/bin/env python
"""Bake BN statistics into conv kernels of a converted checkpoint
(reference tools/misc/fuse_conv_bn.py).

Reads a converted orbax checkpoint ({'params','batch_stats'} tree, as
written by tools/convert_checkpoint.py), applies
occformer_tpu.engine.fuse.fuse_conv_bn, and writes the fused tree next to
it.  Inference-only: training on a fused checkpoint is invalid (the BN is
degenerate afterwards).

Usage:
  python tools/fuse_conv_bn.py work_dirs/ckpt_in work_dirs/ckpt_fused
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("src", help="orbax checkpoint dir (converted tree)")
    p.add_argument("dst", help="output dir for the fused tree")
    args = p.parse_args()

    import orbax.checkpoint as ocp

    from occformer_tpu.engine.fuse import fuse_conv_bn

    ckptr = ocp.StandardCheckpointer()
    variables = ckptr.restore(os.path.abspath(args.src))
    fused, pairs, unpaired = fuse_conv_bn(variables)
    ckptr.save(os.path.abspath(args.dst), fused, force=True)
    ckptr.wait_until_finished()
    print(json.dumps({"fused_pairs": len(pairs), "dst": args.dst,
                      "unpaired_convs": unpaired,
                      "pairs": pairs[:10] + (["..."] if len(pairs) > 10
                                             else [])}))


if __name__ == "__main__":
    main()
