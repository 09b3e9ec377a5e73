#!/usr/bin/env python
"""Print the fully-resolved config (reference tools/misc/print_config.py).

Resolves ``_base_`` inheritance and ``--cfg-options`` dot-overrides through
the same loader every tool uses (occformer_tpu/config.py), so what prints is
exactly what train/test/bench consume.

Usage:
  python tools/print_config.py occformer_tpu/configs/occformer_nusc_r50_256x704.py \
      [--cfg-options model.foo=bar ...] [--json]
"""
import argparse
import json
import os
import pprint
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--cfg-options", nargs="*", default=[])
    p.add_argument("--json", action="store_true",
                   help="machine-readable JSON instead of pprint")
    args = p.parse_args()

    from occformer_tpu.config import load_config, parse_override_value

    overrides = {}
    for kv in args.cfg_options:
        k, v = kv.split("=", 1)
        overrides[k] = parse_override_value(v)
    cfg = load_config(args.config, overrides)
    if args.json:
        print(json.dumps(cfg, indent=1, default=repr))
    else:
        pprint.pprint(cfg, width=100, sort_dicts=False)


if __name__ == "__main__":
    main()
