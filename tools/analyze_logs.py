#!/usr/bin/env python
"""Plot training-log curves from the train CLI's json-line logs.

Reference: tools/analysis_tools/analyze_logs.py.  The train loop prints one
json object per log interval; this renders loss curves / iteration time.

Usage:
  python tools/train.py ... | tee train.log
  python tools/analyze_logs.py train.log --keys total_loss loss_depth --out curves.png
"""
import argparse
import json
import os
import sys


def load_records(path):
    records = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "step" in rec:
                records.append(rec)
    return records


def main():
    p = argparse.ArgumentParser()
    p.add_argument("log")
    p.add_argument("--keys", nargs="*", default=["total_loss"])
    p.add_argument("--out", default="curves.png")
    args = p.parse_args()

    records = load_records(args.log)
    if not records:
        print("no json records found")
        sys.exit(1)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 5))
    steps = [r["step"] for r in records]
    for key in args.keys:
        ys = [r.get(key) for r in records]
        if any(y is not None for y in ys):
            ax.plot(steps, ys, label=key)
    ax.set_xlabel("step")
    ax.legend()
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(args.out, dpi=110)
    print("wrote", args.out)
    # quick stats
    for key in args.keys:
        ys = [r[key] for r in records if key in r]
        if ys:
            print(f"{key}: first={ys[0]:.4f} last={ys[-1]:.4f} min={min(ys):.4f}")


if __name__ == "__main__":
    main()
