#!/usr/bin/env python
"""On-chip training soak: 100+ consecutive steps with mid-run checkpoint/resume.

Evidence for the multi-step stability of a config's FULL training program on
the real chip (the reference trains 24-30 epochs, docs/train_and_eval.md:3;
the axon backend's characterized failure mode appears only at execution 2+,
NOTES.md) — a 3-step trial proves compilation, a soak proves the program
survives a training run.  Per step: wall time (p50/p95) and the loss
trajectory on a fixed synthetic batch at the config's exact shapes (fixed
batch -> the model must overfit, so "loss trends down" is checkable without
datasets).  At ``--ckpt-at`` the state is checkpointed, restored into a fresh
tree, bit-compared, and training CONTINUES from the restored state — the
mid-run save/resume path exercised on chip, not just on CPU.

Tunnel-weather hardened: progress is flushed to disk every ``--flush-every``
steps and a checkpoint is saved with it, so an outer ``timeout`` kill or a
hung tunnel loses at most one flush window; ``--resume`` continues from the
last flush.  Results merge into SOAK_r{N}.json keyed by ``--tag``.

Usage:
  timeout 7200 python tools/soak.py [CONFIG] --tag flagship --steps 120
  python tools/soak.py ... --resume     # continue after a kill/outage
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.tpu_train_trial import build_trial  # noqa: E402


def _atomic_write(path, obj):
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1)
    os.replace(tmp, path)


def _merge_out(out_path, tag, entry):
    merged = {}
    if os.path.exists(out_path):
        try:
            with open(out_path) as f:
                merged = json.load(f)
        except Exception:
            merged = {}
    merged[tag] = entry
    _atomic_write(out_path, merged)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config", nargs="?",
                   default="occformer_tpu/configs/occformer_nusc_r50_256x704.py")
    p.add_argument("--tag", default="flagship")
    p.add_argument("--steps", type=int, default=120)
    p.add_argument("--ckpt-at", type=int, default=60,
                   help="step at which to checkpoint + restore + continue")
    p.add_argument("--flush-every", type=int, default=10)
    p.add_argument("--window", type=int, default=1,
                   help="fetch losses every N steps instead of per step; "
                   "async dispatch inside a window pipelines execution so "
                   "the tunnel round-trip (~seconds) is paid once per window "
                   "rather than per step.  Recorded step_secs become the "
                   "window-average wall time per step.")
    p.add_argument("--deadline-secs", type=float, default=6000,
                   help="stop (resumably) when this much wall time is spent")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--out", default=None, help="merged result json (default "
                   "SOAK_r03.json at the repo root)")
    p.add_argument("--num-points", type=int, default=None)
    args = p.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = args.out or os.path.join(repo, "SOAK_r03.json")
    prog_path = os.path.join(repo, f".soak_progress_{args.tag}.json")
    ckpt_dir = os.path.join(repo, f".soak_ckpt_{args.tag}")
    t_start = time.time()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from occformer_tpu.engine.checkpoint import (
        latest_checkpoint, load_checkpoint, save_checkpoint)
    from occformer_tpu.engine.optim import build_optimizer, step_lr_schedule
    from occformer_tpu.engine.train import TrainState, build_train_step
    from occformer_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    model, batch, loss_cfg, cfg = build_trial(
        args.config, num_points=args.num_points)
    # transfer the fixed batch ONCE: a numpy batch argument re-uploads
    # ~tens of MB over the tunnel on every dispatch, which at bad tunnel
    # weather dominates (15.5 s/step measured) and falsifies step timing
    batch = jax.device_put(batch)
    lr = step_lr_schedule(1e-4, 28000, [20, 23])
    key = jax.random.PRNGKey(0)

    t0 = time.time()
    variables = jax.jit(model.init)({"params": key, "dropout": key}, batch)
    jax.block_until_ready(variables)
    print(f"init: {time.time() - t0:.1f}s", flush=True)
    tx = build_optimizer(variables["params"], lr=lr, grad_clip=5.0)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]))

    progress = {"tag": args.tag, "config": os.path.basename(args.config),
                "num_points": loss_cfg.num_points,
                "losses": [], "step_secs": [], "events": [],
                "compile_secs": None, "resume_verified": None}
    start_step = 0
    if args.resume and os.path.exists(prog_path):
        with open(prog_path) as f:
            progress = json.load(f)
        ck = latest_checkpoint(ckpt_dir)
        if ck is None:
            print("resume requested but no checkpoint; starting over", flush=True)
        else:
            state = load_checkpoint(ck, state)
            start_step = int(jax.device_get(state.step))
            # drop any progress recorded past the checkpoint
            progress["losses"] = progress["losses"][:start_step]
            progress["step_secs"] = progress["step_secs"][:start_step]
            progress["events"].append(f"resumed at step {start_step}")
            print(f"resumed from {ck} at step {start_step}", flush=True)

    # donation invalidates the input state each call — checkpointing always
    # uses the freshly returned state
    step_fn = jax.jit(build_train_step(model, tx, loss_cfg),
                      donate_argnums=(0,))

    def flush(status):
        progress["status"] = status
        progress["wall_secs"] = round(time.time() - t_start, 1)
        _atomic_write(prog_path, progress)

    eq_fn = None
    pending = []          # total_loss futures dispatched but not fetched
    t_window = [None]

    def drain(i):
        """Block on the pending window; record per-step avg wall time and
        the exact per-step losses."""
        if not pending:
            return 0.0
        totals = [float(t) for t in jax.device_get(pending)]  # blocks
        dt = (time.time() - t_window[0]) / len(pending)
        for t in totals:
            progress["losses"].append(round(t, 4))
            progress["step_secs"].append(round(dt, 4))
        pending.clear()
        t_window[0] = None
        if not all(np.isfinite(t) for t in totals):
            progress["events"].append(f"NONFINITE loss at step <= {i}")
            flush("nonfinite")
            raise SystemExit(2)
        return totals[-1]

    try:
        for i in range(start_step, args.steps):
            if t_window[0] is None:
                t_window[0] = time.time()
            state, metrics = step_fn(state, batch, key)
            pending.append(metrics["total_loss"])
            first = i == start_step
            if (first or len(pending) >= args.window
                    or (i + 1) % args.flush_every == 0
                    or (i + 1) == args.ckpt_at or (i + 1) == args.steps):
                t0 = time.time()
                total = drain(i)
                if first and progress["compile_secs"] is None:
                    progress["compile_secs"] = round(time.time() - t0, 1)
            else:
                continue
            if (i + 1) % args.flush_every == 0:
                flush("running")
                print(f"step {i + 1}/{args.steps} loss={total:.3f} "
                      f"dt={progress['step_secs'][-1]:.3f}s/step", flush=True)
            if (i + 1) == args.ckpt_at:
                # mid-soak checkpoint -> restore -> verify -> continue from
                # the RESTORED state
                t0 = time.time()
                path = save_checkpoint(ckpt_dir, state, i + 1)
                restored = load_checkpoint(path, state)
                if eq_fn is None:
                    eq_fn = jax.jit(lambda a, b: jax.tree_util.tree_reduce(
                        jnp.logical_and,
                        jax.tree_util.tree_map(
                            lambda x, y: (x == y).all(), a, b),
                        jnp.array(True)))
                bit_equal = bool(jax.device_get(
                    eq_fn(restored.params, state.params)))
                progress["resume_verified"] = bit_equal
                progress["events"].append(
                    f"ckpt+restore at step {i + 1}: bit_equal={bit_equal} "
                    f"({time.time() - t0:.1f}s)")
                print(progress["events"][-1], flush=True)
                state = restored
                if not bit_equal:
                    flush("resume_mismatch")
                    raise SystemExit(3)
            if time.time() - t_start > args.deadline_secs:
                save_checkpoint(ckpt_dir, state, i + 1)
                progress["events"].append(f"deadline at step {i + 1}")
                flush("deadline_partial")
                print("deadline reached; resumable", flush=True)
                return
    except KeyboardInterrupt:
        flush("interrupted")
        raise

    # summary
    times = np.array(progress["step_secs"][1:])  # drop compile step
    losses = progress["losses"]
    n = len(losses)
    first_q = float(np.mean(losses[: max(1, n // 4)]))
    last_q = float(np.mean(losses[-max(1, n // 4):]))
    entry = {
        "config": progress["config"],
        "num_points": progress["num_points"],
        "steps_completed": n,
        "compile_secs": progress["compile_secs"],
        "step_sec_p50": round(float(np.percentile(times, 50)), 4),
        "step_sec_p95": round(float(np.percentile(times, 95)), 4),
        "step_time_note": "window-average wall time per step INCLUDING the "
                          "tunnel execute round-trip, which at bad tunnel "
                          "weather dominates (~15 s/exec serialized RPCs vs "
                          "~0.02-0.1 s device step, NOTES.md); stability/"
                          "loss evidence, not a device-step benchmark — "
                          "bench.py measures step time properly",
        "loss_first": losses[0], "loss_last": losses[-1],
        "loss_first_quarter_mean": round(first_q, 4),
        "loss_last_quarter_mean": round(last_q, 4),
        "loss_trending_down": bool(last_q < first_q),
        "all_finite": True,
        # None = the mid-soak ckpt check did not run in THIS process (e.g.
        # a --resume past the ckpt step); only an explicit False is a failure
        "mid_soak_ckpt_resume_bit_equal": progress["resume_verified"],
        "events": progress["events"],
        "wall_secs": round(time.time() - t_start, 1),
    }
    flush("done")
    _merge_out(out_path, args.tag, entry)
    print(json.dumps({args.tag: entry}), flush=True)


if __name__ == "__main__":
    main()
