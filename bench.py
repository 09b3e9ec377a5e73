"""Benchmark: the README perf table in ONE driver-runnable artifact.

Prints ONE JSON line.  Primary metric (driver contract): flagship nuScenes
R50 6x256x704 inference frames(samples)/sec on one TPU chip —
{"metric", "value", "unit", "vs_baseline"} — plus labeled secondary metrics
(VERDICT r2 item #4): flagship_train_step_sec, kitti_b7_infer_fps,
r101_infer_fps, analytic FLOPs + MFU (occformer_tpu/utils/flops.py — NOT
XLA cost_analysis, which double-counts remat/fusion).

MEASUREMENT METHODOLOGY (round-3 correction — see NOTES.md "block_until_ready
does not wait" and tools/bench_throughput_probe{,2,3}.py):

On this experimental `axon` backend ``block_until_ready`` returns after the
RPC *ack*, NOT device completion — every timing in rounds 1-2 that relied on
it (async dispatch pipelines, scan-amortized windows) measured dispatch rate,
not compute (a chained 32-matmul program "ran" at 9.5 PFLOP/s).  Only a
value FETCH (``device_get``) demonstrably forces completion.  Therefore:

* every timed call returns a SCALAR CHECKSUM of its full output (keeps all
  compute live, kills output-transfer cost) and is timed to the
  ``device_get`` of that scalar;
* the primary value is the honest END-TO-END rate on this backend
  (fetch-forced, min over repeats);
* the flagship is additionally timed at a larger batch to separate the
  backend's per-execute overhead (intercept) from true device compute
  (slope): ``device_marginal_fps = (B2-B1)/(t(B2)-t(B1))``.  On this
  backend the intercept is large and program-size-dependent (probe3);
  the slope is the hardware-representative per-sample time.

vs_baseline = end_to_end_fps / 4.5 (the reference publishes no FPS;
4.5 fps is the community A100 estimate for OccFormer-R50, SURVEY.md §6).

Budget-aware: stages run in value order and each checks the remaining
deadline first; a skipped or failed stage records a note instead of
blocking the primary metric.  Set BENCH_FAST=1 for the primary metric only.

OUTPUT CONTRACT (round-5 fix — VERDICT r4 #1: the round-4 driver run was
killed mid-compile and recorded `parsed: null` despite a real 6.4x win):
the driver tail-parses the LAST ``{...}`` line of stdout, so this script
prints a PROGRESSION of complete JSON lines, each superseding the last:

  1. immediately at startup: a provisional line (value 0.0, explicit
     "in progress" error) — a kill during the first compile now records
     an explicit failure instead of nothing;
  2. immediately after the flagship measurement: the primary-metric line;
  3. after EVERY completed secondary stage: the full combined line so far.

A kill at ANY point therefore records the most complete measurement set
available at that moment.  DEADLINE_SECS defaults inside the driver's
observed budget (round-4 was killed before 25 min).
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

A100_BASELINE_FPS = 4.5
REPEATS = 6
BSLOPE = int(os.environ.get("BENCH_BSLOPE", 2))
# The axon tunnel has outage stretches (NOTES.md) during which ANY device
# call hangs with no error.  A hung bench records nothing for the round;
# the watchdog turns that into an explicit failure line instead.
# 1260 s + 60 s watchdog < the driver's observed kill budget (<25 min,
# BENCH_r04.json rc=124) — VERDICT r4 #1(b).
DEADLINE_SECS = float(os.environ.get("BENCH_DEADLINE_SECS", 1260))
T0 = time.time()

# bf16 dense peak by device_kind substring (jax.devices()[0].device_kind)
PEAKS = [("v6", 918e12), ("trillium", 918e12), ("v5p", 459e12),
         ("v5 lite", 197e12), ("v5e", 197e12), ("v5litepod", 197e12),
         ("v4", 275e12)]


def _remaining():
    return DEADLINE_SECS - (time.time() - T0)


def _arm_watchdog():
    import threading

    def fire():
        print(json.dumps({
            "metric": "nusc_r50_256x704_infer_frames_per_sec_per_chip",
            "value": 0.0,
            "unit": "frames/s",
            "vs_baseline": 0.0,
            "error": f"TPU backend unresponsive for {DEADLINE_SECS:.0f}s "
                     "(axon tunnel outage; see NOTES.md) — no measurement",
        }), flush=True)
        os._exit(2)

    t = threading.Timer(DEADLINE_SECS + 60, fire)
    t.daemon = True
    t.start()
    return t


def _checksum(tree):
    import jax
    import jax.numpy as jnp

    return jax.tree_util.tree_reduce(
        lambda a, x: a + x.sum().astype(jnp.float32), tree, jnp.float32(0))


def _fetch_sec(call, repeats=REPEATS):
    """Min fetch-forced seconds per execution.  ``call()`` must return a
    device scalar; the fetch is what forces completion on this backend."""
    import jax
    import numpy as np

    for attempt in range(2):  # transient remote_compile HTTP failures
        try:
            v = float(jax.device_get(call()))
            break
        except Exception:
            if attempt == 1:
                raise
            time.sleep(5)
    assert np.isfinite(v), f"non-finite checksum {v}"
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(jax.device_get(call()))
        best = min(best, time.perf_counter() - t0)
    return best


def _build_infer(cfg_path, batch_size=1):
    """(jitted scalar-checksum forward, device args, samples_per_exec) for
    any config — same program shape as entry(): full model + final-layer
    semantic voxel scores (the deployment output)."""
    import jax

    from occformer_tpu.models.mask2former_head import (
        format_results, mask_logits_from_embeds)
    from tools.tpu_train_trial import build_trial

    model, batch, _, _ = build_trial(cfg_path)
    model = model.clone(train=False)  # eval mode: frozen BN, no dropout
    if batch_size > 1:
        import numpy as np

        batch = {k: np.concatenate([np.asarray(v)] * batch_size, axis=0)
                 for k, v in batch.items()}
        batch["imgs"] = batch["imgs"] + np.arange(
            batch_size, dtype=np.float32).reshape(
                (batch_size,) + (1,) * (batch["imgs"].ndim - 1)) * 0.01
    key = jax.random.PRNGKey(0)
    variables = jax.jit(model.init)({"params": key, "dropout": key}, batch)

    @jax.jit
    def fwd(v, b):
        out = model.apply(v, b)
        final = mask_logits_from_embeds(out["mask_embeds"][-1],
                                        out["mask_feature"])
        return _checksum(format_results(out["cls_preds"][-1], final))

    variables, batch = jax.device_put((variables, batch))
    return fwd, (variables, batch), batch["imgs"].shape[0]


def _infer_fps(cfg_path, batch_size=1):
    fwd, args, n = _build_infer(cfg_path, batch_size)
    return n / _fetch_sec(lambda: fwd(*args)), n


def _train_step_sec(cfg_path):
    import jax
    import jax.numpy as jnp

    from occformer_tpu.engine.optim import build_optimizer, step_lr_schedule
    from occformer_tpu.engine.train import TrainState, build_train_step
    from tools.tpu_train_trial import build_trial

    model, batch, loss_cfg, _ = build_trial(cfg_path)
    key = jax.random.PRNGKey(0)
    variables = jax.jit(model.init)({"params": key, "dropout": key}, batch)
    batch = jax.device_put(batch)
    tx = build_optimizer(variables["params"],
                         lr=step_lr_schedule(1e-4, 28000, [20, 23]),
                         grad_clip=5.0)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]))
    step_fn = jax.jit(build_train_step(model, tx, loss_cfg),
                      donate_argnums=(0,))

    # keep a host copy: the state is DONATED per step, so if a dispatch
    # raises after donation the retry in _fetch_sec would otherwise run on
    # an invalidated buffer (ADVICE r3) — rebuild from host instead.
    import numpy as np

    host_state = jax.tree.map(np.asarray, state)
    holder = {"state": state}

    def one():
        try:
            holder["state"], m = step_fn(holder["state"], batch, key)
        except Exception:
            holder["state"] = jax.device_put(host_state)
            raise
        return m["total_loss"]  # fetching the loss forces the step

    return _fetch_sec(one, repeats=4)


def _kernel_parity():
    """On-chip compiled MXU-kernel vs XLA-gather parity at the production
    window config (VERDICT r3 #6: the CPU suite only covers interpret
    mode; this gate catches a Mosaic compile/runtime divergence on the
    real chip).  Returns max |mxu - xla| over values and grads on a
    decoder-shaped f32 problem (escape-heavy coords), covering BOTH the
    single-level windowed kernel and the round-5 fused multi-level kernel
    (ops/trilerp_fused.py — the production deform-attn path)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from occformer_tpu.ops.sampling import grid_sample_3d_cfirst
    from occformer_tpu.ops.trilerp import cfirst_to_slab, trilerp_gather_slab
    from occformer_tpu.ops.trilerp_fused import fused_multilevel_gather

    X, Y, Z, C, G, S = 64, 64, 8, 24, 8, 512
    rng = np.random.RandomState(0)
    vol = jnp.asarray(rng.randn(G, C, X * Y * Z), jnp.float32)
    coords = jnp.asarray(rng.uniform(-1.2, 1.2, (G, S, 3)), jnp.float32)

    def k(v, c):
        return trilerp_gather_slab(cfirst_to_slab(v, (X, Y, Z)), (X, Y, Z),
                                   C, c, window=640)

    def x(v, c):
        return grid_sample_3d_cfirst(v, (X, Y, Z), c)

    err = float(jnp.max(jnp.abs(jax.jit(k)(vol, coords)
                                - jax.jit(x)(vol, coords))))
    gk = jax.jit(jax.grad(lambda v, c: jnp.sum(jnp.sin(k(v, c))),
                          argnums=(0, 1)))(vol, coords)
    gx = jax.jit(jax.grad(lambda v, c: jnp.sum(jnp.sin(x(v, c))),
                          argnums=(0, 1)))(vol, coords)
    gerr = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(gk, gx))

    # fused multi-level: production pyramid shapes, shared window
    spatials = [(64, 64, 8), (32, 32, 4), (16, 16, 2)]
    vols = [jnp.asarray(rng.randn(G, C, a * b * c), jnp.float32)
            for (a, b, c) in spatials]
    cs = [jnp.asarray(rng.uniform(-1.1, 1.1, (G, S, 3)), jnp.float32)
          for _ in spatials]

    def kf(vs, cc):
        slabs = [cfirst_to_slab(v, sp) for v, sp in zip(vs, spatials)]
        outs = fused_multilevel_gather(slabs, spatials, C, cc, window=1024)
        return sum(jnp.sum(jnp.sin(o)) for o in outs)

    def xf(vs, cc):
        return sum(jnp.sum(jnp.sin(grid_sample_3d_cfirst(v, sp, c)))
                   for v, sp, c in zip(vs, spatials, cc))

    vk, gkf = jax.jit(jax.value_and_grad(kf, argnums=(0, 1)))(vols, cs)
    vx, gxf = jax.jit(jax.value_and_grad(xf, argnums=(0, 1)))(vols, cs)
    ferr = abs(float(vk) - float(vx)) / max(abs(float(vx)), 1.0)
    for a, b in zip(jax.tree_util.tree_leaves(gkf),
                    jax.tree_util.tree_leaves(gxf)):
        ferr = max(ferr, float(jnp.max(jnp.abs(a - b))))
    return max(err, gerr, ferr)


_STAGE_PROGRAMS = {
    "flagship_train_step_sec": (
        "full train step (fwd+bwd+AdamW) of occformer_nusc_r50_256x704, "
        "B=1, loss fetched, donate+host-rebuild-on-retry"),
    "kitti_b7_infer_fps": (
        "full inference fwd of occformer_kitti (EffB7 1x384x1280), "
        "scalar checksum fetched"),
    "r101_infer_fps": (
        "full inference fwd of occformer_nusc_r101_896x1600 (6 cams), "
        "scalar checksum fetched"),
    "mxu_kernel_parity_max_abs_err": (
        "compiled Pallas trilerp (window=640) vs XLA grid_sample_3d_cfirst, "
        "values + table/coord grads, f32, 64x64x8 level, escape-heavy "
        "coords in [-1.2, 1.2]"),
}


def _prov(program, repeats):
    return {"program": program,
            "method": f"min of {repeats} fetch-forced device_get timings, "
                      "fresh subprocess per stage",
            "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}


def _stage_main(name):
    """Subprocess entry: compute ONE secondary metric, print one JSON line."""
    from occformer_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    fcfg = "occformer_tpu/configs/occformer_nusc_r50_256x704.py"
    try:
        if name == "flagship_train_step_sec":
            val, rep = _train_step_sec(fcfg), 4
        elif name == "kitti_b7_infer_fps":
            val, rep = _infer_fps("occformer_tpu/configs/occformer_kitti.py")[0], REPEATS
        elif name == "r101_infer_fps":
            val, rep = _infer_fps(
                "occformer_tpu/configs/occformer_nusc_r101_896x1600.py")[0], REPEATS
        elif name == "mxu_kernel_parity_max_abs_err":
            val, rep = _kernel_parity(), 1
        else:
            raise ValueError(f"unknown stage {name!r}")
        print(json.dumps({name: round(val, 4),
                          "provenance": _prov(_STAGE_PROGRAMS[name], rep)}),
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"error": f"{type(e).__name__}: {e}"}), flush=True)


def main():
    import jax

    watchdog = _arm_watchdog()
    notes = []
    extra = {}
    provenance = {}

    def emit(fps, final=False):
        """Print the full combined line with everything measured so far.
        The driver tail-parses the last JSON line, so each emission
        supersedes the previous one (VERDICT r4 #1(a))."""
        line = {
            "metric": "nusc_r50_256x704_infer_frames_per_sec_per_chip",
            "value": round(fps, 3),
            "unit": "frames/s",
            # the reference publishes no FPS; 4.5 fps is an A100 community
            # ESTIMATE (see module docstring) — labeled as such
            "vs_baseline": round(fps / A100_BASELINE_FPS, 3),
            "baseline_kind": "estimated_a100_4.5fps_community",
            **extra,
            "provenance": provenance,
            **({"notes": notes} if notes else {}),
            **({} if final else {"partial": True}),
        }
        print(json.dumps(line), flush=True)

    # Provisional line: a driver kill during the first (possibly cold)
    # compile now records an explicit in-progress failure, not nothing.
    print(json.dumps({
        "metric": "nusc_r50_256x704_infer_frames_per_sec_per_chip",
        "value": 0.0, "unit": "frames/s", "vs_baseline": 0.0,
        "error": "bench in progress — killed before the flagship "
                 "measurement completed (compile or tunnel outage)",
    }), flush=True)

    from occformer_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from __graft_entry__ import entry

    dk = jax.devices()[0].device_kind
    extra["device_kind"] = dk
    peak = next((p for s, p in PEAKS if s in dk.lower()), None)
    if peak is None:
        peak, msg = 197e12, f"unknown device_kind {dk!r}; assuming v5e peak"
        notes.append(msg)
    extra["peak_tflops_bf16"] = peak / 1e12

    # --- primary: flagship end-to-end fetch-forced rate -------------------
    fn, (variables, batch) = entry()
    jfn = jax.jit(lambda v, b: _checksum(fn(v, b)))
    variables, batch = jax.device_put((variables, batch))
    t1 = _fetch_sec(lambda: jfn(variables, batch))
    n1 = batch["imgs"].shape[0]
    fps = n1 / t1
    extra["e2e_sec_per_exec"] = round(t1, 4)
    provenance["nusc_r50_256x704_infer_frames_per_sec_per_chip"] = _prov(
        "__graft_entry__.entry() flagship inference fwd, B=1, scalar "
        "checksum of final-layer voxel scores", REPEATS)
    emit(fps)  # the primary metric lands the moment it exists

    fcfg = "occformer_tpu/configs/occformer_nusc_r50_256x704.py"
    if os.environ.get("BENCH_FAST"):
        notes.append("BENCH_FAST: secondary stages skipped")
    else:
        # --- batch-scaling slope: device compute vs per-execute overhead --
        if _remaining() > 300:
            try:
                fwdB, argsB, nB = _build_infer(fcfg, batch_size=BSLOPE)
                tB = _fetch_sec(lambda: fwdB(*argsB))
                del fwdB, argsB  # free the B-slope device buffers
                extra[f"e2e_sec_per_exec_B{BSLOPE}"] = round(tB, 4)
                provenance[f"e2e_sec_per_exec_B{BSLOPE}"] = _prov(
                    f"same flagship fwd at B={BSLOPE} (inputs perturbed "
                    "per-sample), same process as B=1", REPEATS)
                if tB > t1:
                    slope = (tB - t1) / (nB - n1)
                    extra["device_marginal_sec_per_sample"] = round(slope, 4)
                    extra["device_marginal_fps"] = round(1.0 / slope, 3)
                    if slope < t1:
                        extra["per_exec_overhead_sec"] = round(t1 - slope, 4)
                    else:
                        notes.append(
                            "batch slope >= B1 time: no fixed per-exec "
                            "overhead — the program is compute-bound and "
                            "batching scales super-linearly (probe3)")
                else:
                    notes.append(
                        f"B{BSLOPE} not slower than B1 ({tB:.3f} vs "
                        f"{t1:.3f}s) — slope unmeasurable this run")
            except Exception as e:  # noqa: BLE001
                notes.append(f"batch-slope stage failed: "
                             f"{type(e).__name__}: {e}")
            emit(fps)
        else:
            notes.append("batch-slope skipped: deadline")

        # --- analytic FLOPs (host-side) -> MFU ----------------------------
        try:
            from tools.model_analysis import analyze

            a = analyze(fcfg, train=True, fps=fps, peak=peak)
            for k in ("analytic_fwd_TFLOP_per_frame",
                      "analytic_train_TFLOP_per_step"):
                extra[k.lower()] = a[k]
            extra["e2e_mfu"] = round(
                a["analytic_fwd_TFLOP_per_frame"] * 1e12 * fps / peak, 4)
            if "device_marginal_fps" in extra:
                extra["device_marginal_mfu"] = round(
                    a["analytic_fwd_TFLOP_per_frame"] * 1e12
                    * extra["device_marginal_fps"] / peak, 4)
        except Exception as e:  # noqa: BLE001
            notes.append(f"flops stage failed: {type(e).__name__}: {e}")

        # --- secondary configs, budget-aware ------------------------------
        # Each runs in its OWN SUBPROCESS: the flagship train step needs
        # 13.1 of 15.75 GB HBM, so buffers still referenced by this process
        # (primary-stage params/batches, jit caches) must be gone — process
        # exit is the only airtight release of remote buffers, and it also
        # isolates a stage's RESOURCE_EXHAUSTED/outage from the rest.
        # The parent ALSO frees its ~1.4 GB (primary + B-slope params) now:
        # the subprocess allocates on the same chip.
        import gc
        import subprocess

        del fn, jfn, variables, batch
        getattr(jax, "clear_caches", lambda: None)()
        gc.collect()

        # need = warm-cache stage cost (executable load + repeats); the
        # round-closing ritual primes .jax_cache with these exact programs
        # so cold compiles never happen in the driver run (VERDICT r4 #1(c))
        for name, need in (("flagship_train_step_sec", 300),
                           ("kitti_b7_infer_fps", 250),
                           ("r101_infer_fps", 250),
                           ("mxu_kernel_parity_max_abs_err", 120)):
            if _remaining() < need:
                notes.append(f"{name} skipped: {_remaining():.0f}s left "
                             f"< {need}s stage budget")
                continue
            try:
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__)],
                    env={**os.environ, "BENCH_STAGE": name},
                    capture_output=True, text=True,
                    timeout=max(need, _remaining() - 120))
                line = [l for l in r.stdout.splitlines()
                        if l.startswith("{")][-1]
                got = json.loads(line)
                if "error" in got:
                    notes.append(f"{name} failed: {got['error']}")
                else:
                    extra[name] = got[name]
                    if "provenance" in got:
                        provenance[name] = got["provenance"]
            except Exception as e:  # noqa: BLE001
                notes.append(f"{name} failed: {type(e).__name__}: {e}")
            emit(fps)
        perr = extra.get("mxu_kernel_parity_max_abs_err")
        if perr is not None:
            # top-level flag (ADVICE r4): downstream consumers cannot read
            # the perf numbers without seeing a parity mismatch
            extra["mxu_kernel_parity_ok"] = bool(perr <= 1e-3)
            if perr > 1e-3:
                notes.append(f"MXU kernel ON-CHIP PARITY MISMATCH: {perr}")
        if "flagship_train_step_sec" in extra and \
                "analytic_train_tflop_per_step" in extra:
            extra["train_e2e_mfu"] = round(
                extra["analytic_train_tflop_per_step"] * 1e12
                / extra["flagship_train_step_sec"] / peak, 4)

    notes.append(
        "round-3 methodology correction: block_until_ready does not wait on "
        "this backend — rounds 1-2 fps were dispatch-rate fiction; all "
        "timings here are fetch-forced (NOTES.md, tools/bench_throughput_"
        "probe*.py). e2e includes the backend's per-execute overhead; "
        "device_marginal_* is the batch-scaling slope (hardware-"
        "representative per-sample compute).")
    watchdog.cancel()
    emit(fps, final=True)


if __name__ == "__main__":
    if os.environ.get("BENCH_STAGE"):
        _stage_main(os.environ["BENCH_STAGE"])
    else:
        main()
