"""CLI integration: tools/train.py + tools/test.py on the synthetic config."""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = os.path.join(REPO, "occformer_tpu", "configs", "synthetic_tiny.py")


@pytest.mark.slow
def test_train_cli_two_steps(tmp_path):
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train.py"), CFG,
         "--work-dir", str(tmp_path), "--max-steps", "2", "--cpu"],
        capture_output=True, text=True, timeout=1500, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "training done" in r.stdout
    ckpts = os.path.join(str(tmp_path), "ckpts")
    assert os.path.isdir(ckpts) and os.listdir(ckpts)


@pytest.mark.slow
def test_train_cli_resume(tmp_path):
    """Auto-resume from the latest checkpoint in the work dir
    (reference --resume-from semantics, apis/mmdet_train.py:195-198)."""
    # under pytest the subprocess inherits the 8-device XLA_FLAGS from
    # conftest -> batch 8 -> only 2 steps/epoch, so give the schedule
    # enough epochs that step 4 exists
    args = [sys.executable, os.path.join(REPO, "tools", "train.py"), CFG,
            "--work-dir", str(tmp_path), "--cpu",
            "--cfg-options", "runner.max_epochs=4"]
    r = subprocess.run(args + ["--max-steps", "2"], capture_output=True,
                       text=True, timeout=1500, cwd=REPO)
    assert r.returncode == 0, r.stderr[-3000:]
    r2 = subprocess.run(args + ["--max-steps", "4"], capture_output=True,
                        text=True, timeout=1500, cwd=REPO)
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert "resumed from" in r2.stdout and "at step 2" in r2.stdout
    assert "training done at step 4" in r2.stdout


@pytest.mark.slow
def test_test_cli_synthetic(tmp_path):
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "test.py"), CFG,
         "--max-samples", "2", "--cpu"],
        capture_output=True, text=True, timeout=1500, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "nuScenes_lidarseg_mean" in r.stdout


@pytest.mark.slow
def test_export_cli_stablehlo(tmp_path):
    out = os.path.join(str(tmp_path), "tiny.stablehlo")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "export_model.py"), CFG,
         "--out", out, "--cpu", "--verify"],
        capture_output=True, text=True, timeout=1500, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "verify: output" in r.stdout
    assert os.path.getsize(out) > 1e5


@pytest.mark.slow
def test_train_cli_sigterm_checkpoint(tmp_path):
    """SIGTERM mid-training saves a checkpoint and exits cleanly."""
    import signal
    import time

    proc = subprocess.Popen(
        [sys.executable, "-u", os.path.join(REPO, "tools", "train.py"), CFG,
         "--work-dir", str(tmp_path), "--cpu",
         "--cfg-options", "log_config.interval=1", "runner.max_epochs=50"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, cwd=REPO,
    )
    try:
        # wait for the first logged step, then request a graceful stop
        deadline = time.time() + 1200
        saw_step = False
        while time.time() < deadline:
            line = proc.stdout.readline()
            if '"step": 1' in line:
                saw_step = True
                break
        assert saw_step, "never saw a training step"
        proc.send_signal(signal.SIGTERM)
        out, err = proc.communicate(timeout=600)
        assert proc.returncode == 0, err[-3000:]
        assert "preempted: checkpoint saved at step" in out
        ckpts = os.path.join(str(tmp_path), "ckpts")
        assert os.path.isdir(ckpts) and os.listdir(ckpts)
    finally:
        if proc.poll() is None:
            proc.kill()


@pytest.mark.slow
def test_submission_write_and_validate(tmp_path):
    """tools/test.py --test-save writes a nuScenes lidarseg submission that
    tools/validate_submission.py accepts (reference apis/utils.py:112-134 +
    validate_lidarseg_submission.py roundtrip)."""
    sub = os.path.join(str(tmp_path), "sub")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "test.py"), CFG,
         "--max-samples", "2", "--cpu", "--test-save", sub],
        capture_output=True, text=True, timeout=1500, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.isfile(os.path.join(sub, "test", "submission.json"))
    r2 = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "validate_submission.py"),
         "nusc", sub],
        capture_output=True, text=True, timeout=300, cwd=REPO,
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "submission valid" in r2.stdout


@pytest.mark.slow
def test_train_cli_load_from(tmp_path):
    """cfg/CLI load_from initializes model weights from a converted
    {'params','batch_stats'} checkpoint (step stays 0), mmdet semantics."""
    # first run writes full-TrainState checkpoints; strip one down to the
    # converted format convert_checkpoint.py emits
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train.py"), CFG,
         "--work-dir", str(tmp_path / "w1"), "--max-steps", "1", "--cpu"],
        capture_output=True, text=True, timeout=1500, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-3000:]

    import numpy as np
    from occformer_tpu.engine.checkpoint import (
        latest_checkpoint, load_checkpoint, save_checkpoint,
    )
    import orbax.checkpoint as ocp

    full = ocp.StandardCheckpointer().restore(
        latest_checkpoint(str(tmp_path / "w1" / "ckpts")))
    weights = {"params": full["params"], "batch_stats": full["batch_stats"]}
    save_checkpoint(str(tmp_path / "conv"), weights, 0)

    r2 = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train.py"), CFG,
         "--work-dir", str(tmp_path / "w2"), "--max-steps", "1", "--cpu",
         "--load-from", str(tmp_path / "conv")],
        capture_output=True, text=True, timeout=1500, cwd=REPO,
    )
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert "loaded model weights from" in r2.stdout
    # training starts at step 0 (load_from is not resume)
    assert "training done at step 1" in r2.stdout

    # missing path: warn and continue from random init
    r3 = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train.py"), CFG,
         "--work-dir", str(tmp_path / "w3"), "--max-steps", "1", "--cpu",
         "--load-from", str(tmp_path / "nope")],
        capture_output=True, text=True, timeout=1500, cwd=REPO,
    )
    assert r3.returncode == 0, r3.stderr[-3000:]
    assert "not found" in r3.stdout
