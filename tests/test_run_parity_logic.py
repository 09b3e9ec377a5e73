"""Verdict logic of tools/run_parity.py (the full flow needs real data +
released .pth files; the convert and eval stages it chains are covered by
tests/test_cli_integration.py and tests/test_key_manifest.py).  These tests
stub the two subprocess stages and pin the part most likely to be silently
wrong when real data finally arrives: the percent-vs-fraction scaling of the
metric comparison, the tolerance gate, and smoke mode's non-enforcement."""
import importlib.util
import json
import os
import subprocess
import sys
import types

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_run_parity():
    spec = importlib.util.spec_from_file_location(
        "run_parity", os.path.join(REPO, "tools", "run_parity.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _fake_run(metrics):
    """subprocess.run stand-in: convert succeeds; eval prints a table line
    then the metrics dict as its final JSON line (tools/test.py contract)."""

    def run(cmd, check=True, cwd=None, stdout=None, text=None):
        out = "| metric | value |\n" + json.dumps(metrics) + "\n"
        return types.SimpleNamespace(returncode=0, stdout=out)

    return run


def _invoke(mod, monkeypatch, capsys, metrics, argv):
    monkeypatch.setattr(subprocess, "run", _fake_run(metrics))
    monkeypatch.setattr(sys, "argv", ["run_parity.py"] + argv)
    mod.main()
    return capsys.readouterr().out


CFG = "occformer_tpu/configs/occformer_nusc_r50_256x704.py"


@pytest.mark.quick
def test_pass_within_tolerance(monkeypatch, capsys):
    mod = _load_run_parity()
    # eval emits FRACTIONS (cm_to_ious); reference table is percent
    out = _invoke(mod, monkeypatch, capsys,
                  {"nuScenes_lidarseg_mean": 0.679}, [CFG, "weights.pth"])
    assert "got 67.90 vs reference 68.10" in out
    assert "[parity] PASS" in out


def test_fail_outside_tolerance(monkeypatch, capsys):
    mod = _load_run_parity()
    with pytest.raises(SystemExit) as e:
        _invoke(mod, monkeypatch, capsys,
                {"nuScenes_lidarseg_mean": 0.65}, [CFG, "weights.pth"])
    assert "FAILED" in str(e.value)
    assert "65.00 vs 68.10" in str(e.value)


def test_smoke_mode_reports_without_enforcing(monkeypatch, capsys):
    mod = _load_run_parity()
    out = _invoke(mod, monkeypatch, capsys,
                  {"nuScenes_lidarseg_mean": 0.30},
                  [CFG, "weights.pth", "--max-samples", "5"])
    assert "informational only" in out
    assert "FAIL" in out  # still reported per-metric


def test_kitti_checks_both_headline_metrics(monkeypatch, capsys):
    mod = _load_run_parity()
    out = _invoke(mod, monkeypatch, capsys,
                  {"semkitti_SC_IoU": 0.3650, "semkitti_SSC_mIoU": 0.1348},
                  ["occformer_tpu/configs/occformer_kitti.py", "w.pth"])
    assert "semkitti_SC_IoU: got 36.50 vs reference 36.42" in out
    assert "semkitti_SSC_mIoU: got 13.48 vs reference 13.50" in out
    assert "[parity] PASS" in out


def test_missing_metric_fails(monkeypatch, capsys):
    mod = _load_run_parity()
    with pytest.raises(SystemExit) as e:
        _invoke(mod, monkeypatch, capsys, {"something_else": 1.0},
                [CFG, "weights.pth"])
    assert "missing from eval output" in str(e.value)
