"""benchmarks/soak_report.py parsing — the long-soak summarizer
(round-4 verdict #2) is pure log parsing, so its trend/continuity
logic is testable without a soak: synthesize ckpt dirs + JSONL logs
and check every derived field the committed soak_r5.json relies on.
"""

import importlib.util
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def soak_report():
    spec = importlib.util.spec_from_file_location(
        "soak_report", os.path.join(REPO, "benchmarks", "soak_report.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_jsonl(path, recs):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")


def test_quartile_trend_detects_drift(soak_report):
    # 41 windows (first is dropped as compile-polluted), linear slowdown
    # 10.0 -> 8.0: drift must come out negative and ~-17% (quartile
    # medians of the post-drop tail, not the endpoints).
    recs = [{"steps_per_s": 10.0 - 2.0 * i / 40} for i in range(41)]
    t = soak_report._quartile_trend(recs)
    assert t["n_windows"] == 40
    assert t["quartile_median"][0] > t["quartile_median"][3]
    assert -25.0 < t["drift_pct"] < -10.0

    flat = [{"steps_per_s": 11.3} for _ in range(20)]
    assert soak_report._quartile_trend(flat)["drift_pct"] == 0.0


def test_quartile_trend_short_run(soak_report):
    t = soak_report._quartile_trend([{"steps_per_s": 1.0}] * 3)
    assert t == {"n_windows": 3}


def test_downsample_keeps_endpoints(soak_report):
    recs = [{"step": i, "l1": float(i)} for i in range(1000)]
    out = soak_report._downsample(recs, ("l1",), n=40)
    assert len(out) <= 42
    assert out[0]["step"] == 0 and out[-1]["step"] == 999
    assert all(set(r) <= {"step", "l1"} for r in out)


def test_phase_summary_and_resume_continuity(soak_report, tmp_path):
    ckpt = tmp_path / "pretrain"
    # Train windows with a resume overlap (step 700 logged twice: the
    # killed leg reached 900, the resumed leg re-logs from 700) and a
    # final leg past the crash point — the report only requires the
    # sequence to END at its max step.
    steps = list(range(100, 1000, 100)) + list(range(700, 1600, 100))
    recs = [{"step": s, "steps_per_s": 11.0, "l1": 0.05, "psnr": 30.0}
            for s in steps]
    recs.insert(4, {"step": 400, "val_psnr": 31.5, "val_ssim": 0.9,
                    "val_pi": 6.2})
    recs.append({"step": 1500, "val_psnr": 33.0, "val_pi": 5.9})
    _write_jsonl(str(ckpt / "pretrain.jsonl"), recs)
    for s in (1100, 1300, 1500):
        (ckpt / f"step_{s}").mkdir()
    (ckpt / "best").mkdir()

    out = soak_report._phase_summary(str(ckpt), "pretrain.jsonl",
                                     keep_snapshots=5)
    assert out["steps"] == 1500
    assert out["rotation_ok"] and out["has_best"]
    assert out["snapshot_dirs"] == ["step_1100", "step_1300", "step_1500"]
    assert out["first_val_psnr"] == 31.5
    assert out["best_val_psnr"] == 33.0 == out["last_val_psnr"]
    assert {e["step"] for e in out["eval_history"]} == {400, 1500}

    # Rotation violation: more step dirs than keep_snapshots.
    assert not soak_report._phase_summary(
        str(ckpt), "pretrain.jsonl", keep_snapshots=2)["rotation_ok"]


def test_phase_summary_missing_dir(soak_report, tmp_path):
    out = soak_report._phase_summary(
        str(tmp_path / "nope"), "train.jsonl", keep_snapshots=5)
    assert out["steps"] == 0 and out["snapshot_dirs"] == []
    assert "first_val_psnr" not in out


def test_cli_end_to_end(soak_report, tmp_path, capsys, monkeypatch):
    soak = tmp_path / "soak"
    _write_jsonl(str(soak / "pretrain" / "pretrain.jsonl"),
                 [{"step": s, "steps_per_s": 10.0, "l1": 0.1}
                  for s in range(50, 550, 50)])
    _write_jsonl(str(soak / "gan" / "train.jsonl"),
                 [{"step": s, "steps_per_s": 4.2, "g_loss": 1.0,
                   "d_loss": 0.5} for s in range(50, 250, 50)])
    _write_jsonl(str(soak / "rss.jsonl"),
                 [{"t_s": 20.0 * i, "phase": "pretrain",
                   "rss_mb": 4000.0 + i} for i in range(10)])
    out_path = tmp_path / "soak.json"
    monkeypatch.setattr(sys, "argv", [
        "soak_report.py", "--soak_dir", str(soak),
        "--out", str(out_path)])
    assert soak_report.main() == 0
    rep = json.loads(out_path.read_text())
    assert rep["pretrain"]["steps"] == 500
    assert rep["gan"]["steps"] == 200
    assert rep["pretrain"]["resume_step_sequence_ok"]
    assert rep["rss_trend"]["pretrain"]["samples"] == 10
    assert rep["rss_trend"]["pretrain"]["growth_last_half_mb"] == 4.0
