"""tools/watchdog.py — the stall-kill-resume supervisor (round 5).
Uses a scripted child (no jax): first run writes progress then hangs
forever; the restarted run must receive ``--resume`` and exit 0."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import importlib.util

spec = importlib.util.spec_from_file_location(
    "watchdog", os.path.join(REPO, "tools", "watchdog.py"))
watchdog = importlib.util.module_from_spec(spec)
spec.loader.exec_module(watchdog)

CHILD = r"""
import os, sys, time
log, marker = sys.argv[1], sys.argv[2]
resumed = "--resume" in sys.argv
with open(log, "a") as f:
    f.write("line\n")
if resumed:
    sys.exit(0)          # the resumed run completes
open(marker, "w").write("hung")
time.sleep(3600)         # first run: progress once, then hang forever
"""


def test_stall_triggers_kill_and_resume_completes(tmp_path):
    child = tmp_path / "child.py"
    child.write_text(CHILD)
    log = tmp_path / "progress.jsonl"
    marker = tmp_path / "hung.marker"
    msgs = []
    rc = watchdog.run_supervised(
        [sys.executable, str(child), str(log), str(marker)],
        watch=str(log), stall_secs=2.0, poll_secs=0.5,
        warmup_mult=1.0, max_restarts=2,
        log=lambda *a, **k: msgs.append(a[0]))
    assert rc == 0
    assert marker.exists()                      # first run really hung
    assert log.read_text().count("line") == 2   # both runs progressed
    assert any("SIGKILL" in m for m in msgs)
    assert any("--resume" in m for m in msgs)


def test_clean_failure_is_not_restarted(tmp_path):
    child = tmp_path / "bad.py"
    child.write_text("import sys; sys.exit(3)\n")
    log = tmp_path / "log"
    msgs = []
    rc = watchdog.run_supervised(
        [sys.executable, str(child), str(log)],
        watch=str(log), stall_secs=2.0, poll_secs=0.2,
        warmup_mult=1.0, max_restarts=5,
        log=lambda *a, **k: msgs.append(a[0]))
    assert rc == 3
    assert sum("launch" in m for m in msgs) == 1  # no blind restarts


def test_resume_flag_is_idempotent():
    assert watchdog._with_resume(["x", "--resume"]) == ["x", "--resume"]
    assert watchdog._with_resume(["x"]) == ["x", "--resume"]


def test_rss_log_written(tmp_path):
    child = tmp_path / "ok.py"
    child.write_text(
        "import sys, time\nopen(sys.argv[1],'a').write('x\\n')\n"
        "time.sleep(1.2)\n")
    log = tmp_path / "log"
    rss = tmp_path / "rss.jsonl"
    rc = watchdog.run_supervised(
        [sys.executable, str(child), str(log)],
        watch=str(log), stall_secs=5.0, poll_secs=0.4,
        warmup_mult=1.0, rss_log=str(rss), rss_phase="pretrain",
        log=lambda *a, **k: None)
    assert rc == 0
    recs = [json.loads(x) for x in rss.read_text().splitlines()]
    assert recs and recs[0]["phase"] == "pretrain_wd0"
    assert recs[0]["rss_mb"] != 0
