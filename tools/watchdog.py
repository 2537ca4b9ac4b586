#!/usr/bin/env python
"""Progress watchdog for long training runs (round 5).

Failure mode it exists for, observed twice on this session's tunneled
TPU: the remote transfer client silently loses its connection and the
training process blocks FOREVER on the next device op — no exception,
no exit, no log line.  Interrupt-checkpointing (loop.py) cannot fire
because the process never returns from the runtime call; only an
external supervisor can recover.  This is the SURVEY.md §5.3 failure-
detection story at the process level: liveness = the metrics JSONL
advancing, recovery = SIGKILL + relaunch with ``--resume`` (training
continues from the newest snapshot on fresh data — loop.py folds the
restored step into the stream seed).

    python tools/watchdog.py --watch <ckpt>/pretrain.jsonl \
        [--stall-secs 300] [--max-restarts 10] [--rss-log rss.jsonl]
        [--rss-phase pretrain] -- python train.py --phase pretrain ...

Behavior:
  * launches the command; polls the watched file's size/mtime;
  * if the file does not grow for --stall-secs, SIGKILLs the process
    tree and relaunches with ``--resume`` appended (once, idempotent);
  * child exits 0 -> watchdog exits 0;
  * child exits non-zero WITHOUT a stall -> real failure, exit with
    the child's code (no blind restarts of crashing configs);
  * optional RSS sampling to a JSONL (the soak harness's format).

The grace period before the first poll is --stall-secs * --warmup-mult
(default 4x): cold starts legitimately spend minutes in compile/restore
before the first window lands.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time


def _file_state(path: str):
    try:
        st = os.stat(path)
        return st.st_size, st.st_mtime
    except OSError:
        return (-1, -1.0)


def _rss_mb(pid: int) -> float:
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        pass
    return -1.0


def _with_resume(cmd):
    return cmd if "--resume" in cmd else list(cmd) + ["--resume"]


def run_supervised(cmd, watch: str, stall_secs: float = 300.0,
                   max_restarts: int = 10, poll_secs: float = 10.0,
                   warmup_mult: float = 4.0, rss_log: str = "",
                   rss_phase: str = "train", log=print) -> int:
    """Supervise ``cmd``; returns the final exit code (0 on success)."""
    restarts = 0
    while True:
        run_cmd = cmd if restarts == 0 else _with_resume(cmd)
        log(f"[watchdog] launch (restart {restarts}): "
            f"{' '.join(run_cmd)}", flush=True)
        proc = subprocess.Popen(run_cmd)
        deadline = time.time() + stall_secs * warmup_mult
        last = _file_state(watch)
        stalled = False
        rss_f = open(rss_log, "a") if rss_log else None
        t0 = time.time()
        try:
            while True:
                rc = proc.poll()
                if rc is not None:
                    break
                time.sleep(poll_secs)
                if rss_f:
                    rss_f.write(json.dumps({
                        "t_s": round(time.time() - t0, 1),
                        "phase": f"{rss_phase}_wd{restarts}",
                        "rss_mb": round(_rss_mb(proc.pid), 1)}) + "\n")
                    rss_f.flush()
                cur = _file_state(watch)
                if cur != last:
                    last = cur
                    deadline = time.time() + stall_secs
                elif time.time() > deadline:
                    stalled = True
                    log(f"[watchdog] no progress on {watch} for "
                        f"{stall_secs:.0f}s — SIGKILL pid {proc.pid}",
                        flush=True)
                    proc.send_signal(signal.SIGKILL)
                    proc.wait()
                    rc = proc.returncode
                    break
        finally:
            if rss_f:
                rss_f.close()
        if not stalled:
            if rc == 0:
                log("[watchdog] run completed", flush=True)
                return 0
            log(f"[watchdog] run FAILED rc={rc} without stalling — "
                "not restarting", flush=True)
            return rc
        restarts += 1
        if restarts > max_restarts:
            log(f"[watchdog] gave up after {max_restarts} restarts",
                flush=True)
            return 75  # EX_TEMPFAIL
        time.sleep(5.0)  # let the device lease drain


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--watch", required=True,
                   help="file whose growth proves liveness (JSONL log)")
    p.add_argument("--stall-secs", type=float, default=300.0)
    p.add_argument("--max-restarts", type=int, default=10)
    p.add_argument("--poll-secs", type=float, default=10.0)
    p.add_argument("--warmup-mult", type=float, default=4.0)
    p.add_argument("--rss-log", default="")
    p.add_argument("--rss-phase", default="train")
    p.add_argument("cmd", nargs=argparse.REMAINDER,
                   help="-- then the training command")
    args = p.parse_args(argv)
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        p.error("no command given (put it after --)")
    return run_supervised(cmd, args.watch, args.stall_secs,
                          args.max_restarts, args.poll_secs,
                          args.warmup_mult, args.rss_log, args.rss_phase)


if __name__ == "__main__":
    sys.exit(main())
