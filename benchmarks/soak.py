#!/usr/bin/env python
"""Long-horizon two-phase flagship soak (round-4 verdict #2).

Every training claim before round 5 was <= 12k steps; the reference's
defining workflow is a to-convergence run (SURVEY.md §2 item 7: LR
decay schedule, periodic validation, checkpoint per epoch/best).  This
harness runs the REAL ``train.py`` CLI (subprocesses, not an in-process
mirror) through the full production recipe at flagship width over the
DIV2K-volume disk corpus:

  phase 1  L1 pretrain, SOAK_EPOCHS x 1000 steps (default 50k steps),
           LR staircase (halve every SOAK_LR_STEP epochs), EMA,
           PIRM self-validation every SOAK_EVAL_EVERY epochs,
           snapshot every 2 epochs with --keep_snapshots rotation,
           and ONE mid-run SIGKILL + ``--resume`` (crash recovery from
           the last rotated snapshot, not the interrupt save).
  phase 2  GAN fine-tune from phase 1 (SOAK_GAN_EPOCHS x 1000 steps,
           default 10k), the committed flagship recipe
           (RSGAN, alpha_l1 20 / alpha_vgg 100 / alpha_gan 0.1,
           VGG22 via demo/vgg_synthetic, --ema_decay 0.999).

Alongside, a sampler thread records the train process's host RSS every
SOAK_RSS_EVERY seconds (leak detection over hours).

The run writes everything under $SOAK_DIR (default /tmp/soak_r5); the
committed summary (training curves, step-time trend, RSS trend, eval
history, rotation/best-PSNR continuity checks) is produced by
``benchmarks/soak_report.py`` and saved as benchmarks/soak_r5.json.

Env: SOAK_DIR, SOAK_CORPUS, SOAK_EPOCHS (50), SOAK_GAN_EPOCHS (10),
SOAK_KILL_AFTER_S (1200; 0 = no kill), SOAK_EVAL_EVERY (5),
SOAK_LR_STEP (20), SOAK_BLOCKS/SOAK_CHANNELS (32/256),
SOAK_NUM_VALIDS (4).
"""

import json
import os
import signal
import subprocess
import sys
import time


def _rss_mb(pid: int) -> float:
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        pass
    return -1.0


def run_phase(cmd, log_path: str, rss_path: str, phase: str,
              kill_after_s: float = 0.0, rss_every: float = 20.0):
    """Run one train.py invocation; sample RSS; optionally SIGKILL it
    after ``kill_after_s``.  Returns (returncode, killed)."""
    t0 = time.time()
    with open(log_path, "a") as log, open(rss_path, "a") as rssf:
        proc = subprocess.Popen(cmd, stdout=log, stderr=log)
        killed = False
        while proc.poll() is None:
            time.sleep(rss_every)
            now = time.time() - t0
            rssf.write(json.dumps({
                "t_s": round(now, 1), "phase": phase,
                "rss_mb": round(_rss_mb(proc.pid), 1)}) + "\n")
            rssf.flush()
            if kill_after_s and not killed and now >= kill_after_s:
                print(f"[soak] SIGKILL {phase} at t={now:.0f}s "
                      "(crash-recovery injection)", flush=True)
                proc.send_signal(signal.SIGKILL)
                killed = True
        return proc.returncode, killed


def main() -> int:
    here = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.dirname(here)

    soak_dir = os.environ.get("SOAK_DIR", "/tmp/soak_r5")
    corpus = os.environ.get("SOAK_CORPUS", "/tmp/div2k_synth")
    epochs = int(os.environ.get("SOAK_EPOCHS", "50"))
    gan_epochs = int(os.environ.get("SOAK_GAN_EPOCHS", "10"))
    kill_after = float(os.environ.get("SOAK_KILL_AFTER_S", "1200"))
    eval_every = os.environ.get("SOAK_EVAL_EVERY", "5")
    lr_step = os.environ.get("SOAK_LR_STEP", "20")
    blocks = os.environ.get("SOAK_BLOCKS", "32")
    channels = os.environ.get("SOAK_CHANNELS", "256")
    num_valids = os.environ.get("SOAK_NUM_VALIDS", "4")

    os.makedirs(soak_dir, exist_ok=True)
    rss_path = os.path.join(soak_dir, "rss.jsonl")
    log_path = os.path.join(soak_dir, "soak.log")
    pre_ckpt = os.path.join(soak_dir, "pretrain")
    gan_ckpt = os.path.join(soak_dir, "gan")

    common = [
        sys.executable, os.path.join(repo, "train.py"),
        "--num_blocks", blocks, "--num_channels", channels,
        "--batch_size", "16", "--patch_size", "48", "--scale", "4",
        "--data_root", corpus, "--train_dataset", "DIV2K",
        "--valid_dataset", "div2k_val", "--num_valids", num_valids,
        "--lr_step", lr_step, "--ema_decay", "0.999",
        "--eval_every", eval_every, "--snapshot_every", "2",
        "--keep_snapshots", "5", "--log_every", "50",
    ]

    # ---- phase 1: pretrain with one crash injection ----
    pre = common + ["--phase", "pretrain", "--num_epochs", str(epochs),
                    "--check_point", pre_ckpt]
    print(f"[soak] pretrain: {epochs} epochs -> {pre_ckpt}", flush=True)
    rc, killed = run_phase(pre, log_path, rss_path, "pretrain",
                           kill_after_s=kill_after)
    print(f"[soak] pretrain first leg rc={rc} killed={killed}",
          flush=True)
    if killed:
        print("[soak] resuming from last rotated snapshot", flush=True)
        rc, _ = run_phase(pre + ["--resume"], log_path, rss_path,
                          "pretrain_resume")
        print(f"[soak] pretrain resume leg rc={rc}", flush=True)
    if rc != 0:
        print(f"[soak] PRETRAIN FAILED rc={rc} — see {log_path}")
        return rc or 1

    # ---- phase 2: GAN fine-tune (committed flagship recipe) ----
    gan = common + [
        "--phase", "train", "--num_epochs", str(gan_epochs),
        "--check_point", gan_ckpt,
        "--pretrained_model", pre_ckpt,
        "--gan_type", "RSGAN", "--alpha_l1", "20.0",
        "--alpha_vgg", "100.0", "--alpha_gan", "0.1",
        "--vgg_layer", "22",
        "--vgg_weights", os.path.join(repo, "demo", "vgg_synthetic"),
    ]
    print(f"[soak] GAN: {gan_epochs} epochs -> {gan_ckpt}", flush=True)
    rc, _ = run_phase(gan, log_path, rss_path, "gan")
    print(f"[soak] GAN leg rc={rc}", flush=True)
    if rc != 0:
        print(f"[soak] GAN FAILED rc={rc} — see {log_path}")
        return rc or 1

    print(f"[soak] done — summarize with: python {here}/soak_report.py "
          f"--soak_dir {soak_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
