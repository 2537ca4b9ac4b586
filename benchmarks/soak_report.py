#!/usr/bin/env python
"""Summarize a benchmarks/soak.py run into one committed JSON
(round-4 verdict #2 'done' criteria): training curves, step-time trend
across hours (drift/leak detection), host RSS trend, eval history,
checkpoint-rotation and best-PSNR continuity checks.

    python benchmarks/soak_report.py --soak_dir /tmp/soak_r5 \
        [--out benchmarks/soak_r5.json]

Pure log parsing — no TPU, no model code.
"""

import argparse
import json
import os


def _read_jsonl(path):
    if not os.path.exists(path):
        return []
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out


def _quartile_trend(recs, key="steps_per_s"):
    """Median of ``key`` per quarter of the run + first-to-last drift."""
    vals = [r[key] for r in recs if key in r]
    # Drop the compile-polluted first window.
    vals = vals[1:] if len(vals) > 4 else vals
    if len(vals) < 4:
        return {"n_windows": len(vals)}
    q = max(1, len(vals) // 4)

    def med(xs):
        xs = sorted(xs)
        return xs[len(xs) // 2]

    quarters = [round(med(vals[i * q:(i + 1) * q]), 3) for i in range(4)]
    return {"n_windows": len(vals), "quartile_median": quarters,
            "drift_pct": round(100.0 * (quarters[3] - quarters[0])
                               / quarters[0], 2)}


def _downsample(recs, keys, n=40):
    """At most ``n`` evenly-spaced curve points with the given keys."""
    recs = [r for r in recs if any(k in r for k in keys)]
    if not recs:
        return []
    stride = max(1, len(recs) // n)
    picked = recs[::stride]
    if picked[-1] is not recs[-1]:
        picked.append(recs[-1])
    return [{k: r[k] for k in ("step",) + tuple(keys) if k in r}
            for r in picked]


def _phase_summary(ckpt_dir, jsonl_name, keep_snapshots):
    recs = _read_jsonl(os.path.join(ckpt_dir, jsonl_name))
    train = [r for r in recs if "steps_per_s" in r]
    evals = [r for r in recs if "val_psnr" in r or "val_pi" in r]
    steps = max((r.get("step", 0) for r in recs), default=0)
    snap_dirs = sorted(d for d in os.listdir(ckpt_dir)
                       if d.startswith("step_")) if os.path.isdir(
                           ckpt_dir) else []
    out = {
        "steps": steps,
        "throughput_trend": _quartile_trend(train),
        "loss_curve": _downsample(train, ("l1", "psnr", "g_loss",
                                          "d_loss", "steps_per_s")),
        "eval_history": [{k: r[k] for k in
                          ("step", "val_psnr", "val_ssim", "val_pi")
                          if k in r} for r in evals],
        "snapshot_dirs": snap_dirs,
        "rotation_ok": len(snap_dirs) <= keep_snapshots,
        "has_best": os.path.isdir(os.path.join(ckpt_dir, "best")),
    }
    psnrs = [r["val_psnr"] for r in evals if "val_psnr" in r]
    if psnrs:
        out["first_val_psnr"] = round(psnrs[0], 3)
        out["best_val_psnr"] = round(max(psnrs), 3)
        out["last_val_psnr"] = round(psnrs[-1], 3)
    return out


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--soak_dir", default="/tmp/soak_r5")
    p.add_argument("--keep_snapshots", type=int, default=5)
    p.add_argument("--out", default="")
    args = p.parse_args()

    rss = _read_jsonl(os.path.join(args.soak_dir, "rss.jsonl"))
    rss_by_phase = {}
    for r in rss:
        rss_by_phase.setdefault(r["phase"], []).append(r["rss_mb"])
    rss_trend = {
        ph: {"first_mb": vals[0], "peak_mb": max(vals),
             "last_mb": vals[-1], "samples": len(vals),
             "growth_last_half_mb": round(
                 vals[-1] - vals[len(vals) // 2], 1)}
        for ph, vals in rss_by_phase.items() if vals}

    report = {
        "metric": "soak",
        "pretrain": _phase_summary(
            os.path.join(args.soak_dir, "pretrain"), "pretrain.jsonl",
            args.keep_snapshots),
        "gan": _phase_summary(
            os.path.join(args.soak_dir, "gan"), "train.jsonl",
            args.keep_snapshots),
        "rss_trend": rss_trend,
    }
    # Resume continuity: the pretrain JSONL must be monotone in step
    # with no gap larger than one epoch after the crash injection
    # (duplicated windows around the resume point are expected — the
    # resumed leg re-logs from the restored step).
    pre = _read_jsonl(os.path.join(args.soak_dir, "pretrain",
                                   "pretrain.jsonl"))
    steps = [r["step"] for r in pre if "steps_per_s" in r]
    report["pretrain"]["resume_step_sequence_ok"] = bool(
        steps and steps[-1] == max(steps))

    txt = json.dumps(report, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(txt + "\n")
        print(f"wrote {args.out}")
    print(txt)
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
