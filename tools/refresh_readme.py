"""Regenerate README.md's auto-generated status block (round-4 verdict
next #6).

The README's front-door numbers (test counts, headline bench, latency)
went stale three rounds running when maintained by hand.  They now live
in ONE marked block that this script regenerates from reality:

  * test counts — live ``pytest --collect-only`` collection;
  * headline throughput — the newest committed ``BENCH_r*.json``
    (driver-written ground truth);
  * single-image latency — the newest ``benchmarks/latency_r*.json``.

``tests/test_docs_fresh.py`` re-derives the same block inside every
full-suite run and fails when the README text diverges — the counts
can never silently rot again.  Usage:

    python tools/refresh_readme.py          # rewrite README.md
    python tools/refresh_readme.py --check  # exit 1 if stale
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEGIN = "<!-- AUTOGEN:STATUS (python tools/refresh_readme.py) -->"
END = "<!-- /AUTOGEN:STATUS -->"


def _latest(pattern: str):
    """Newest round-numbered file matching ``pattern`` (capture group 1
    is the round number); returns (path, round) or (None, None)."""
    best, best_n = None, -1
    for p in glob.glob(os.path.join(REPO, pattern)):
        m = re.search(r"_r(\d+)\.json$", p)
        if m and int(m.group(1)) > best_n:
            best, best_n = p, int(m.group(1))
    return best, (best_n if best else None)


def bench_sources() -> dict:
    """The perf facts the block quotes, each tagged with its source
    file so the freshness test can verify quote == file exactly."""
    out = {}
    bench, n = _latest("BENCH_r*.json")
    if bench:
        d = json.load(open(bench)).get("parsed") or {}
        paths = d.get("paths", {})
        out["bench"] = {
            "file": os.path.basename(bench), "round": n,
            "int8": paths.get("int8-w8a8", {}).get("value"),
            "int8_vs": paths.get("int8-w8a8", {}).get("vs_baseline"),
            "bf16": paths.get("bf16", {}).get("value"),
        }
    lat, n = _latest("benchmarks/latency_r*.json")
    if lat:
        d = json.load(open(lat))["single_chip"]
        out["latency"] = {
            "file": "benchmarks/" + os.path.basename(lat), "round": n,
            "int8_ms": d["paths"]["int8-w8a8"]["ms_best"],
            "bf16_ms": d["paths"]["bf16"]["ms_best"],
            "model": d["model"], "hr_mpx": d["hr_megapixels"],
        }
    return out


def build_status_block(fast: int, slow: int) -> str:
    """The canonical status block for (fast, slow) test counts plus the
    newest committed bench/latency JSONs.  Shared verbatim by the
    refresh script and tests/test_docs_fresh.py."""
    src = bench_sources()
    lines = [BEGIN,
             f"- **Test suite**: {fast} fast + {slow} slow = "
             f"{fast + slow} tests (live pytest collection, checked by "
             f"`tests/test_docs_fresh.py`)."]
    b = src.get("bench")
    if b and b["int8"] is not None:
        lines.append(
            f"- **Headline bench**: {b['int8']:.1f} MP/s/chip int8 W8A8 "
            f"({b['int8_vs']:.2f}x the 50 MP/s contract), "
            f"{b['bf16']:.1f} MP/s bf16 — `{b['file']}` (the dev chip "
            f"drifts ±20% across hours; BASELINE.md has the sweep).")
    la = src.get("latency")
    if la:
        lines.append(
            f"- **Single-image latency**: {la['int8_ms']:.1f} ms int8 / "
            f"{la['bf16_ms']:.1f} ms bf16 for one {la['hr_mpx']:.1f} MP "
            f"x4 output at batch 1 ({la['model']} model) — "
            f"`{la['file']}`.")
    lines.append(END)
    return "\n".join(lines)


def _collect_count(extra: list) -> int:
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only",
         "-q", *extra],
        cwd=REPO, capture_output=True, text=True, check=True)
    # "N/M tests collected (K deselected)" first — its tail also
    # matches the plain pattern and would return M instead of N.
    m = re.search(r"(\d+)/\d+ tests collected", out.stdout)
    if not m:
        m = re.search(r"(\d+) tests? collected", out.stdout)
    if not m:
        raise RuntimeError(f"cannot parse collection count:\n"
                           f"{out.stdout[-2000:]}")
    return int(m.group(1))


def refresh(check_only: bool = False) -> int:
    total = _collect_count(["-m", ""])
    fast = _collect_count([])  # default addopts: -m 'not slow'
    block = build_status_block(fast, total - fast)
    readme_path = os.path.join(REPO, "README.md")
    text = open(readme_path).read()
    pat = re.compile(re.escape(BEGIN) + r".*?" + re.escape(END),
                     re.DOTALL)
    if not pat.search(text):
        raise SystemExit(f"README.md has no {BEGIN} block")
    new = pat.sub(block.replace("\\", r"\\"), text)
    if check_only:
        if new != text:
            print("README status block is STALE; run "
                  "python tools/refresh_readme.py")
            return 1
        print("README status block is fresh")
        return 0
    open(readme_path, "w").write(new)
    print(f"README status block refreshed: {fast} fast + "
          f"{total - fast} slow")
    return 0


if __name__ == "__main__":
    raise SystemExit(refresh(check_only="--check" in sys.argv[1:]))
