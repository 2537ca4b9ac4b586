"""Front-door documentation freshness (round-4 verdict next #6).

The README's test counts went stale three rounds running because they
were maintained by hand.  This test re-derives the auto-generated
status block (tools/refresh_readme.py) from the LIVE pytest collection
of the running session plus the newest committed bench/latency JSONs,
and fails when README.md diverges — the numbers can no longer rot
silently.  It also pins that the bench file the block quotes is no
older than one round behind the newest on disk (the driver writes
``BENCH_r{N}.json`` AFTER the round's last commit, so exact-latest is
impossible by construction; one round of slack is the freshest
reachable state).
"""

import os
import re

import pytest

import conftest
from tools.refresh_readme import BEGIN, END, build_status_block

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _full_suite_collection(config) -> bool:
    """True iff this session collected the whole tests/ dir with no
    -k / node-id narrowing, so selected+deselected == the full suite."""
    if config.option.keyword:
        return False
    tests_dir = os.path.dirname(os.path.abspath(__file__))
    for a in config.args:
        p = os.path.abspath(a.split("::")[0])
        if not os.path.isdir(p) or p not in (tests_dir, _REPO):
            return False
    return True


def test_readme_status_block_matches_reality(request):
    config = request.config
    if not _full_suite_collection(config):
        pytest.skip("needs a full tests/ collection to count the suite")
    items = list(request.session.items) + list(conftest.DESELECTED)
    slow = sum(1 for it in items
               if it.get_closest_marker("slow") is not None)
    fast = len(items) - slow

    expected = build_status_block(fast, slow)
    text = open(os.path.join(_REPO, "README.md")).read()
    m = re.search(re.escape(BEGIN) + r".*?" + re.escape(END), text,
                  re.DOTALL)
    assert m, "README.md lost its AUTOGEN:STATUS block"
    assert m.group(0) == expected, (
        "README status block is stale — run "
        "`python tools/refresh_readme.py`.\n--- README has ---\n"
        f"{m.group(0)}\n--- reality says ---\n{expected}")


def test_readme_quotes_a_bench_no_older_than_one_round():
    """The quoted BENCH file must be the newest or one round behind it
    (the driver appends BENCH_r{N}.json after the round's final
    commit)."""
    from tools.refresh_readme import _latest, bench_sources

    src = bench_sources()
    if "bench" not in src:
        pytest.skip("no BENCH_r*.json on disk")
    _, newest = _latest("BENCH_r*.json")
    assert src["bench"]["round"] >= newest - 1, src["bench"]
    # And the block builder reads the file it names (guards against
    # the builder silently quoting a different artifact).
    import json
    quoted = json.load(open(os.path.join(_REPO, src["bench"]["file"])))
    assert quoted["parsed"]["paths"]["int8-w8a8"]["value"] \
        == src["bench"]["int8"]
