"""Real 2-process ``jax.distributed`` integration test (round-2 verdict
#2).  Two coordinated CPU processes (4 virtual devices each) run the
actual GAN training loop over an 8-device global mesh — executing
``shard_batch``'s ``make_array_from_process_local_data`` path, the
collective orbax checkpoint, and process-0-only JSONL logging in a real
multi-process runtime for the first time — and must reproduce a
1-process/8-device run of the same global batches."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_ROOT, "tests", "distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _worker_env() -> dict:
    env = dict(os.environ)
    # EXTEND PYTHONPATH (the TPU plugin's sitecustomize lives on the
    # default path); clear any stale cluster vars.
    env["PYTHONPATH"] = _ROOT + os.pathsep + env.get("PYTHONPATH", "")
    for k in ("PESR_COORDINATOR", "PESR_NUM_PROCESSES",
              "PESR_PROCESS_ID"):
        env.pop(k, None)
    return env


def _launch(pid: int, nproc: int, port: int, out: str, ckpt: str,
            mode: str = "train"):
    return subprocess.Popen(
        [sys.executable, _WORKER, str(pid), str(nproc), str(port), out,
         ckpt, mode],
        env=_worker_env(), stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)


def _run_group(nproc: int, tmp_path, tag: str, mode: str = "train"):
    port = _free_port()
    ckpt = os.path.join(tmp_path, f"ckpt_{tag}")
    procs, outs = [], []
    for pid in range(nproc):
        out = os.path.join(tmp_path, f"out_{tag}_{pid}.json")
        outs.append(out)
        procs.append(_launch(pid, nproc, port, out, ckpt, mode))
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"
    return ckpt, [json.load(open(o)) for o in outs], logs


@pytest.mark.slow
def test_two_process_gan_run_matches_single_process(tmp_path):
    from pesr_tpu.training import checkpoint as ckpt_lib

    ckpt2, results2, logs2 = _run_group(2, tmp_path, "p2")
    ckpt1, results1, _ = _run_group(1, tmp_path, "p1")

    # Both processes of the 2-proc run finished the same 3 steps.
    assert [r["summary"]["steps"] for r in results2] == [3, 3]
    assert results1[0]["summary"]["steps"] == 3

    # Replicated state => both processes logged identical losses;
    # wall-clock meters (steps_per_s/mpx_per_s) legitimately differ.
    def step3_losses(log):
        line = [ln for ln in log.splitlines()
                if ln.startswith("[train step 3]")][-1]
        return [tok for tok in line.split()
                if "=" in tok and not tok.startswith(
                    ("steps_per_s", "mpx_per_s"))]

    assert step3_losses(logs2[0]) == step3_losses(logs2[1])

    # The collective checkpoint committed exactly once and restores.
    pay2 = ckpt_lib.restore_payload(os.path.join(ckpt2, "step_3"))
    pay1 = ckpt_lib.restore_payload(os.path.join(ckpt1, "step_3"))
    assert int(pay2["step"]) == int(pay1["step"]) == 3

    # 2-process DP over DCN must match the 1-process/8-device run on
    # the same global batches.  Primary check: every logged training
    # metric per step (JSONL carries full float precision).  Tolerance
    # rationale: the cross-host psum reduces in a different order than
    # the single-host one (float32 non-associativity); losses absorb
    # that at ~1e-6 relative, while raw params drift more — Adam turns
    # a sign flip of a ~0 gradient (e.g. late discriminator biases)
    # into a full ±lr step, so params get only a coarse atol sanity
    # bound.
    recs2 = _read_jsonl(os.path.join(ckpt2, "train.jsonl"))
    recs1 = _read_jsonl(os.path.join(ckpt1, "train.jsonl"))
    assert [r["step"] for r in recs2] == [r["step"] for r in recs1]
    for r2, r1 in zip(recs2, recs1):
        for k in r1:
            if k in ("time", "steps_per_s", "mpx_per_s"):
                continue
            np.testing.assert_allclose(r2[k], r1[k], rtol=1e-3,
                                       err_msg=f"step{r1['step']}:{k}")

    for net in ("g", "d"):
        flat2 = _flatten(pay2[net]["params"])
        flat1 = _flatten(pay1[net]["params"])
        assert flat2.keys() == flat1.keys()
        for k in flat1:
            np.testing.assert_allclose(
                flat2[k], flat1[k], rtol=5e-3, atol=1e-3,
                err_msg=f"{net}:{k}")

    # Process-0-only JSONL already proven parseable above (two writers
    # appending concurrently would interleave/corrupt).
    assert [r["step"] for r in recs2] == [1, 2, 3]


@pytest.mark.slow
def test_two_process_spatial_parallel_serving_is_bitwise(tmp_path):
    """Multi-host spatial-parallel serving (mesh_axis='tiles') across a
    real 2-process runtime: each image's tile grid shards over the
    8-device global mesh spanning both processes, and the stitched
    canvas (returned through a cross-host all-gather) must be BITWISE
    the single-device whole-image forward on BOTH hosts — the same
    invariant the single-process spatial tests pin, now with DCN in the
    loop."""
    _, results, _ = _run_group(2, tmp_path, "sp", mode="spatial")
    assert len(results) == 2
    for r in results:
        assert r["summary"]["bitwise_equal_local_ref"], r
    # Both hosts fetched the same replicated canvas.
    assert (results[0]["summary"]["canvas_sha"]
            == results[1]["summary"]["canvas_sha"])
    assert (results[0]["summary"]["ref_sha"]
            == results[1]["summary"]["ref_sha"])


def _read_jsonl(path):
    assert os.path.exists(path)
    return [json.loads(ln) for ln in open(path)]


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}/{k}"))
    else:
        out[prefix] = np.asarray(tree)
    return out


def test_initialize_distributed_env_config(monkeypatch):
    """Fast unit check of the PESR_* env contract: explicit coordinator
    kwargs reach jax.distributed.initialize, and without them the call
    stays argless (jax auto-detection)."""
    import jax

    from pesr_tpu.parallel import mesh as mesh_mod

    captured = {}

    def fake_init(**kwargs):
        captured.update(kwargs)

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    monkeypatch.setenv("PESR_COORDINATOR", "10.0.0.1:1234")
    monkeypatch.setenv("PESR_NUM_PROCESSES", "4")
    monkeypatch.setenv("PESR_PROCESS_ID", "2")
    assert mesh_mod.initialize_distributed(required=True)
    assert captured == {"coordinator_address": "10.0.0.1:1234",
                        "num_processes": 4, "process_id": 2}

    captured.clear()
    monkeypatch.delenv("PESR_COORDINATOR")
    assert mesh_mod.initialize_distributed()
    assert captured == {}

    # A mis-configured cluster fails loudly only with required=True.
    def boom(**kwargs):
        raise RuntimeError("no cluster")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    assert mesh_mod.initialize_distributed() is False
    with pytest.raises(RuntimeError, match="no cluster"):
        mesh_mod.initialize_distributed(required=True)

    # PESR_COORDINATOR set = explicit intent: an initialize() failure
    # raises even under required=False — one worker silently training
    # single-host against the cluster's check_point dir would diverge
    # and clobber (round-4 review).
    monkeypatch.setenv("PESR_COORDINATOR", "10.0.0.1:1234")
    with pytest.raises(RuntimeError, match="no cluster"):
        mesh_mod.initialize_distributed(required=False)
