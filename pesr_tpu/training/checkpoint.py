"""Checkpoint save/restore via orbax (SURVEY.md §5.4).

The reference saves ``state_dict`` per epoch plus a best-PSNR copy into
``check_point/<exp>/`` and resumes via ``--pretrained_model``.  Mirror:
``save_train_ckpt`` writes ``step_<N>`` directories holding {generator,
discriminator, step}; ``restore_*`` accept either a specific step dir or
the experiment dir (resolving the latest step).  Converted torch
checkpoints (pesr_tpu/convert.py) restore through the same path.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

_STEP_RE = re.compile(r"^step_(\d+)$")


def _to_abs(path: str) -> str:
    return os.path.abspath(os.path.expanduser(path))


def latest_step_dir(ckpt_dir: str) -> Optional[str]:
    ckpt_dir = _to_abs(ckpt_dir)
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for entry in os.listdir(ckpt_dir):
        m = _STEP_RE.match(entry)
        if m:
            steps.append((int(m.group(1)), entry))
    if not steps:
        return None
    return os.path.join(ckpt_dir, max(steps)[1])


def _payload(step: int, g_state: Any, d_state: Any,
             best_psnr: Optional[float],
             ema_params: Any = None) -> dict:
    from flax import serialization

    payload = {
        "step": np.asarray(step),
        "g": jax.device_get(serialization.to_state_dict(g_state)),
    }
    if d_state is not None:
        payload["d"] = jax.device_get(
            serialization.to_state_dict(d_state))
    if best_psnr is not None:
        payload["best_psnr"] = np.asarray(best_psnr)
    if ema_params is not None:
        # EMA of the generator params (--ema_decay): the SERVING weights.
        # Stored alongside the raw training params so --resume continues
        # the average and inference loads prefer it (restore_generator_
        # params).
        payload["ema"] = jax.device_get(
            serialization.to_state_dict(ema_params))
    return payload


def save_train_ckpt(ckpt_dir: str, step: int, g_state: Any,
                    d_state: Any = None,
                    best_psnr: Optional[float] = None,
                    ema_params: Any = None) -> str:
    """Write one step directory: {g: <state dict>, d: <state dict>,
    step, best_psnr}.

    States are serialized via ``flax.serialization.to_state_dict`` (pure
    nested dicts) so restore can rebuild the exact optax pytree types by
    deserializing onto a freshly-constructed template state — full
    optimizer-state resume, not just params (SURVEY.md §5.4).
    ``best_psnr`` rides along so best-checkpoint tracking survives
    --resume instead of being clobbered by the first post-resume eval.

    Multi-host: ``Checkpointer.save`` is a *collective* — it runs
    ``sync_global_processes`` barriers internally and must be entered by
    every process; orbax itself restricts the actual directory writes /
    commit-rename to the primary host.  Gating the call on
    ``process_index() == 0`` (the round-2 code) deadlocks: process 0
    blocks at the save barrier that the other hosts never reach
    (round-3 advisor)."""
    path = os.path.join(_to_abs(ckpt_dir), f"step_{step}")
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path,
                   _payload(step, g_state, d_state, best_psnr, ema_params),
                   force=True)
    return path


def prune_snapshots(ckpt_dir: str, keep: int) -> list:
    """Remove the oldest ``step_<N>`` directories beyond the newest
    ``keep`` (checkpoint rotation over long runs, SURVEY.md §5.4 — the
    reference saves per epoch, which over hundreds of epochs needs a
    retention bound).  The ``best`` copy is never touched; ``keep <= 0``
    keeps everything.  Returns the pruned paths.

    Multi-host: call on process 0 only — the step dirs live on the
    primary host's filesystem (orbax restricts writes there) and removal
    is plain local IO, not a collective."""
    if keep <= 0:
        return []
    ckpt_dir = _to_abs(ckpt_dir)
    if not os.path.isdir(ckpt_dir):
        return []
    steps = sorted((int(m.group(1)), e) for e in os.listdir(ckpt_dir)
                   if (m := _STEP_RE.match(e)))
    pruned = []
    for _, entry in steps[:-keep] if len(steps) > keep else []:
        path = os.path.join(ckpt_dir, entry)
        import shutil
        shutil.rmtree(path, ignore_errors=True)
        pruned.append(path)
    return pruned


def save_best_ckpt(ckpt_dir: str, step: int, g_state: Any,
                   d_state: Any = None,
                   best_psnr: Optional[float] = None,
                   ema_params: Any = None) -> str:
    """Overwrite the experiment's ``best`` checkpoint (best-validation
    copy the reference keeps alongside snapshots, SURVEY.md §5.4).
    Restorable through the same step-dir readers via its path."""
    path = os.path.join(_to_abs(ckpt_dir), "best")
    with ocp.PyTreeCheckpointer() as ckptr:  # collective; see save_train_ckpt
        ckptr.save(path,
                   _payload(step, g_state, d_state, best_psnr, ema_params),
                   force=True)
    return path


def restore_train_state(path: str, g_template: Any,
                        d_template: Any = None, payload: Any = None):
    """Restore full train states onto template TrainStates.

    Returns ``(g_state, d_state_or_None, step, best_psnr_or_None)``.
    Raises KeyError with a clear message when a discriminator state is
    requested but the checkpoint predates the GAN phase.  ``payload``:
    a pre-restored payload to reuse — resuming with --ema_decay needs
    the same payload twice, and re-reading a flagship checkpoint
    doubles resume I/O and the transient host-RAM spike."""
    from flax import serialization

    if payload is None:
        payload = restore_payload(path)
    g_state = serialization.from_state_dict(g_template, payload["g"])
    d_state = None
    if d_template is not None:
        if "d" not in payload:
            raise KeyError(
                "checkpoint has no discriminator state (it was saved "
                "during pretraining) — start the GAN phase with "
                "--pretrained_model instead of --resume")
        d_state = serialization.from_state_dict(d_template, payload["d"])
    best = payload.get("best_psnr")
    return (g_state, d_state, int(payload["step"]),
            None if best is None else float(best))


def _is_ckpt_dir(path: str) -> bool:
    return os.path.isfile(os.path.join(path, "_CHECKPOINT_METADATA"))


def _resolve(path: str) -> str:
    """Accept a concrete checkpoint dir (step_N, best, or any orbax
    dir), or an experiment dir (resolving its latest step_N)."""
    path = _to_abs(path)
    if _is_ckpt_dir(path):
        return path
    resolved = latest_step_dir(path)
    if resolved is None or not os.path.isdir(resolved):
        raise FileNotFoundError(f"no checkpoint found at {path}")
    return resolved


def restore_payload(path: str) -> Any:
    """Restore a full saved payload from a step dir or experiment dir."""
    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(_resolve(path))


def restore_generator_params(path: str,
                              prefer_ema: bool = True) -> Tuple[Any, int]:
    """Restore just generator params (+ step) — the test.py path.

    Checkpoints written with ``--ema_decay`` carry an ``ema`` tree (the
    exponential moving average of the generator params); that is the
    intended serving model, so it is preferred by default.  Pass
    ``prefer_ema=False`` for the raw last-step training params."""
    payload = restore_payload(path)
    params = payload["g"]["params"]
    if prefer_ema and payload.get("ema") is not None:
        params = payload["ema"]
    return params, int(payload["step"])


def restore_ema_params(path: str, template: Any,
                       payload: Any = None) -> Optional[Any]:
    """Restore the EMA params tree onto ``template`` (a params pytree),
    or None when the checkpoint predates ``--ema_decay`` — the caller
    then re-seeds the average from the restored raw params.
    ``payload`` reuses a pre-restored payload (see
    restore_train_state)."""
    from flax import serialization

    if payload is None:
        payload = restore_payload(path)
    if payload.get("ema") is None:
        return None
    return serialization.from_state_dict(template, payload["ema"])


def interpolate_params(base: Any, other: Any, alpha: float) -> Any:
    """Network interpolation (ESRGAN §4.4): ``(1-a)*base + a*other``.

    Blending a PSNR-oriented (L1-pretrained) generator with its GAN
    fine-tune in PARAMETER space traces a smooth perception-distortion
    curve without retraining — the standard way to pick an operating
    point on the PI-vs-PSNR trade.  Callers validate both trees against
    the model first (validate_params_compat) — tree_map only catches
    STRUCTURE mismatches, and numpy would silently broadcast a shape
    mismatch."""
    a = float(alpha)
    return jax.tree_util.tree_map(
        lambda p, q: ((1.0 - a) * np.asarray(p, np.float32)
                      + a * np.asarray(q, np.float32)).astype(
                          np.asarray(p).dtype),
        base, other)


def validate_params_compat(expected: Any, restored: Any,
                           what: str = "generator") -> None:
    """Raise a readable error when a restored checkpoint does not match
    the configured model (e.g. --num_blocks/--num_channels mismatch) —
    otherwise the mismatch surfaces as a bare shape assert deep in XLA.

    ``expected`` may be a concrete or ``jax.eval_shape`` pytree.
    """
    exp = {jax.tree_util.keystr(k): tuple(v.shape) for k, v in
           jax.tree_util.tree_leaves_with_path(expected)}
    got = {jax.tree_util.keystr(k): tuple(np.shape(v)) for k, v in
           jax.tree_util.tree_leaves_with_path(restored)}
    problems = []
    for k in sorted(exp.keys() | got.keys()):
        if k not in got:
            problems.append(f"  missing in checkpoint: {k} {exp[k]}")
        elif k not in exp:
            problems.append(f"  unexpected in checkpoint: {k} {got[k]}")
        elif exp[k] != got[k]:
            problems.append(f"  shape mismatch at {k}: model wants "
                            f"{exp[k]}, checkpoint has {got[k]}")
    if problems:
        raise ValueError(
            f"checkpoint is incompatible with the configured {what} "
            f"(check --num_blocks/--num_channels/--scale):\n"
            + "\n".join(problems[:12])
            + ("" if len(problems) <= 12
               else f"\n  ... and {len(problems) - 12} more"))
