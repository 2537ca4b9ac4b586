"""Structured scalar logging (SURVEY.md §5.5 rebuild hook).

The reference logs with print + tensorboardX scalars.  Here:
  * ``MetricLogger`` appends JSONL records (machine-readable, diffable,
    no TF dependency on the hot path) and mirrors to stdout;
  * ``AverageMeter`` is the running-mean bookkeeping utility the
    reference keeps in utils.py (SURVEY.md §2 item 9).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class AverageMeter:
    """Running average of a scalar stream."""

    def __init__(self) -> None:
        self.reset()

    def reset(self) -> None:
        self.sum = 0.0
        self.count = 0

    def update(self, value: float, n: int = 1) -> None:
        self.sum += float(value) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)


class MetricLogger:
    """JSONL + stdout scalar logger, with optional TensorBoard mirroring
    (the reference logs via tensorboardX; here TB is opt-in via
    ``PESR_TENSORBOARD=1`` since tf.summary pulls in TensorFlow)."""

    def __init__(self, log_dir: Optional[str], name: str = "train") -> None:
        self._fh = None
        self._tb = None
        # Multi-host: scalars are replicated, so every process would
        # append identical records to the SAME file on shared storage
        # (interleaved corruption).  Only process 0 writes; stdout stays
        # per-process (each host's launcher captures its own).
        try:
            import jax
            if jax.process_index() != 0:
                log_dir = None
        except Exception:
            pass
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._fh = open(os.path.join(log_dir, f"{name}.jsonl"), "a",
                            buffering=1)
            if os.environ.get("PESR_TENSORBOARD") == "1":
                try:
                    import tensorflow as tf
                    self._tb = tf.summary.create_file_writer(
                        os.path.join(log_dir, "tb", name))
                except Exception as e:  # noqa: BLE001
                    # TB is an optional MIRROR: a broken TF install
                    # (protobuf/numpy skew raises TypeError at import,
                    # not ImportError) or an unwritable log_dir must
                    # degrade to JSONL-only, not abort training.
                    print(f"[logger] PESR_TENSORBOARD=1 but TensorBoard "
                          f"mirroring failed ({type(e).__name__}: {e}); "
                          "JSONL only")
        self._t0 = time.time()

    def log(self, step: int, scalars: Dict[str, float],
            prefix: str = "") -> None:
        rec = {"step": step, "time": round(time.time() - self._t0, 3)}
        rec.update({k: float(v) for k, v in scalars.items()})
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            import tensorflow as tf
            with self._tb.as_default():
                for k, v in scalars.items():
                    tf.summary.scalar(f"{prefix or 'train'}/{k}",
                                      float(v), step=step)
        body = " ".join(f"{k}={v:.4g}" for k, v in rec.items()
                        if k not in ("step", "time"))
        print(f"[{prefix or 'train'} step {step}] {body}", flush=True)

    def close(self) -> None:
        if self._fh:
            self._fh.close()
            self._fh = None
        if self._tb is not None:
            self._tb.close()
            self._tb = None
