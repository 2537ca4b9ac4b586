"""On-device procedural corpus (data/device_synth.py, round 5):
rendering correctness (determinism, band placement, per-index
distinctness), the stream/sharding contract on the 8-device test mesh,
and the full training-loop integration with zero host batch traffic."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pesr_tpu.config import Opts
from pesr_tpu.data.datasets import load_eval_set, train_num_images
from pesr_tpu.data.device_synth import (DeviceSyntheticStream,
                                        band_for_scale, render_hr_batch)
from pesr_tpu.parallel import make_mesh, shard_batch
from pesr_tpu.parallel.mesh import batch_sharding

TINY = Opts(num_blocks=2, num_channels=8, patch_size=12, batch_size=8,
            compute_dtype="float32", steps_per_epoch=4,
            train_dataset="synthetic_device",
            valid_dataset="synthetic_device", scale=2)


def test_render_shape_dtype_range_and_determinism():
    k = jax.random.key(7)
    a = render_hr_batch(k, batch=2, hp=64, scale=4)
    b = render_hr_batch(k, batch=2, hp=64, scale=4)
    assert a.shape == (2, 64, 64, 3) and a.dtype == jnp.uint8
    assert np.array_equal(np.asarray(a), np.asarray(b))
    # Real dynamic range (normalized to the full uint8 span per sample).
    assert int(np.asarray(a).max()) == 255
    assert int(np.asarray(a).min()) == 0
    c = render_hr_batch(jax.random.key(8), batch=2, hp=64, scale=4)
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_samples_are_index_determined_and_distinct():
    """Per-sample content folds the GLOBAL batch index into the key, so
    sample i is the same whether rendered in a batch of 2 or 4 (the
    property that makes sharded rendering consistent across mesh
    sizes), and samples within a batch differ."""
    k = jax.random.key(3)
    b4 = np.asarray(render_hr_batch(k, batch=4, hp=48, scale=4))
    b2 = np.asarray(render_hr_batch(k, batch=2, hp=48, scale=4))
    assert np.array_equal(b4[:2], b2)
    assert not np.array_equal(b4[0], b4[1])


def test_band_sits_below_lr_nyquist():
    """The scale-derived feature band must keep the rendered energy
    recoverable at the trained scale: for x4, the 0.044-0.125 cyc/px
    share dominates and <12% of energy sits above the LR Nyquist
    (mirrors the synthetic_hard_x4 spectral contract in test_data)."""
    f_lo, f_hi = band_for_scale(4)
    assert f_hi <= 0.5 / 4
    img = np.asarray(render_hr_batch(jax.random.key(0), batch=1,
                                     hp=192, scale=4))[0]
    g = img.mean(-1).astype(np.float64)
    g -= g.mean()
    F = np.abs(np.fft.rfft2(g)) ** 2
    fy = np.fft.fftfreq(g.shape[0])[:, None]
    fx = np.fft.rfftfreq(g.shape[1])[None, :]
    r = np.hypot(fy, fx)
    tot = F.sum()
    above = F[r >= 0.125].sum() / tot
    band = F[(r >= f_lo) & (r < 0.125)].sum() / tot
    assert above < 0.12, above
    assert band > 0.15, band


def test_stream_yields_sharded_device_batches():
    mesh = make_mesh()
    st = DeviceSyntheticStream(mesh, TINY)
    lr, hr = next(st)
    assert lr is None
    assert isinstance(hr, jax.Array) and hr.dtype == jnp.uint8
    assert hr.shape == (8, 24, 24, 3)  # batch, patch*scale
    assert hr.sharding == batch_sharding(mesh)
    # shard_batch must pass the pre-sharded array through untouched.
    out = shard_batch(mesh, {"hr": hr})
    assert out["hr"] is hr
    # Stream advances.
    _, hr2 = next(st)
    assert not np.array_equal(np.asarray(hr), np.asarray(hr2))


def test_stream_resume_folding_gives_fresh_content():
    mesh = make_mesh()
    a = np.asarray(next(DeviceSyntheticStream(mesh, TINY))[1])
    b = np.asarray(next(DeviceSyntheticStream(mesh, TINY))[1])
    c = np.asarray(next(DeviceSyntheticStream(mesh, TINY,
                                              start_step=100))[1])
    assert np.array_equal(a, b)          # same seed, same stream
    assert not np.array_equal(a, c)      # resume continues on new data


def test_train_num_images_and_eval_set():
    assert train_num_images(TINY) == 32
    samples = load_eval_set(TINY, "synthetic_device", 2)
    assert len(samples) == 2
    s = samples[0]
    assert s.name == "device_000"
    assert s.hr.shape == (480, 480, 3) and s.hr.dtype == np.uint8
    assert s.lr.shape == (240, 240, 3)


@pytest.mark.slow
def test_run_training_on_device_corpus(tmp_path):
    """End-to-end: the production loop trains from the device corpus —
    loss decreases over 2 tiny epochs, checkpoint saves, and the eval
    path scores the device-rendered eval set."""
    from pesr_tpu.training.checkpoint import latest_step_dir
    from pesr_tpu.training.loop import run_training
    opts = dataclasses.replace(
        TINY, phase="pretrain", num_epochs=2, num_valids=1,
        eval_every=2, snapshot_every=2, log_every=2,
        check_point=str(tmp_path / "exp"))
    summary = run_training(opts)
    assert summary["steps"] == 8
    # eval_every=2 ran the self-val on the device-rendered eval set.
    assert np.isfinite(summary["val_psnr"]) and summary["val_psnr"] > 0
    assert latest_step_dir(str(tmp_path / "exp"))
