"""Coverage widening: GAN-type matrix, scale sweep, folder layouts,
schedule, NIQE internals (SURVEY.md §4)."""

import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pesr_tpu.config import Opts
from pesr_tpu.training import (create_discriminator_state,
                               create_generator_state, make_gan_step,
                               make_pretrain_step, make_lr_schedule)
from pesr_tpu.training.loop import build_discriminator, build_generator

TINY = Opts(num_blocks=2, num_channels=8, patch_size=8, batch_size=4,
            compute_dtype="float32", alpha_vgg=0.0, alpha_l1=1.0)


def _batch(opts, seed=0):
    rng = np.random.default_rng(seed)
    hr = np.tanh(rng.standard_normal(
        (opts.batch_size, opts.hr_patch_size, opts.hr_patch_size, 3))
    ).astype(np.float32)
    return jnp.asarray(hr[:, ::opts.scale, ::opts.scale]), jnp.asarray(hr)


@pytest.mark.parametrize("gan_type", ["GAN", "LSGAN", "RSGAN", "RaSGAN",
                                      "RaLSGAN"])
@pytest.mark.slow
def test_gan_step_every_gan_type(gan_type):
    opts = dataclasses.replace(TINY, gan_type=gan_type)
    gen, disc = build_generator(opts), build_discriminator(opts)
    g = create_generator_state(opts, gen, jax.random.key(0))
    d = create_discriminator_state(opts, disc, jax.random.key(1))
    step = make_gan_step(
        opts, d_apply=lambda p, x: disc.apply({"params": p}, x),
        vgg_apply=None)
    lr, hr = _batch(opts)
    g, d, m = step(g, d, None, lr, hr, jax.random.key(2))
    assert np.isfinite(float(m["d_loss"]))
    assert np.isfinite(float(m["g_loss"]))


@pytest.mark.parametrize("scale", [2, 8])
def test_pretrain_step_other_scales(scale):
    opts = dataclasses.replace(TINY, scale=scale)
    g = create_generator_state(opts, build_generator(opts),
                               jax.random.key(0))
    step = make_pretrain_step(opts)
    lr, hr = _batch(opts)
    g, m = step(g, lr, hr)
    assert np.isfinite(float(m["l1"]))


def test_lr_schedule_staircase_halving():
    opts = dataclasses.replace(TINY, learning_rate=1e-3, lr_step=2,
                               steps_per_epoch=10)
    sched = make_lr_schedule(opts)
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(19)) == pytest.approx(1e-3)   # within first stair
    assert float(sched(20)) == pytest.approx(5e-4)   # after 2 epochs
    assert float(sched(40)) == pytest.approx(2.5e-4)


def test_eval_set_folder_layouts(tmp_path):
    """HR/ + LR_bicubic/X4 layout with DIV2K x4 naming must resolve the
    LR files; flat HR dir must synthesize LR on host."""
    from pesr_tpu.data.datasets import load_eval_set
    from pesr_tpu.utils.image_io import imwrite_uint8

    rng = np.random.default_rng(0)
    hr = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    lr = rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)

    root = tmp_path / "MySet"
    imwrite_uint8(str(root / "HR" / "img1.png"), hr)
    imwrite_uint8(str(root / "LR_bicubic" / "X4" / "img1x4.png"), lr)

    opts = Opts(test_dataset="MySet", data_root=str(tmp_path), scale=4)
    samples = load_eval_set(opts)
    assert len(samples) == 1
    np.testing.assert_array_equal(samples[0].lr, lr)  # from disk
    np.testing.assert_array_equal(samples[0].hr, hr)

    flat = tmp_path / "FlatSet"
    imwrite_uint8(str(flat / "img1.png"), hr)
    opts2 = Opts(test_dataset="FlatSet", data_root=str(tmp_path), scale=4)
    s2 = load_eval_set(opts2)[0]
    assert s2.lr.shape == (8, 8, 3)  # synthesized

    # LR-only layout (the PIRM test-set shape: inputs, no ground
    # truth): the given images ARE the model input — never
    # downsampled — and hr is None so consumers skip PSNR/SSIM.
    imwrite_uint8(str(tmp_path / "PIRMTest" / "LR" / "img1.png"), lr)
    opts3 = Opts(test_dataset="PIRMTest", data_root=str(tmp_path),
                 scale=4)
    s3 = load_eval_set(opts3)[0]
    np.testing.assert_array_equal(s3.lr, lr)
    assert s3.hr is None


def test_patch_iterator_with_lr_files(tmp_path):
    """LR-file training mode: aligned crops come from both dirs."""
    from pesr_tpu.data.datasets import PairedImageFolder, PatchIterator
    from pesr_tpu.utils.image_io import imwrite_uint8

    rng = np.random.default_rng(1)
    hr = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    lr = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
    imwrite_uint8(str(tmp_path / "hr" / "a.png"), hr)
    imwrite_uint8(str(tmp_path / "lr" / "ax4.png"), lr)

    folder = PairedImageFolder(str(tmp_path / "hr"),
                               str(tmp_path / "lr"), scale=4)
    it = PatchIterator(folder, patch_size=4, scale=4, batch_size=2,
                       seed=0)
    lr_b, hr_b = next(it)
    assert lr_b.shape == (2, 4, 4, 3)
    assert hr_b.shape == (2, 16, 16, 3)
    # crops really come from the LR file (alignment by construction)
    assert lr_b.dtype == np.uint8


def test_niqe_halve_matches_imresize():
    from pesr_tpu.metrics.niqe import _halve
    from pesr_tpu.ops import imresize
    rng = np.random.default_rng(2)
    g = rng.random((64, 48)) * 255.0
    ours = _halve(g)
    ref = np.asarray(imresize(jnp.asarray(g, jnp.float32), (32, 24)))
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_opts_hashable_and_static_jit_safe():
    """Opts must stay hashable (used as static jit closures)."""
    o1 = Opts()
    o2 = dataclasses.replace(o1, scale=2)
    assert hash(o1) != hash(o2) or o1 != o2
    d = {o1: 1, o2: 2}
    assert len(d) == 2


def test_help_text_renders_in_both_modes():
    """argparse %-interpolates help strings; literal '%' in flag prose
    (e.g. '+5% measured') crashed --help with a ValueError until
    _add_bool_flag escaped it.  format_help() is what --help prints."""
    from pesr_tpu.config import build_parser
    for mode in ("train", "test"):
        text = build_parser(mode).format_help()
        assert "--scale" in text
