"""Scale factorization surface (pesr_tpu/scales.py): the single source
of truth for which SR scales exist and how the upsampler stages them —
including the x3 DIV2K track (one conv->9C + PixelShuffle(3) stage, the
torch EDSR convention)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pesr_tpu.scales import fold_min_halo, upsample_stages


def test_upsample_stages_factorization():
    assert upsample_stages(1) == ()
    assert upsample_stages(2) == (2,)
    assert upsample_stages(3) == (3,)
    assert upsample_stages(4) == (2, 2)   # reference x4: two x2 stages
    assert upsample_stages(6) == (2, 3)
    assert upsample_stages(8) == (2, 2, 2)
    assert upsample_stages(12) == (2, 2, 3)
    assert upsample_stages(9) == (3, 3)


@pytest.mark.parametrize("bad", [0, -4, 5, 7, 10, 25])
def test_upsample_stages_rejects_non_2_3_smooth(bad):
    with pytest.raises(ValueError):
        upsample_stages(bad)


def test_fold_min_halo_is_num_stages_plus_one():
    assert fold_min_halo(1) == 0
    assert fold_min_halo(2) == 2
    assert fold_min_halo(3) == 2
    assert fold_min_halo(4) == 3
    assert fold_min_halo(6) == 3
    assert fold_min_halo(16) == 5    # round-3 advisor: dict KeyError'd


def test_cli_accepts_x3_rejects_x5():
    from pesr_tpu.config import opts_from_args
    opts = opts_from_args(("--scale", "3"), mode="test")
    assert opts.scale == 3 and opts.hr_patch_size == opts.patch_size * 3
    with pytest.raises(ValueError):
        opts_from_args(("--scale", "5"), mode="test")


def test_x3_generator_param_shapes():
    """x3 upsampler = ONE conv to 9*C (not two 4*C stages)."""
    from pesr_tpu.models import Generator
    gen = Generator(scale=3, num_blocks=2, num_channels=8,
                    dtype=jnp.float32)
    v = jax.jit(gen.init)(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
    up = v["params"]["upsampler"]
    assert set(up) == {"conv0"}
    assert up["conv0"]["kernel"].shape == (3, 3, 8, 72)


def test_x3_tiled_engine_end_to_end():
    """uint8 in -> x3 SR canvas out through the device-resident engine,
    and the engine honors the fold's min_halo floor at x3."""
    from pesr_tpu.models import Generator
    from pesr_tpu.models.fold import folded_inference
    from pesr_tpu.ops.tiling import BatchTiledUpscaler

    gen = Generator(scale=3, num_blocks=2, num_channels=8,
                    dtype=jnp.float32)
    v = jax.jit(gen.init)(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
    apply_fn, fvars = folded_inference(v["params"], 3, dtype=jnp.float32)
    assert apply_fn.min_halo == 2

    imgs = np.random.default_rng(0).integers(
        0, 256, (2, 20, 24, 3), dtype=np.uint8)
    # Halo >= the model's receptive field (head + 2x2 body + tail = 6 LR
    # px, plus the x3 fold band of num_stages+1 = 2): tiled output is
    # then exactly the whole-image forward on the interior.  With random
    # weights and noise input there is no trained-net context decay, so
    # a sub-RF halo would (correctly) show visible truncation error.
    eng = BatchTiledUpscaler(apply_fn, fvars, 3, tile_size=12, overlap=9)
    sr = eng.upscale_batch(imgs)
    assert sr.shape == (2, 60, 72, 3) and sr.dtype == np.uint8

    # Interior comparison: the outer border band differs by design (the
    # folded path replicate-pads true image borders; the plain chain
    # zero-pads them) — crop overlap*scale px.
    from pesr_tpu.ops.tiling import WholeImageUpscaler
    ref = WholeImageUpscaler(gen.apply, v, 3).upscale(imgs[0])
    r = 9 * 3
    diff = np.abs(sr[0, r:-r, r:-r].astype(int)
                  - ref[r:-r, r:-r].astype(int))
    assert diff.max() <= 1, (diff.mean(), diff.max())


def test_x3_serving_export_roundtrip(tmp_path):
    """x3 engine exports to a hermetic artifact and reloads bitwise."""
    import os
    from pesr_tpu.models import Generator
    from pesr_tpu.ops.tiling import BatchTiledUpscaler
    from pesr_tpu.serving import export_upscaler, load_upscaler

    gen = Generator(scale=3, num_blocks=2, num_channels=8,
                    dtype=jnp.float32)
    v = gen.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
    eng = BatchTiledUpscaler(gen.apply, v, 3, tile_size=16, overlap=4)
    imgs = np.random.default_rng(0).integers(
        0, 256, (2, 21, 17, 3), dtype=np.uint8)
    path = os.path.join(tmp_path, "x3.pesr")
    meta = export_upscaler(eng, *imgs.shape[:3], path,
                           precision_path="f32")
    assert meta["scale"] == 3 and meta["output_crop"] == [63, 51]
    np.testing.assert_array_equal(load_upscaler(path)(imgs),
                                  eng.upscale_batch(imgs))


def test_x3_spatial_parallel_bitwise():
    """mesh_axis='tiles' at x3: 8 chips on one image == single-chip."""
    from pesr_tpu.models import Generator
    from pesr_tpu.ops.tiling import BatchTiledUpscaler
    from pesr_tpu.parallel import make_mesh

    gen = Generator(scale=3, num_blocks=2, num_channels=8,
                    dtype=jnp.float32)
    v = gen.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
    imgs = np.random.default_rng(1).integers(
        0, 256, (1, 30, 26, 3), dtype=np.uint8)
    single = BatchTiledUpscaler(gen.apply, v, 3, tile_size=10, overlap=4)
    spatial = BatchTiledUpscaler(gen.apply, v, 3, tile_size=10, overlap=4,
                                 mesh=make_mesh(8), mesh_axis="tiles")
    np.testing.assert_array_equal(spatial.upscale_batch(imgs),
                                  single.upscale_batch(imgs))


def test_x3_pretrain_step_runs():
    from pesr_tpu.config import Opts
    from pesr_tpu.training import create_generator_state, make_pretrain_step
    from pesr_tpu.training.loop import build_generator

    opts = Opts(scale=3, num_blocks=2, num_channels=8, patch_size=8,
                batch_size=2, compute_dtype="float32")
    g = create_generator_state(opts, build_generator(opts),
                               jax.random.key(0))
    step = make_pretrain_step(opts)
    rng = np.random.default_rng(0)
    hr = np.tanh(rng.standard_normal(
        (2, opts.hr_patch_size, opts.hr_patch_size, 3))).astype(np.float32)
    lr = hr[:, ::3, ::3]
    g, m = step(g, jnp.asarray(lr), jnp.asarray(hr))
    assert np.isfinite(float(m["l1"]))
