"""Int8 W8A8 inference-path tests (quant_apply.py): static per-channel
calibrated scales, exact scale-folding algebra, and closeness to the
f32 reference on interior pixels (the int8 path uses the folded
upsampler, which legitimately differs in the border band)."""

import numpy as np
import jax
import jax.numpy as jnp

from pesr_tpu.models import Generator
from pesr_tpu.models.quant_apply import (_quantize_conv_folded,
                                         collect_calibration,
                                         default_calib_tiles,
                                         int8_inference)
from pesr_tpu.scales import fold_min_halo


def test_quantized_weights_reconstruct_folded_kernel():
    """w_q * m / s_in must reconstruct the original kernel to int8
    precision — pins the per-input-channel fold + per-output-channel
    scale algebra."""
    rng = np.random.default_rng(0)
    kernel = rng.standard_normal((3, 3, 16, 16)).astype(np.float32)
    bias = rng.standard_normal((16,)).astype(np.float32)
    amax = rng.uniform(0.5, 4.0, (16,)).astype(np.float32)
    q = _quantize_conv_folded(kernel, bias, amax)
    assert q["w_q"].dtype == jnp.int8
    s_in = amax / 127.0
    w_fold = kernel * s_in[None, None, :, None]
    recon_fold = (np.asarray(q["w_q"], np.float32)
                  * np.asarray(q["m"])[None, None, None, :])
    # int8 per-output-channel: worst-case error 0.5 LSB of each output
    # channel's scale (errors in FOLDED space are what reach the output;
    # unfolded-space error is anisotropic by design).
    err = np.abs(recon_fold - w_fold)
    bound = 0.5 * np.asarray(q["m"])[None, None, None, :]
    assert np.all(err <= bound + 1e-7), (err / bound).max()
    # and qin inverts the fold: x * qin == x / s_in
    np.testing.assert_allclose(np.asarray(q["qin"]), 1.0 / s_in,
                               rtol=1e-5)


def test_calibration_records_per_channel_amax():
    gen = Generator(scale=2, num_blocks=3, num_channels=16,
                    dtype=jnp.float32)
    x = np.random.default_rng(1).uniform(-1, 1, (2, 16, 16, 3)).astype(
        np.float32)
    variables = gen.init(jax.random.key(0), jnp.asarray(x))
    calib = collect_calibration(variables["params"], [x, x * 0.5])
    assert calib["body"]["in1"].shape == (3, 16)
    assert calib["body"]["in2"].shape == (3, 16)
    assert calib["tail_in"].shape == (16,)
    assert np.all(calib["body"]["in1"] > 0)
    # max across batches: the x batch dominates the 0.5*x batch
    solo = collect_calibration(variables["params"], [x])
    np.testing.assert_allclose(calib["body"]["in1"], solo["body"]["in1"])


import pytest


@pytest.mark.parametrize("scale", [2, 3, 4, 8])
def test_int8_apply_close_to_f32_apply_interior(scale):
    gen = Generator(scale=scale, num_blocks=3, num_channels=16,
                    dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(1).uniform(
        -1, 1, (1, 24, 24, 3)), jnp.float32)
    variables = gen.init(jax.random.key(0), x)

    ref = np.asarray(gen.apply(variables, x))
    apply_fn, qvars = int8_inference(variables["params"], scale,
                                     [np.asarray(x)])
    got = np.asarray(apply_fn(qvars, x))

    assert got.shape == ref.shape
    # Interior only: the folded upsampler's border band (radius
    # num_stages+1 LR px) differs by design and is cropped by the
    # tiled engines.
    r = fold_min_halo(scale) * scale
    ref_i, got_i = ref[:, r:-r, r:-r], got[:, r:-r, r:-r]
    scale = np.abs(ref_i).max() + 1e-9
    rel = np.abs(got_i - ref_i) / scale
    assert rel.max() < 0.05, rel.max()
    assert rel.mean() < 0.01, rel.mean()


def test_int8_apply_uint8_image_delta():
    """Quality proxy in image space: int8 vs f32 differ by at most a few
    uint8 steps after quantization to [0,255] (interior)."""
    from pesr_tpu.data.augment import denormalize_to_uint8

    gen = Generator(scale=2, num_blocks=2, num_channels=16,
                    dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(2).uniform(
        -1, 1, (1, 24, 24, 3)), jnp.float32)
    variables = gen.init(jax.random.key(0), x)

    ref = np.asarray(denormalize_to_uint8(gen.apply(variables, x)))
    apply_fn, qvars = int8_inference(variables["params"], 2,
                                     [np.asarray(x)])
    got = np.asarray(denormalize_to_uint8(apply_fn(qvars, x)))
    r = 2 * 2
    d = np.abs(got.astype(int)[:, r:-r, r:-r]
               - ref.astype(int)[:, r:-r, r:-r])
    # Random-weight nets are the PTQ worst case (no trained robustness);
    # a handful of uint8 steps max and sub-1 mean is the sanity bar —
    # trained-checkpoint quality is measured by test.py side-by-side.
    assert d.max() <= 6, d.max()
    assert d.mean() < 1.0, d.mean()


def test_default_calib_tiles_shapes_and_range():
    imgs = [np.random.default_rng(3).integers(0, 255, (40, 52, 3),
                                              dtype=np.uint8)]
    tiles = default_calib_tiles(imgs, tile=32, max_tiles=4)
    assert len(tiles) == 1 and tiles[0].shape == (4, 32, 32, 3)
    assert tiles[0].min() >= -1.0 and tiles[0].max() <= 1.0


@pytest.mark.slow
def test_int8_psnr_delta_on_trained_checkpoint():
    """The parity budget (BASELINE.md: 0.05 dB): int8 W8A8 vs bf16-path
    PSNR on the committed demo checkpoint over real eval images."""
    import os
    from pesr_tpu.training import checkpoint as ckpt
    from pesr_tpu.data.datasets import SyntheticImages, \
        host_bicubic_downsample
    from pesr_tpu.metrics import calc_psnr
    from pesr_tpu.ops.tiling import BatchTiledUpscaler

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    params, _ = ckpt.restore_generator_params(
        os.path.join(repo, "demo", "checkpoint"))
    scale = 4

    src = SyntheticImages(num_images=2, height=256, width=256, seed=99)
    hrs = [src.get(i) for i in range(2)]
    lrs = [host_bicubic_downsample(h, scale) for h in hrs]

    from pesr_tpu.models.fold import folded_inference
    from pesr_tpu.models.quant_apply import (default_calib_tiles,
                                             int8_inference)
    ref_apply, ref_vars = folded_inference(params, scale,
                                           dtype=jnp.float32)
    q_apply, q_vars = int8_inference(params, scale,
                                     default_calib_tiles(lrs))

    def mean_psnr(apply_fn, variables):
        eng = BatchTiledUpscaler(apply_fn, variables, scale,
                                 tile_size=32, overlap=8)
        srs = eng.upscale_many(lrs, batch_size=2)
        return np.mean([calc_psnr(sr, hr, crop_border=scale)
                        for sr, hr in zip(srs, hrs)])

    p_ref = mean_psnr(ref_apply, ref_vars)
    p_int8 = mean_psnr(q_apply, q_vars)
    assert p_ref - p_int8 <= 0.05, (p_ref, p_int8)


def test_quant_fold_auto_defaults_by_scale():
    """quant_fold auto: the folded upsampler conv is int8 at scale >= 8
    (measured +5% for 0.015 dB at flagship width) and bf16 below (no
    measured gain — keep the quality margin)."""
    import jax
    import jax.numpy as jnp

    from pesr_tpu.models import Generator
    from pesr_tpu.models.quant_apply import (default_calib_tiles,
                                             int8_inference)

    rng = np.random.default_rng(0)
    calib_imgs = [rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)]
    for scale, want_int8 in ((2, False), (4, False), (8, True)):
        gen = Generator(scale=scale, num_blocks=2, num_channels=8)
        variables = gen.init(jax.random.key(0),
                             jnp.zeros((1, 8, 8, 3)))
        _, qvars = int8_inference(variables["params"], scale,
                                  default_calib_tiles(calib_imgs))
        has_wq = "w_q" in qvars["params"]["upfold"]
        assert has_wq == want_int8, (scale, qvars["params"][
            "upfold"].keys())
        # Explicit override still wins in both directions.
        _, qv2 = int8_inference(variables["params"], scale,
                                default_calib_tiles(calib_imgs),
                                quant_fold=not want_int8)
        assert ("w_q" in qv2["params"]["upfold"]) == (not want_int8)
