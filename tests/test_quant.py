"""Int8 PTQ inference-path tests (quant_apply.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from pesr_tpu.models import Generator
from pesr_tpu.models.quant_apply import (make_int8_apply, quantize_conv,
                                         quantize_generator_params)


def test_quantize_conv_roundtrip_error_small():
    rng = np.random.default_rng(0)
    p = {"kernel": rng.standard_normal((3, 3, 16, 16)).astype(np.float32),
         "bias": rng.standard_normal((16,)).astype(np.float32)}
    q = quantize_conv({k: jnp.asarray(v) for k, v in p.items()})
    assert q["w_q"].dtype == jnp.int8
    recon = np.asarray(q["w_q"], np.float32) * np.asarray(q["s_w"])
    rel = np.abs(recon - p["kernel"]).max() / np.abs(p["kernel"]).max()
    assert rel < 0.01  # per-channel int8: <1% worst-case weight error


def test_int8_apply_close_to_f32_apply():
    gen = Generator(scale=2, num_blocks=3, num_channels=16,
                    dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(1).uniform(
        -1, 1, (1, 16, 20, 3)), jnp.float32)
    variables = gen.init(jax.random.key(0), x)

    ref = np.asarray(gen.apply(variables, x))
    qparams = quantize_generator_params(variables["params"])
    got = np.asarray(make_int8_apply(scale=2, res_scale=0.1)(
        {"params": qparams}, x))

    assert got.shape == ref.shape
    # Int8 PTQ: small relative error over the output dynamic range.
    scale = np.abs(ref).max() + 1e-9
    rel = np.abs(got - ref) / scale
    assert rel.max() < 0.05, rel.max()
    assert rel.mean() < 0.01, rel.mean()


def test_int8_apply_uint8_image_delta():
    """Quality proxy in image space: int8 vs f32 differ by at most a few
    uint8 steps after quantization to [0,255]."""
    from pesr_tpu.data.augment import denormalize_to_uint8

    gen = Generator(scale=2, num_blocks=2, num_channels=16,
                    dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(2).uniform(
        -1, 1, (1, 24, 24, 3)), jnp.float32)
    variables = gen.init(jax.random.key(0), x)

    ref = np.asarray(denormalize_to_uint8(gen.apply(variables, x)))
    qparams = quantize_generator_params(variables["params"])
    got = np.asarray(denormalize_to_uint8(make_int8_apply(2, 0.1)(
        {"params": qparams}, x)))
    d = np.abs(got.astype(int) - ref.astype(int))
    # Random-weight nets are the PTQ worst case (no trained robustness);
    # a handful of uint8 steps max and sub-1 mean is the sanity bar —
    # trained-checkpoint quality is measured by test.py side-by-side.
    assert d.max() <= 6, d.max()
    assert d.mean() < 1.0, d.mean()
