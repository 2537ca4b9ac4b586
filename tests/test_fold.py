"""Folded-upsampler numerics (models/fold.py): the linear
conv->PixelShuffle->...->out chain collapsed to one conv + one
depth-to-space must reproduce the reference generator exactly on the
interior, and bit-exactly through the tiled engines (halo > fold
radius)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pesr_tpu.models import Generator
from pesr_tpu.models.fold import (fold_upsampler, folded_inference,
                                  make_folded_apply, fold_generator_params)
from pesr_tpu.scales import fold_min_halo


def _gen(scale, blocks=2, ch=8):
    return Generator(scale=scale, num_blocks=blocks, num_channels=ch,
                     dtype=jnp.float32)


@pytest.mark.parametrize("scale", [1, 2, 3, 4, 6, 8])
def test_folded_matches_reference_interior(scale):
    gen = _gen(scale)
    variables = gen.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
    params = variables["params"]

    apply_fn, fold_vars = folded_inference(params, scale,
                                           dtype=jnp.float32)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 20, 16, 3)), jnp.float32)

    ref = np.asarray(gen.apply(variables, x))
    got = np.asarray(apply_fn(fold_vars, x))
    assert got.shape == ref.shape

    # Interior = everything further than (num_stages+1) LR px from the
    # border (the chain zero-pads intermediates; the fold pads only its
    # input).
    r = max(1, fold_min_halo(scale)) * scale
    np.testing.assert_allclose(got[:, r:-r, r:-r], ref[:, r:-r, r:-r],
                               atol=2e-5)
    # ... and the borders must actually differ somewhere for scale>1
    # (proves the interior crop above is load-bearing, not vacuous).
    if scale > 1:
        assert np.abs(got - ref).max() > np.abs(
            got[:, r:-r, r:-r] - ref[:, r:-r, r:-r]).max()


def test_fold_kernel_support_is_tight():
    """The trimmed kernel has no all-zero border ring and the radius is
    <= num_stages + 1 (stays inside the default tile halo of 8)."""
    gen = _gen(4)
    params = gen.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))["params"]
    kernel, bias, (lo, hi) = fold_upsampler(params, 4)
    size = kernel.shape[0]
    assert size == lo + hi + 1
    assert lo <= 3 and hi <= 3
    assert np.any(kernel[0] != 0) or np.any(kernel[:, 0] != 0)
    assert np.any(kernel[-1] != 0) or np.any(kernel[:, -1] != 0)
    assert kernel.shape[2:] == (8, 3 * 16) and bias.shape == (48,)


def test_folded_tiled_inference_is_exact():
    """Through BatchTiledUpscaler the fold's border band falls entirely
    inside the cropped halo (overlap 8 > fold radius 3), so tiled SR
    outputs match the unfolded apply at f32 up to uint8-quantization
    ties (the composite reassociates f32 sums, so a value sitting
    exactly on a .5 rounding boundary can flip by one code)."""
    from pesr_tpu.ops.tiling import BatchTiledUpscaler

    scale = 4
    gen = _gen(scale)
    variables = gen.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
    apply_fold, fold_vars = folded_inference(variables["params"], scale,
                                             dtype=jnp.float32)

    rng = np.random.default_rng(2)
    imgs = rng.integers(0, 255, (2, 30, 44, 3), dtype=np.uint8)

    ref_engine = BatchTiledUpscaler(gen.apply, variables, scale,
                                    tile_size=16, overlap=8)
    fold_engine = BatchTiledUpscaler(apply_fold, fold_vars, scale,
                                     tile_size=16, overlap=8)
    got = fold_engine.upscale_batch(imgs).astype(np.int16)
    ref = ref_engine.upscale_batch(imgs).astype(np.int16)
    diff = np.abs(got - ref)
    assert diff.max() <= 1, diff.max()
    assert np.mean(diff > 0) < 1e-4, np.mean(diff > 0)


def test_folded_single_tile_borders_not_corrupt():
    """Round-2 review regression: a single-tile grid must still pad +
    crop the fold band (min_halo), or image borders are computed from a
    zero-padded folded conv that matches nothing (measured 132/255 max
    border error before the fix).  With the floor honored, the folded
    single-tile output equals the UNFOLDED apply run with identical
    replicate-padding, everywhere including borders."""
    from pesr_tpu.ops.tiling import BatchTiledUpscaler

    scale = 4
    gen = _gen(scale)
    variables = gen.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
    apply_fold, fold_vars = folded_inference(variables["params"], scale,
                                             dtype=jnp.float32)
    assert apply_fold.min_halo == 3

    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 255, (2, 24, 30, 3), dtype=np.uint8)

    # Single tile covers the image in both engines; the reference engine
    # is forced to the same 3-px replicate halo so padding semantics
    # match and the comparison isolates fold-vs-chain numerics.
    fold_engine = BatchTiledUpscaler(apply_fold, fold_vars, scale,
                                     tile_size=(24, 30), overlap=8)
    assert fold_engine._ov_for(1) == 3  # floor honored on single tiles
    # ... and multi-tile dims never go below the floor either, even
    # when the user passes a smaller overlap.
    tiny_ov = BatchTiledUpscaler(apply_fold, fold_vars, scale,
                                 tile_size=16, overlap=1)
    assert tiny_ov._ov_for(2) == 3
    ref_engine = BatchTiledUpscaler(gen.apply, variables, scale,
                                    tile_size=(24, 30), overlap=8,
                                    min_halo=3)
    got = fold_engine.upscale_batch(imgs).astype(np.int16)
    ref = ref_engine.upscale_batch(imgs).astype(np.int16)
    diff = np.abs(got - ref)
    assert diff.max() <= 1, diff.max()  # uint8 rounding ties only


def test_folded_whole_image_engine_pads_fold_band():
    """WholeImageUpscaler must likewise honor a folded apply's min_halo:
    its output equals the single-tile device engine's (same replicate
    pad + crop path) bit-for-bit."""
    from pesr_tpu.ops.tiling import BatchTiledUpscaler, WholeImageUpscaler

    scale = 4
    gen = _gen(scale)
    params = gen.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))["params"]
    apply_fold, fold_vars = folded_inference(params, scale,
                                             dtype=jnp.float32)

    rng = np.random.default_rng(4)
    img = rng.integers(0, 255, (20, 26, 3), dtype=np.uint8)

    whole = WholeImageUpscaler(apply_fold, fold_vars, scale)
    assert whole.min_halo == 3
    dev = BatchTiledUpscaler(apply_fold, fold_vars, scale,
                             tile_size=(20, 26), overlap=8)
    np.testing.assert_array_equal(whole.upscale(img),
                                  dev.upscale_batch(img[None])[0])


def test_host_tiler_small_overlap_raised_without_shift():
    """Round-2 review regression: TiledUpscaler raises a too-small
    overlap to the fold's min_halo — the raised value must drive BOTH
    the tile cut and the jitted crop, or every stitched core shifts by
    (raised - requested) * scale HR pixels (12 px at x4)."""
    from pesr_tpu.ops.tiling import TiledUpscaler

    scale = 4
    gen = _gen(scale)
    params = gen.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))["params"]
    apply_fold, fold_vars = folded_inference(params, scale,
                                             dtype=jnp.float32)

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)

    raised = TiledUpscaler(apply_fold, fold_vars, scale, tile_size=16,
                           overlap=0)  # raised to min_halo=3
    assert raised.ov == 3
    explicit = TiledUpscaler(apply_fold, fold_vars, scale, tile_size=16,
                             overlap=3)
    # Same effective overlap -> identical cut AND crop: bit-equal.  The
    # pre-fix bug cut with ov=3 but cropped with ov=0, shifting every
    # stitched core by 12 HR px relative to this.
    np.testing.assert_array_equal(raised.upscale(img),
                                  explicit.upscale(img))


def test_fold_params_roundtrip_shapes():
    gen = _gen(2)
    params = gen.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))["params"]
    folded = fold_generator_params(params, 2)
    pads = folded.pop("_pads")
    apply_fn = make_folded_apply(2, dtype=jnp.float32, pads=pads)
    y = apply_fn({"params": folded},
                 jnp.zeros((1, 12, 12, 3), jnp.float32))
    assert y.shape == (1, 24, 24, 3)


def test_uint8_variant_bitwise_matches_denormalized_float_apply():
    """apply.uint8_variant quantizes BEFORE the depth-to-space shuffle;
    since denormalize_to_uint8 is per-element it must commute with the
    shuffle BITWISE for both the folded-bf16 and int8 chains."""
    from pesr_tpu.data.augment import denormalize_to_uint8, normalize_uint8
    from pesr_tpu.models.quant_apply import (default_calib_tiles,
                                             int8_inference)

    scale = 2
    gen = _gen(scale)
    params = gen.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))["params"]
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (2, 20, 24, 3), dtype=np.uint8)
    x = normalize_uint8(jnp.asarray(img))

    for apply_fn, variables in (
            folded_inference(params, scale, dtype=jnp.float32),
            int8_inference(params, scale, default_calib_tiles([img[0]]))):
        u8 = apply_fn.uint8_variant
        assert u8.min_halo == apply_fn.min_halo
        np.testing.assert_array_equal(
            np.asarray(u8(variables, x)),
            np.asarray(denormalize_to_uint8(apply_fn(variables, x))))


def test_engines_with_and_without_uint8_variant_agree():
    """The tiled engines must produce identical canvases whether they
    ride the uint8_variant or the float apply + late denormalize."""
    from pesr_tpu.ops.tiling import BatchTiledUpscaler, WholeImageUpscaler

    scale = 2
    gen = _gen(scale)
    params = gen.init(jax.random.key(1), jnp.zeros((1, 8, 8, 3)))["params"]
    apply_fn, fvars = folded_inference(params, scale, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, (2, 21, 33, 3), dtype=np.uint8)

    with_variant = BatchTiledUpscaler(apply_fn, fvars, scale,
                                      tile_size=16).upscale_batch(imgs)

    import types

    def stripped(fn):
        bare = types.FunctionType(fn.__code__, fn.__globals__,
                                  fn.__name__, fn.__defaults__,
                                  fn.__closure__)
        bare.min_halo = fn.min_halo  # keep the correctness floor
        return bare

    without = BatchTiledUpscaler(stripped(apply_fn), fvars, scale,
                                 tile_size=16).upscale_batch(imgs)
    np.testing.assert_array_equal(with_variant, without)

    whole_v = WholeImageUpscaler(apply_fn, fvars, scale).upscale(imgs[0])
    whole_p = WholeImageUpscaler(stripped(apply_fn), fvars,
                                 scale).upscale(imgs[0])
    np.testing.assert_array_equal(whole_v, whole_p)


@pytest.mark.parametrize("scale", [1, 2, 3, 4, 6, 8])
def test_analytic_fold_matches_probe(scale):
    """The differentiable analytic composition (analytic_fold_upsampler)
    and the impulse probe (fold_upsampler) are two independent
    derivations of the same composite operator: applied to the same
    input they must agree everywhere INCLUDING borders (both are "one
    zero-padded conv with the composite kernel"), up to f32
    reassociation noise."""
    from pesr_tpu.models.fold import analytic_fold_upsampler

    gen = _gen(scale)
    params = gen.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))["params"]
    k_p, b_p, pads_p = fold_upsampler(params, scale)
    if scale == 1:
        out_p = params["out"]
        k_a, b_a, pads_a = analytic_fold_upsampler({}, out_p, scale)
    else:
        k_a, b_a, pads_a = analytic_fold_upsampler(
            params["upsampler"], params["out"], scale)

    base = {k: params[k] for k in ("head", "body", "tail")}
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (1, 12, 10, 3)), jnp.float32)
    apply_p = make_folded_apply(scale, dtype=jnp.float32, pads=pads_p)
    apply_a = make_folded_apply(scale, dtype=jnp.float32, pads=pads_a)
    out_probe = np.asarray(apply_p(
        {"params": {**base, "upfold": {"kernel": jnp.asarray(k_p),
                                       "bias": jnp.asarray(b_p)}}}, x))
    out_analytic = np.asarray(apply_a(
        {"params": {**base, "upfold": {"kernel": k_a, "bias": b_a}}}, x))
    scale_mag = max(1.0, float(np.abs(out_probe).max()))
    np.testing.assert_allclose(out_analytic, out_probe,
                               atol=2e-4 * scale_mag)


def test_analytic_fold_gradients_reach_canonical_params():
    """Gradients must flow THROUGH the fold back to the canonical
    upsampler/out weights, and — on an interior-cropped loss, where the
    folded and unfolded forwards agree exactly — match the unfolded
    generator's gradients for EVERY parameter (head/body/tail too)."""
    from pesr_tpu.models.fold import make_fold_train_apply

    scale = 4
    gen = _gen(scale)
    variables = gen.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
    params = variables["params"]
    fold_apply = make_fold_train_apply(scale, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(2).standard_normal(
        (2, 12, 12, 3)), jnp.float32)
    r = fold_min_halo(scale) * scale

    def loss_folded(p):
        y = fold_apply({"params": p}, x)
        return jnp.mean(jnp.abs(y[:, r:-r, r:-r]))

    def loss_ref(p):
        y = gen.apply({"params": p}, x)
        return jnp.mean(jnp.abs(y[:, r:-r, r:-r]))

    g_fold = jax.grad(loss_folded)(params)
    g_ref = jax.grad(loss_ref)(params)
    flat_f, _ = jax.tree_util.tree_flatten_with_path(g_fold)
    flat_r = dict(jax.tree_util.tree_flatten_with_path(g_ref)[0])
    assert flat_f, "no gradients produced"
    for path, gf in flat_f:
        gr = flat_r[path]
        denom = max(1e-3, float(np.abs(np.asarray(gr)).max()))
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=5e-4 * denom,
            err_msg=jax.tree_util.keystr(path))
        assert np.any(np.asarray(gf) != 0.0), jax.tree_util.keystr(path)


def test_fold_train_variants_identical():
    """remat/unroll are schedule choices: outputs must be identical."""
    from pesr_tpu.models.fold import make_fold_train_apply

    scale = 2
    gen = _gen(scale)
    params = gen.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))["params"]
    x = jnp.asarray(np.random.default_rng(3).standard_normal(
        (1, 9, 9, 3)), jnp.float32)
    base = make_fold_train_apply(scale, dtype=jnp.float32)
    out0 = np.asarray(base({"params": params}, x))
    for kw in ({"remat": True}, {"unroll": True}):
        fn = make_fold_train_apply(scale, dtype=jnp.float32, **kw)
        np.testing.assert_array_equal(
            np.asarray(fn({"params": params}, x)), out0, err_msg=str(kw))
    assert base.min_halo == fold_min_halo(scale)


def test_fold_train_scale1_no_upsampler():
    """Review regression: a scale-1 Generator has no 'upsampler' params
    entry; the train fold must degrade to the bare out conv instead of
    KeyError'ing, and match the reference forward on the interior."""
    from pesr_tpu.models.fold import make_fold_train_apply

    gen = _gen(1)
    variables = gen.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
    fold_apply = make_fold_train_apply(1, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(5).standard_normal(
        (1, 9, 9, 3)), jnp.float32)
    got = np.asarray(fold_apply(variables, x))
    ref = np.asarray(gen.apply(variables, x))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_fold_train_pretrain_step_learns():
    """make_pretrain_step with the fold_train apply: the loss decreases
    and the updated params stay finite — the end-to-end opt-in path."""
    from pesr_tpu.config import Opts
    from pesr_tpu.models.fold import make_fold_train_apply
    from pesr_tpu.training.state import create_generator_state
    from pesr_tpu.training.steps import make_pretrain_step

    opts = Opts(num_blocks=2, num_channels=8, patch_size=12, batch_size=4,
                scale=2, learning_rate=1e-3, fold_train=True)
    gen = _gen(2)
    g_state = create_generator_state(opts, gen, jax.random.key(0))
    g_state = g_state.replace(apply_fn=make_fold_train_apply(
        opts.scale, opts.res_scale, jnp.float32))
    step = make_pretrain_step(opts)

    rng = np.random.default_rng(4)
    lr_img = jnp.asarray(rng.standard_normal((4, 12, 12, 3)) * 0.3,
                         jnp.float32)
    hr_img = jnp.asarray(
        np.repeat(np.repeat(np.asarray(lr_img), 2, axis=1), 2, axis=2))
    losses = []
    for _ in range(8):
        g_state, metrics = step(g_state, lr_img, hr_img)
        losses.append(float(metrics["l1"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses
