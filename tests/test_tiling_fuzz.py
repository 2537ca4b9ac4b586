"""Property-style fuzz sweep over the tiled-inference engines.

The deterministic tests in test_tiling.py pin each engine's behavior at
hand-picked shapes; this sweep drives the SAME invariant — tiled output
matches the whole-image forward away from the padding-convention border
band — across a seeded grid of random image sizes, scales (incl. the
round-3 x3 factorization), tile geometries, and the float/folded apply
chains, so shape-dependent regressions (grid edge cases, mesh padding,
fold bands on odd dims) can't hide between the pinned shapes.

Kept cheap for the single-core harness: a tiny 2x8 generator, six
seeded combos, and programs that recur across combos reuse the
persistent compile cache.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pesr_tpu.data.augment import denormalize_to_uint8, normalize_uint8
from pesr_tpu.models import Generator
from pesr_tpu.models.fold import folded_inference
from pesr_tpu.ops.tiling import BatchTiledUpscaler

# RF radius of a 2-block body is ~6 LR px; overlap >= 8 keeps the
# interior of every tile exact w.r.t. the whole-image forward.
_OVERLAP = 8


def _whole(gen, variables, lr_u8):
    sr = gen.apply(variables, normalize_uint8(jnp.asarray(lr_u8[None])))
    return np.asarray(denormalize_to_uint8(sr[0]))


# (seed, scale, H, W, tile_size, batch) — sizes chosen to hit: odd dims,
# tile grids that don't divide the image, single-tile dims, images
# smaller than the tile, and the "auto" chooser.
_COMBOS = [
    (0, 2, 37, 53, 16, 1),
    (1, 3, 41, 30, (24, 16), 2),
    (2, 4, 29, 29, 24, 1),
    (3, 2, 19, 64, "auto", 2),
    (4, 3, 15, 13, 32, 1),   # whole image smaller than one tile
    (5, 4, 48, 21, 16, 3),
]


@pytest.mark.parametrize("seed,scale,h,w,tile,batch", _COMBOS)
def test_fuzz_tiled_matches_whole_image(seed, scale, h, w, tile, batch):
    gen = Generator(scale=scale, num_blocks=2, num_channels=8,
                    dtype=jnp.float32)
    variables = gen.init(jax.random.key(seed), jnp.zeros((1, 8, 8, 3)))
    rng = np.random.default_rng(seed)
    imgs = rng.integers(0, 256, (batch, h, w, 3), dtype=np.uint8)

    tiler = BatchTiledUpscaler(gen.apply, variables, scale,
                               tile_size=tile, overlap=_OVERLAP)
    # upscale_batch = the cropped host API (upscale_batch_device returns
    # the padded canvas by documented contract).
    tiled = tiler.upscale_batch(imgs)
    assert tiled.shape == (batch, h * scale, w * scale, 3)

    m = _OVERLAP * scale
    for b in range(batch):
        whole = _whole(gen, variables, imgs[b])
        inner_t = tiled[b, m:-m, m:-m].astype(np.int16)
        inner_w = whole[m:-m, m:-m].astype(np.int16)
        if inner_t.size == 0:  # image too small to have an interior
            continue
        assert np.max(np.abs(inner_t - inner_w)) <= 1
        assert np.mean(inner_t != inner_w) < 0.02


@pytest.mark.parametrize("seed,scale,h,w", [
    (10, 2, 33, 47), (11, 3, 27, 38), (12, 4, 44, 23), (13, 6, 25, 31),
])
def test_fuzz_folded_engine_shape_and_interior(seed, scale, h, w):
    """Folded chain (interior-exact only, carries min_halo) through the
    engine at fuzzed shapes: shape contract + interior agreement with
    the UNFOLDED whole-image forward."""
    gen = Generator(scale=scale, num_blocks=2, num_channels=8,
                    dtype=jnp.float32)
    variables = gen.init(jax.random.key(seed), jnp.zeros((1, 8, 8, 3)))
    apply_fn, fvars = folded_inference(variables["params"], scale,
                                       dtype=jnp.float32)
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (1, h, w, 3), dtype=np.uint8)

    tiler = BatchTiledUpscaler(apply_fn, fvars, scale, tile_size=16,
                               overlap=_OVERLAP)
    tiled = tiler.upscale_batch(img)
    assert tiled.shape == (1, h * scale, w * scale, 3)

    whole = _whole(gen, variables, img[0])
    m = _OVERLAP * scale
    inner_t = tiled[0, m:-m, m:-m].astype(np.int16)
    inner_w = whole[m:-m, m:-m].astype(np.int16)
    if inner_t.size:
        assert np.max(np.abs(inner_t - inner_w)) <= 1
        assert np.mean(inner_t != inner_w) < 0.02


@pytest.mark.parametrize("seed,scale,h,w,tile", [
    (20, 2, 31, 45, 16), (21, 4, 26, 39, (16, 24)), (22, 3, 40, 22, 20),
])
def test_fuzz_int8_engine_interior(seed, scale, h, w, tile):
    """The int8 W8A8 engine (headline path) at fuzzed shapes: uint8
    canvas within quantization distance of the bf16-chain whole-image
    forward on the interior.  int8 brings real quantization error, so
    the tolerance is looser than the float sweeps — but structural bugs
    (grid shifts, fold-band corruption) show up as O(100) diffs."""
    from pesr_tpu.models.quant_apply import (default_calib_tiles,
                                             int8_inference)

    gen = Generator(scale=scale, num_blocks=2, num_channels=8,
                    dtype=jnp.float32)
    variables = gen.init(jax.random.key(seed), jnp.zeros((1, 8, 8, 3)))
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (1, h, w, 3), dtype=np.uint8)

    apply_fn, qvars = int8_inference(variables["params"], scale,
                                     default_calib_tiles([img[0]]))
    tiler = BatchTiledUpscaler(apply_fn, qvars, scale, tile_size=tile,
                               overlap=_OVERLAP)
    tiled = tiler.upscale_batch(img)
    assert tiled.shape == (1, h * scale, w * scale, 3)

    whole = _whole(gen, variables, img[0])
    m = _OVERLAP * scale
    inner_t = tiled[0, m:-m, m:-m].astype(np.int16)
    inner_w = whole[m:-m, m:-m].astype(np.int16)
    if inner_t.size:
        assert np.max(np.abs(inner_t - inner_w)) <= 12
        assert np.mean(np.abs(inner_t - inner_w)) < 1.5
