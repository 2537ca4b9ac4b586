"""Tiled overlap-stitch inference tests (SURVEY.md §5.7; BASELINE.json:10).

Key invariant: with a halo larger than the generator's receptive field,
the tiled result equals the whole-image forward on the interior (the
border band legitimately differs: tiling replicate-pads at the true
image border while a whole-image SAME conv zero-pads)."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from pesr_tpu.data.augment import denormalize_to_uint8, normalize_uint8
from pesr_tpu.models import Generator
from pesr_tpu.ops.tiling import TiledUpscaler, _pad_replicate

SCALE = 2
# RF radius of num_blocks=2 generator: ~6 LR px < overlap 8.
GEN = Generator(scale=SCALE, num_blocks=2, num_channels=8,
                dtype=jnp.float32)


def _gen_params():
    return GEN.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))


def test_pad_replicate_large_pads():
    img = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    out = _pad_replicate(img, (5, 5, 3, 3))
    assert out.shape == (12, 8, 3)
    np.testing.assert_array_equal(out[0, 0], img[0, 0])
    np.testing.assert_array_equal(out[-1, -1], img[-1, -1])


def test_tiled_matches_whole_image_interior():
    variables = _gen_params()
    rng = np.random.default_rng(0)
    lr_u8 = rng.integers(0, 255, (40, 56, 3), dtype=np.uint8)

    tiler = TiledUpscaler(GEN.apply, variables, SCALE, tile_size=16,
                          overlap=8, batch_size=4)
    tiled = tiler.upscale(lr_u8)

    whole = np.asarray(denormalize_to_uint8(GEN.apply(
        variables, normalize_uint8(jnp.asarray(lr_u8[None])))[0]))

    assert tiled.shape == whole.shape == (80, 112, 3)
    m = 8 * SCALE  # exclude the padding-convention border band
    inner_t = tiled[m:-m, m:-m].astype(np.int16)
    inner_w = whole[m:-m, m:-m].astype(np.int16)
    # float32 everywhere -> at most off-by-one from uint8 rounding
    assert np.max(np.abs(inner_t - inner_w)) <= 1
    assert np.mean(inner_t != inner_w) < 0.01


def test_tiled_handles_image_smaller_than_tile():
    variables = _gen_params()
    lr_u8 = np.random.default_rng(1).integers(0, 255, (11, 9, 3),
                                              dtype=np.uint8)
    tiler = TiledUpscaler(GEN.apply, variables, SCALE, tile_size=32,
                          overlap=8, batch_size=2)
    sr = tiler.upscale(lr_u8)
    assert sr.shape == (22, 18, 3)


def test_batch_tiled_matches_host_tiled():
    """The device-resident pipeline must reproduce the host-stitching
    pipeline exactly (same tiles, same cores, same padding)."""
    from pesr_tpu.ops.tiling import BatchTiledUpscaler

    variables = _gen_params()
    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 255, (2, 30, 44, 3), dtype=np.uint8)

    host = TiledUpscaler(GEN.apply, variables, SCALE, tile_size=16,
                         overlap=8, batch_size=2)
    dev = BatchTiledUpscaler(GEN.apply, variables, SCALE, tile_size=16,
                             overlap=8)
    got = dev.upscale_batch(imgs)
    assert got.shape == (2, 60, 88, 3)
    for i in range(2):
        np.testing.assert_array_equal(got[i], host.upscale(imgs[i]))


def test_batch_tiled_upscale_many_mixed_sizes():
    """test.py's production path: upscale_many groups mixed-size images
    by shape, batches device-resident, and preserves input order; every
    output must equal the host-stitch engine's result exactly."""
    from pesr_tpu.ops.tiling import BatchTiledUpscaler

    variables = _gen_params()
    rng = np.random.default_rng(5)
    imgs = [rng.integers(0, 255, shp, dtype=np.uint8)
            for shp in [(30, 44, 3), (24, 24, 3), (30, 44, 3),
                        (24, 24, 3), (30, 44, 3)]]
    host = TiledUpscaler(GEN.apply, variables, SCALE, tile_size=16,
                         overlap=8, batch_size=2)
    dev = BatchTiledUpscaler(GEN.apply, variables, SCALE, tile_size=16,
                             overlap=8)
    dev.warmup_many(imgs, batch_size=2)
    got = dev.upscale_many(imgs, batch_size=2)
    assert len(got) == len(imgs)
    for im, sr in zip(imgs, got):
        assert sr.shape == (im.shape[0] * SCALE, im.shape[1] * SCALE, 3)
        np.testing.assert_array_equal(sr, host.upscale(im))


def test_single_tile_batch_equals_whole_image_exactly():
    """A grid dimension covered by one tile carries no halo, so the
    single-tile device engine IS the reference whole-image zero-pad
    SAME forward — bit-exact, including borders."""
    from pesr_tpu.ops.tiling import BatchTiledUpscaler, WholeImageUpscaler

    variables = _gen_params()
    rng = np.random.default_rng(6)
    imgs = rng.integers(0, 255, (2, 24, 30, 3), dtype=np.uint8)

    dev = BatchTiledUpscaler(GEN.apply, variables, SCALE,
                             tile_size=(24, 30), overlap=8)
    whole = WholeImageUpscaler(GEN.apply, variables, SCALE)
    got = dev.upscale_batch(imgs)
    for i in range(2):
        np.testing.assert_array_equal(got[i], whole.upscale(imgs[i]))


def test_batch_tiled_data_parallel_matches_single_device():
    """DP inference: the image batch sharded over an 8-device mesh must
    reproduce the single-device engine exactly, including an odd image
    count that pads to the mesh size (BASELINE config-4 multi-chip
    form)."""
    from pesr_tpu.ops.tiling import BatchTiledUpscaler
    from pesr_tpu.parallel import make_mesh

    variables = _gen_params()
    rng = np.random.default_rng(7)
    imgs = [rng.integers(0, 255, (24, 24, 3), dtype=np.uint8)
            for _ in range(5)]  # 5 images -> pads to 8 on the mesh

    solo = BatchTiledUpscaler(GEN.apply, variables, SCALE,
                              tile_size=16, overlap=8)
    dp = BatchTiledUpscaler(GEN.apply, variables, SCALE,
                            tile_size=16, overlap=8, mesh=make_mesh(8))
    ref = solo.upscale_many(imgs, batch_size=8)
    got = dp.upscale_many(imgs, batch_size=8)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(a, b)


def test_mesh_engine_reshards_device_resident_batch():
    """Round-2 review regression: a batch already on ONE device (e.g.
    bench.py's resident upload) fed to a mesh engine must be resharded
    across the mesh — the old ``hasattr(x, "sharding")`` guard never
    fired on jax arrays, so the jitted program got a single-device
    batch against mesh-replicated params."""
    from pesr_tpu.ops.tiling import BatchTiledUpscaler
    from pesr_tpu.parallel import batch_sharding, make_mesh

    variables = _gen_params()
    rng = np.random.default_rng(8)
    imgs = rng.integers(0, 255, (8, 24, 24, 3), dtype=np.uint8)

    mesh = make_mesh(8)
    dp = BatchTiledUpscaler(GEN.apply, variables, SCALE,
                            tile_size=16, overlap=8, mesh=mesh)
    solo = BatchTiledUpscaler(GEN.apply, variables, SCALE,
                              tile_size=16, overlap=8)

    resident = jax.device_put(imgs, jax.devices()[0])  # one device
    canvas = dp.upscale_batch_device(resident)
    assert canvas.sharding == batch_sharding(mesh)  # batch-sharded out
    h, w = imgs.shape[1:3]
    np.testing.assert_array_equal(
        np.asarray(canvas)[:, :h * SCALE, :w * SCALE],
        solo.upscale_batch(imgs))


def test_warmup_many_compiles_each_program_once():
    """warmup_many must run one forward per distinct compiled program,
    not one per chunk (round-2 review: 13 same-shape chunks used to run
    13 full zero-image upscales for 2 programs)."""
    from pesr_tpu.ops.tiling import BatchTiledUpscaler

    variables = _gen_params()
    eng = BatchTiledUpscaler(GEN.apply, variables, SCALE,
                             tile_size=16, overlap=8)
    calls = []
    orig = eng.upscale_batch_device
    eng.upscale_batch_device = lambda z: calls.append(z.shape) or orig(z)

    imgs = [np.zeros((24, 24, 3), np.uint8)] * 20
    eng.warmup_many(imgs, batch_size=8)  # chunks: 8, 8, 4
    assert sorted(calls) == [(4, 24, 24, 3), (8, 24, 24, 3)]


@pytest.mark.slow
def test_update_variables_hot_swaps_without_recompile():
    """Serving contract (README "Serving / embedding"): swapping
    checkpoints via update_variables changes the outputs, matches a
    fresh engine built with the new params, and reuses the compiled
    program (variables are a jit argument, not baked into the trace)."""
    from pesr_tpu.ops.tiling import BatchTiledUpscaler

    v0 = _gen_params()
    v1 = GEN.init(jax.random.key(9), jnp.zeros((1, 8, 8, 3)))
    rng = np.random.default_rng(10)
    imgs = rng.integers(0, 255, (2, 24, 24, 3), dtype=np.uint8)

    eng = BatchTiledUpscaler(GEN.apply, v0, SCALE, tile_size=16, overlap=8)
    out0 = eng.upscale_batch(imgs)
    eng.update_variables(v1)
    out1 = eng.upscale_batch(imgs)
    assert len(eng._compiled) == 1  # same program served both
    assert np.any(out0 != out1)

    fresh = BatchTiledUpscaler(GEN.apply, v1, SCALE, tile_size=16,
                               overlap=8)
    np.testing.assert_array_equal(out1, fresh.upscale_batch(imgs))


def test_tile_size_flag_parses_auto_int_and_zero():
    from pesr_tpu.config import opts_from_args
    assert opts_from_args((), mode="test").tile_size == "auto"
    assert opts_from_args(("--tile_size", "64"),
                          mode="test").tile_size == 64
    assert opts_from_args(("--tile_size", "0"), mode="test").tile_size == 0
    assert opts_from_args(("--tile_size", "auto"),
                          mode="test").tile_size == "auto"


def test_self_ensemble_shape_and_equivariance():
    """TTA output keeps shape, and averaging over the full dihedral
    group makes the estimator group-EQUIVARIANT: ensembling a transposed
    input must equal the transposed ensemble (catches any error in the
    transform/inverse bookkeeping)."""
    from pesr_tpu.ops.tiling import self_ensemble_upscale

    variables = _gen_params()
    tiler = TiledUpscaler(GEN.apply, variables, SCALE, tile_size=16,
                          overlap=8, batch_size=4)
    rng = np.random.default_rng(4)
    lr = rng.integers(0, 255, (20, 28, 3), dtype=np.uint8)
    out = self_ensemble_upscale(tiler, lr)
    assert out.shape == (40, 56, 3)
    assert out.dtype == np.uint8

    sq = rng.integers(0, 255, (20, 20, 3), dtype=np.uint8)
    a = self_ensemble_upscale(tiler, np.ascontiguousarray(
        np.swapaxes(sq, 0, 1)))
    b = np.swapaxes(self_ensemble_upscale(tiler, sq), 0, 1)
    # identical member sets, averaged in float, rounded once -> at most
    # a +-1 step from the round of a value landing on .5
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


def test_whole_image_mode_matches_direct_forward():
    """--tile_size 0 path: exact whole-image SAME-conv forward."""
    from pesr_tpu.ops.tiling import WholeImageUpscaler

    variables = _gen_params()
    lr = np.random.default_rng(5).integers(0, 255, (18, 26, 3),
                                           dtype=np.uint8)
    w = WholeImageUpscaler(GEN.apply, variables, SCALE)
    got = w.upscale(lr)
    ref = np.asarray(denormalize_to_uint8(GEN.apply(
        variables, normalize_uint8(jnp.asarray(lr[None])))[0]))
    np.testing.assert_array_equal(got, ref)
    assert len(w.upscale_many([lr, lr])) == 2


def test_upscale_many_matches_single():
    variables = _gen_params()
    rng = np.random.default_rng(2)
    imgs = [rng.integers(0, 255, (24 + 8 * i, 20, 3), dtype=np.uint8)
            for i in range(3)]
    tiler = TiledUpscaler(GEN.apply, variables, SCALE, tile_size=16,
                          overlap=8, batch_size=4)
    many = tiler.upscale_many(imgs)
    for img, sr in zip(imgs, many):
        np.testing.assert_array_equal(sr, tiler.upscale(img))


def test_auto_tile_chooser_budget_and_halo_rules():
    """The "auto" chooser takes one whole-image tile when the per-batch
    budget allows (no halo on single-tile dims), splits under pressure,
    and never exceeds the per-device budget."""
    from pesr_tpu.ops.tiling import BatchTiledUpscaler

    eng = BatchTiledUpscaler(lambda v, x: x, {}, 4, "auto", 8)

    # 510x336 at batch 8: fits the budget as ONE tile (the bench case).
    assert eng._tile_hw(510, 336, 8) == (510, 336)

    # Same image at batch 64: per-image budget shrinks -> must split,
    # and the padded tile area must respect the budget.
    th, tw = eng._tile_hw(510, 336, 64)
    assert th < 510 or tw < 336
    import math
    nh, nw = math.ceil(510 / th), math.ceil(336 / tw)
    area = ((th + 16 * (nh > 1)) * (tw + 16 * (nw > 1)))
    assert area <= max(eng._AUTO_PIXEL_BUDGET // 64, 136 * 96)

    # Fixed tiles pass through untouched.
    eng2 = BatchTiledUpscaler(lambda v, x: x, {}, 4, (24, 30), 8)
    assert eng2._tile_hw(100, 100, 8) == (24, 30)


def test_auto_tile_fallback_stays_positive_and_upscales():
    """When NO 16x16 grid candidate fits the budget (huge overlap vs a
    floored budget), the fallback square must stay positive — it used
    to go negative (sqrt(budget) - 2*overlap) and crash _build with
    negative pads (round-4 review).  The engine must still produce a
    correct-shaped output, since seam/fold semantics hold for any grid."""
    import numpy as np

    from pesr_tpu.ops.tiling import BatchTiledUpscaler
    from pesr_tpu.ops.pixel_shuffle import pixel_shuffle

    def apply_fn(variables, x):  # cheap scale-2 upsample apply
        return pixel_shuffle(jnp.tile(x, (1, 1, 1, 4)), 2)

    eng = BatchTiledUpscaler(apply_fn, {}, 2, "auto", 64)
    eng._AUTO_PIXEL_BUDGET = 1  # floors at 136*96 = 13056 < (x+128)^2
    th, tw = eng._tile_hw(200, 200, 1)
    assert th >= 32 and tw >= 32, (th, tw)
    img = np.random.default_rng(0).integers(
        0, 256, (1, 200, 200, 3), dtype=np.uint8)
    out = eng.upscale_batch(img)  # crops the padded grid canvas
    assert out.shape == (1, 400, 400, 3)


def test_self_ensemble_averages_unquantized_branches():
    """Round-2 review regression: branches must be averaged as floats
    and rounded ONCE.  Branch values 4x100.3 + 4x100.6 average to
    100.45 -> 100; averaging per-branch uint8 roundings (4x100 + 4x101)
    would give 100.5 -> 101."""
    from pesr_tpu.ops.tiling import self_ensemble_upscale

    class FakeTiler:
        def __init__(self):
            self.calls = 0

        def upscale_float(self, img):
            self.calls += 1
            v = 100.3 if self.calls <= 4 else 100.6
            h, w = img.shape[:2]
            return np.full((h * 2, w * 2, 3), v, np.float32)

    out = self_ensemble_upscale(FakeTiler(),
                                np.zeros((4, 4, 3), np.uint8))
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out, np.full((8, 8, 3), 100, np.uint8))


def test_batch_se_device_matches_host_composition():
    """Device-resident x8 TTA (round-2 verdict weak #8) must equal the
    numpy-composed reference built on the same engine's float program:
    verifies transform/inverse ordering, transposed-grid crops, and the
    single rounding."""
    from pesr_tpu.ops.tiling import BatchTiledUpscaler

    variables = _gen_params()
    rng = np.random.default_rng(11)
    imgs = rng.integers(0, 255, (2, 20, 28, 3), dtype=np.uint8)
    eng = BatchTiledUpscaler(GEN.apply, variables, SCALE, tile_size=16,
                             overlap=8)
    got = np.asarray(eng.upscale_batch_se_device(imgs))

    acc = None
    for t in range(8):
        b = imgs
        if t & 1:
            b = b[:, ::-1]
        if t & 2:
            b = b[:, :, ::-1]
        if t & 4:
            b = np.swapaxes(b, 1, 2)
        h2, w2 = b.shape[1:3]
        sr = np.asarray(eng._dispatch(
            np.ascontiguousarray(b), float_out=True)
        )[:, :h2 * SCALE, :w2 * SCALE]
        if t & 4:
            sr = np.swapaxes(sr, 1, 2)
        if t & 2:
            sr = sr[:, :, ::-1]
        if t & 1:
            sr = sr[:, ::-1]
        acc = sr if acc is None else acc + sr  # float32, device order
    want = np.clip(np.floor(acc / 8.0 + 0.5), 0, 255).astype(np.uint8)
    assert got.shape == want.shape == (2, 40, 56, 3)
    np.testing.assert_array_equal(got, want)


def test_batch_se_device_equivariant_model_is_identity():
    """With a dihedral-equivariant apply (nearest-neighbor upsample) all
    eight branches coincide, so SE must return exactly the plain
    upscale — any axis/ordering bug in the transform plumbing scatters
    pixels and breaks equality."""
    from pesr_tpu.ops.tiling import BatchTiledUpscaler

    def apply_fn(variables, x):
        return jnp.repeat(jnp.repeat(x, SCALE, axis=1), SCALE, axis=2)

    rng = np.random.default_rng(12)
    imgs = rng.integers(0, 255, (2, 20, 28, 3), dtype=np.uint8)
    eng = BatchTiledUpscaler(apply_fn, {}, SCALE, tile_size=16,
                             overlap=8)
    got = np.asarray(eng.upscale_batch_se_device(imgs))
    want = np.repeat(np.repeat(imgs, SCALE, axis=1), SCALE, axis=2)
    np.testing.assert_array_equal(got, want)


def test_batch_se_device_mesh_matches_single():
    """SE over a DP mesh: dihedral transforms never touch the batch
    axis, so the mesh engine must reproduce the single-device SE
    bit-exactly (and keep the batch sharded)."""
    from pesr_tpu.ops.tiling import BatchTiledUpscaler
    from pesr_tpu.parallel import make_mesh

    variables = _gen_params()
    rng = np.random.default_rng(13)
    imgs = rng.integers(0, 255, (8, 20, 20, 3), dtype=np.uint8)

    solo = BatchTiledUpscaler(GEN.apply, variables, SCALE, tile_size=16,
                              overlap=8)
    dp = BatchTiledUpscaler(GEN.apply, variables, SCALE, tile_size=16,
                            overlap=8, mesh=make_mesh(8))
    np.testing.assert_array_equal(
        np.asarray(dp.upscale_batch_se_device(imgs)),
        np.asarray(solo.upscale_batch_se_device(imgs)))


def test_upscale_many_se_flag_matches_batch_se():
    """test.py's --self_ensemble path: upscale_many(se=True) groups and
    batches exactly like the plain path but runs the SE kernel."""
    from pesr_tpu.ops.tiling import BatchTiledUpscaler

    variables = _gen_params()
    rng = np.random.default_rng(14)
    imgs = [rng.integers(0, 255, shp, dtype=np.uint8)
            for shp in [(20, 28, 3), (16, 16, 3), (20, 28, 3)]]
    eng = BatchTiledUpscaler(GEN.apply, variables, SCALE, tile_size=16,
                             overlap=8)
    eng.warmup_many(imgs, batch_size=2, se=True)
    got = eng.upscale_many(imgs, batch_size=2, se=True)
    for im, sr in zip(imgs, got):
        ref = np.asarray(eng.upscale_batch_se_device(im[None]))[0]
        np.testing.assert_array_equal(sr, ref)


def test_spatial_parallel_matches_single_device():
    """mesh_axis='tiles' (spatial parallelism): 8 devices cooperating on
    ONE image reproduce the single-device engine bitwise, including a
    tile count that pads to the mesh size (3x3 grid -> pad 7) and the
    replicated output canvas for downstream on-device consumers."""
    from pesr_tpu.ops.tiling import BatchTiledUpscaler
    from pesr_tpu.parallel import make_mesh, replicated

    variables = _gen_params()
    rng = np.random.default_rng(9)
    img = rng.integers(0, 255, (1, 37, 45, 3), dtype=np.uint8)

    solo = BatchTiledUpscaler(GEN.apply, variables, SCALE,
                              tile_size=16, overlap=8)
    mesh = make_mesh(8)
    sp = BatchTiledUpscaler(GEN.apply, variables, SCALE,
                            tile_size=16, overlap=8,
                            mesh=mesh, mesh_axis="tiles")
    np.testing.assert_array_equal(sp.upscale_batch(img),
                                  solo.upscale_batch(img))
    canvas = sp.upscale_batch_device(img)
    assert canvas.sharding == replicated(mesh)

    # batch > 1 rides along (tile axis still the sharded one).
    imgs = rng.integers(0, 255, (2, 37, 45, 3), dtype=np.uint8)
    np.testing.assert_array_equal(sp.upscale_batch(imgs),
                                  solo.upscale_batch(imgs))


def test_spatial_parallel_int8_fold_path():
    """Spatial mode composes with the folded int8 path: the min_halo
    floor applies per tile exactly as on one chip (bitwise)."""
    from pesr_tpu.models.quant_apply import (default_calib_tiles,
                                             int8_inference)
    from pesr_tpu.ops.tiling import BatchTiledUpscaler
    from pesr_tpu.parallel import make_mesh

    params = _gen_params()["params"]
    rng = np.random.default_rng(10)
    img = rng.integers(0, 255, (1, 40, 52, 3), dtype=np.uint8)
    apply_fn, variables = int8_inference(
        params, SCALE, default_calib_tiles([img[0]]))
    solo = BatchTiledUpscaler(apply_fn, variables, SCALE,
                              tile_size=16, overlap=8)
    sp = BatchTiledUpscaler(apply_fn, variables, SCALE,
                            tile_size=16, overlap=8,
                            mesh=make_mesh(8), mesh_axis="tiles")
    np.testing.assert_array_equal(sp.upscale_batch(img),
                                  solo.upscale_batch(img))


def test_spatial_parallel_self_ensemble():
    """x8 TTA through the spatial engine (float canvas path) matches the
    single-device device-resident self-ensemble bitwise."""
    from pesr_tpu.ops.tiling import BatchTiledUpscaler
    from pesr_tpu.parallel import make_mesh

    variables = _gen_params()
    rng = np.random.default_rng(11)
    img = rng.integers(0, 255, (1, 37, 29, 3), dtype=np.uint8)
    solo = BatchTiledUpscaler(GEN.apply, variables, SCALE,
                              tile_size=16, overlap=8)
    sp = BatchTiledUpscaler(GEN.apply, variables, SCALE,
                            tile_size=16, overlap=8,
                            mesh=make_mesh(8), mesh_axis="tiles")
    np.testing.assert_array_equal(
        np.asarray(sp.upscale_batch_se_device(img)),
        np.asarray(solo.upscale_batch_se_device(img)))


def test_spatial_auto_chooser_budgets_per_device():
    """In spatial mode the auto chooser budgets the WHOLE per-device
    tile batch (all tiles live at once) including mesh-pad tiles."""
    import math
    from pesr_tpu.ops.tiling import BatchTiledUpscaler
    from pesr_tpu.parallel import make_mesh

    mesh = make_mesh(8)
    eng = BatchTiledUpscaler(lambda v, x: x, {}, 4, "auto", 8,
                             mesh=mesh, mesh_axis="tiles")
    h, w, b = 2160, 3840, 1  # one 4K image across 8 chips
    th, tw = eng._tile_hw(h, w, b)
    nh, nw = math.ceil(h / th), math.ceil(w / tw)
    area = (th + 2 * eng._ov_for(nh)) * (tw + 2 * eng._ov_for(nw))
    per_dev = math.ceil(nh * nw / mesh.size)
    assert area * per_dev * b <= eng._AUTO_PIXEL_BUDGET
    assert nh * nw >= mesh.size  # big image: every chip gets real work


def test_mesh_axis_validation():
    from pesr_tpu.ops.tiling import BatchTiledUpscaler
    from pesr_tpu.parallel import make_mesh

    with pytest.raises(ValueError, match="mesh_axis"):
        BatchTiledUpscaler(lambda v, x: x, {}, 2, 16, 8,
                           mesh=make_mesh(None), mesh_axis="bogus")
    with pytest.raises(ValueError, match="requires a mesh"):
        BatchTiledUpscaler(lambda v, x: x, {}, 2, 16, 8,
                           mesh_axis="tiles")


def test_spatial_upscale_many_does_not_pad_batch():
    """Review regression: spatial mode ('tiles') shards the TILE axis,
    so upscale_many must NOT pad the image batch to a mesh multiple —
    that multiplied single-image work by up to mesh.size."""
    from pesr_tpu.ops.tiling import BatchTiledUpscaler
    from pesr_tpu.parallel import make_mesh
    mesh = make_mesh(8)
    variables = _gen_params()
    sp = BatchTiledUpscaler(GEN.apply, variables, SCALE, tile_size=16,
                            overlap=8, mesh=mesh, mesh_axis="tiles")
    calls = []
    orig = sp.upscale_batch_device
    sp.upscale_batch_device = lambda z: calls.append(z.shape) or orig(z)
    img = np.random.default_rng(0).integers(0, 255, (20, 28, 3),
                                            dtype=np.uint8)
    out = sp.upscale_many([img])
    assert len(out) == 1 and out[0].shape == (40, 56, 3)
    assert calls == [(1, 20, 28, 3)], calls  # batch 1, NOT padded to 8


def test_batch_engine_validates_tile_and_overlap():
    from pesr_tpu.ops.tiling import BatchTiledUpscaler
    variables = _gen_params()
    with pytest.raises(ValueError, match="tile_size"):
        BatchTiledUpscaler(GEN.apply, variables, SCALE, tile_size=0)
    with pytest.raises(ValueError, match="overlap"):
        BatchTiledUpscaler(GEN.apply, variables, SCALE, tile_size=16,
                           overlap=-1)
