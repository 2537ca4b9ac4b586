"""Native data-loader core tests (pesr_tpu/data/native; SURVEY.md §1
DataLoader-worker equivalent).  Skipped wholesale when the C++ toolchain
or libpng is unavailable — the Python pipeline is the fallback there."""

import numpy as np
import pytest

native = pytest.importorskip("pesr_tpu.data.native")

if not native.available():
    pytest.skip("native data library not buildable here",
                allow_module_level=True)


def test_png_decode_matches_pil(tmp_path):
    from pesr_tpu.utils.image_io import imread_uint8, imwrite_uint8
    img = np.random.default_rng(0).integers(0, 255, (41, 29, 3),
                                            dtype=np.uint8)
    p = str(tmp_path / "x.png")
    imwrite_uint8(p, img)
    np.testing.assert_array_equal(native.decode_png(p), imread_uint8(p))
    np.testing.assert_array_equal(native.decode_png(p), img)


def test_sampler_deterministic_and_in_bounds():
    rng = np.random.default_rng(1)
    imgs = [rng.integers(0, 255, (48 + 16 * i, 64, 3), dtype=np.uint8)
            for i in range(4)]
    s1 = native.NativePatchSampler(imgs, patch_hr=32, batch=64, seed=9)
    s2 = native.NativePatchSampler(imgs, patch_hr=32, batch=64, seed=9,
                                   threads=1)
    a = s1.sample(0)
    # thread count must not change results (per-element RNG streams)
    np.testing.assert_array_equal(a, s2.sample(0))
    assert a.shape == (64, 32, 32, 3)
    assert not np.array_equal(a, s1.sample(1))

    # every patch must be a real crop of some source image
    found = 0
    for b in range(8):
        patch = a[b]
        for im in imgs:
            h, w = im.shape[:2]
            for y in range(h - 31):
                row = im[y:y + 32]
                # cheap containment check via first-row scan
                if patch[0].tobytes() in row[0].tobytes():
                    found += 1
                    break
            else:
                continue
            break
    assert found == 8


def test_sampler_rejects_bad_inputs():
    img = np.zeros((16, 16, 3), np.uint8)
    with pytest.raises(ValueError, match="smaller than patch"):
        native.NativePatchSampler([img], patch_hr=32, batch=2, seed=0)
    with pytest.raises(ValueError, match="HWC uint8"):
        native.NativePatchSampler([img.astype(np.float32)], 8, 2, 0)


def test_make_train_iterator_uses_native_sampler():
    from pesr_tpu.config import Opts
    from pesr_tpu.data.datasets import make_train_iterator

    opts = Opts(train_dataset="synthetic", patch_size=8, batch_size=4)
    it, lr_from_files = make_train_iterator(opts)
    assert not lr_from_files
    lr, hr = next(it)
    assert lr is None
    assert hr.shape == (4, 32, 32, 3)
    it.close()


def test_native_png_encode_roundtrip(tmp_path):
    """Native libpng encoder: write -> native decode AND PIL decode must
    both reproduce the array exactly (PNG is lossless)."""
    from pesr_tpu.data import native
    if not native.available():
        import pytest
        pytest.skip("native library unavailable")
    from pesr_tpu.utils.image_io import imread_uint8, imwrite_uint8

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (65, 43, 3), dtype=np.uint8)
    path = str(tmp_path / "x.png")
    native.encode_png(path, img)
    np.testing.assert_array_equal(native.decode_png(path), img)
    np.testing.assert_array_equal(imread_uint8(path), img)

    # imwrite_uint8 routes PNGs through the native encoder
    path2 = str(tmp_path / "sub" / "y.png")
    imwrite_uint8(path2, img)
    np.testing.assert_array_equal(imread_uint8(path2), img)
