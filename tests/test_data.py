"""Data pipeline tests (SURVEY.md §4): datasets, augmentation, alignment."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pesr_tpu.config import Opts
from pesr_tpu.data import (augment_batch, denormalize_to_uint8,
                           normalize_uint8, prepare_train_batch)
from pesr_tpu.data.datasets import (PatchIterator, Prefetcher,
                                    SyntheticImages,
                                    host_bicubic_downsample, load_eval_set)


def test_synthetic_images_deterministic():
    a = SyntheticImages(4, 64, 64, seed=7)
    b = SyntheticImages(4, 64, 64, seed=7)
    np.testing.assert_array_equal(a.get(2), b.get(2))
    assert a.get(0).dtype == np.uint8
    assert a.get(0).shape == (64, 64, 3)
    assert not np.array_equal(a.get(0), a.get(1))


def test_synthetic_renders_pinned_across_code_versions():
    """Committed checkpoints were trained on — and committed PSNR/PI
    tables evaluated on — these exact default-size renders.  Any edit
    to _render/_render_hard that changes the bytes silently invalidates
    every number in demo/README.md; pin the sha256 of image 0 (both
    variants, default seed/size) so such a change fails loudly."""
    import hashlib
    PINS = {
        "classic": "105bfd4233e73a067ef96b456d37baa5"
                   "19dc349129dc65170305bd57564bf7a5",
        "hard": "fe1e105d0c6dcb94e0c29aac3c9a2349"
                "43f998c1a9bc23b4e5b14554d2eecc70",
        "hard_x4": "7c3752b93d2550b4b3322268415c22ac"
                   "f697f9970d0887cbe7b823aa13fe7b37",
    }
    for variant, want in PINS.items():
        img = SyntheticImages(1, 480, 480, variant=variant).get(0)
        assert hashlib.sha256(img.tobytes()).hexdigest() == want, variant


def test_synthetic_hard_renders_at_small_canvases():
    """The hard variant's checkerboard block used to raise ValueError
    (rng.integers low >= high) for height/width <= 96; the clamps must
    keep every small canvas legal (and the pin above proves they left
    the default renders byte-identical)."""
    for variant in ("classic", "hard", "hard_x4"):
        for size in (32, 48, 64, 96):
            img = SyntheticImages(1, size, size, variant=variant).get(0)
            assert img.shape == (size, size, 3)
            assert img.dtype == np.uint8


def test_synthetic_hard_x4_band_sits_below_x4_nyquist():
    """The hard_x4 corpus exists to give the contract scale (x4) a
    hard-content quality row (round-4 verdict weak #4): its feature
    energy must sit BELOW the x4 LR Nyquist (0.125 cycles/px) so a
    learned x4 model can restore it — unlike ``hard``, whose 0.1-0.35
    band makes x4 a negative control.  Pin the spectral contract: the
    restorable band (0.044-0.125 cyc/px) carries >4x the energy share
    it does in ``hard``, and <10% of total energy sits above Nyquist."""
    def shares(img):
        g = img.mean(-1).astype(np.float64)
        g -= g.mean()
        F = np.abs(np.fft.rfft2(g)) ** 2
        fy = np.fft.fftfreq(g.shape[0])[:, None]
        fx = np.fft.rfftfreq(g.shape[1])[None, :]
        r = np.hypot(fy, fx)
        tot = F.sum()
        band = F[(r >= 0.044) & (r < 0.125)].sum() / tot
        above = F[r >= 0.125].sum() / tot
        return band, above

    x4_band, x4_above = shares(
        SyntheticImages(1, 480, 480, variant="hard_x4").get(0))
    h_band, _ = shares(SyntheticImages(1, 480, 480, variant="hard").get(0))
    assert x4_band > 4 * h_band, (x4_band, h_band)
    assert x4_above < 0.10, x4_above


def test_synthetic_hard_x4_resolves_as_dataset_name():
    """--train_dataset/--test_dataset synthetic_hard_x4 must reach the
    new variant through both resolvers (train source + eval set)."""
    from pesr_tpu.data.datasets import _resolve_train_source

    opts = Opts(train_dataset="synthetic_hard_x4", scale=4)
    src = _resolve_train_source(opts)
    assert isinstance(src, SyntheticImages) and src.variant == "hard_x4"
    samples = load_eval_set(opts, "synthetic_hard_x4", 2)
    assert len(samples) == 2
    assert samples[0].name.startswith("synthhardx4_")


def test_patch_iterator_synthesized_lr_alignment():
    src = SyntheticImages(2, 96, 96, seed=0)
    it = PatchIterator(src, patch_size=8, scale=4, batch_size=3, seed=1)
    lr, hr = next(it)
    assert lr is None
    assert hr.shape == (3, 32, 32, 3)
    assert hr.dtype == np.uint8


def test_normalize_roundtrip():
    x = np.arange(256, dtype=np.uint8).reshape(1, 16, 16, 1)
    x = np.repeat(x, 3, axis=-1)
    back = np.asarray(denormalize_to_uint8(normalize_uint8(jnp.asarray(x))))
    np.testing.assert_array_equal(back, x)


def test_augment_applies_same_symmetry_to_lr_and_hr():
    """pool2x2(augment(HR)) must equal augment(pool2x2(HR)): 2x2 mean
    pooling commutes with every dihedral symmetry, so this holds iff the
    SAME symmetry was applied to both resolutions."""
    def pool(x):
        b, h, w, c = x.shape
        return x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))

    rng = np.random.default_rng(0)
    hr = rng.integers(0, 255, (4, 8, 8, 3)).astype(np.float32)
    lr = pool(hr)
    for seed in range(5):
        alr, ahr = augment_batch(jax.random.key(seed), jnp.asarray(lr),
                                 jnp.asarray(hr))
        np.testing.assert_allclose(np.asarray(alr),
                                   pool(np.asarray(ahr)), rtol=1e-6)


def test_augment_hits_multiple_symmetries():
    x = jnp.asarray(np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1))
    seen = set()
    for seed in range(24):
        a, _ = augment_batch(jax.random.key(seed), x, x)
        seen.add(np.asarray(a).tobytes())
    assert len(seen) >= 6  # most of the 8 dihedral elements observed


def test_prepare_train_batch_synthetic_lr_shape():
    hr = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, (2, 32, 32, 3), dtype=np.uint8))
    lr, hrf = prepare_train_batch(jax.random.key(0), hr, scale=4)
    assert lr.shape == (2, 8, 8, 3)
    assert hrf.shape == (2, 32, 32, 3)
    assert float(jnp.max(jnp.abs(hrf))) <= 1.0
    # LR must look like a downsample: mean preserved approximately
    np.testing.assert_allclose(float(jnp.mean(lr)), float(jnp.mean(hrf)),
                               atol=0.02)


def test_host_bicubic_downsample_matches_device_op():
    from pesr_tpu.ops import imresize
    rng = np.random.default_rng(1)
    hr = rng.integers(0, 255, (32, 24, 3), dtype=np.uint8)
    host = host_bicubic_downsample(hr, 4).astype(np.float64)
    dev = np.asarray(imresize(jnp.asarray(hr, jnp.float32), (8, 6)))
    np.testing.assert_allclose(host, np.clip(np.round(dev), 0, 255),
                               atol=1.0)


def test_prefetcher_passthrough_and_close():
    pf = Prefetcher(iter(range(10)), depth=2)
    assert list(pf) == list(range(10))
    pf2 = Prefetcher(iter(range(1000)), depth=2)
    assert next(pf2) == 0
    pf2.close()


def test_load_eval_set_synthetic():
    opts = Opts(test_dataset="synthetic", scale=4)
    samples = load_eval_set(opts, max_images=2)
    assert len(samples) == 2
    s = samples[0]
    assert s.hr.shape[0] == s.lr.shape[0] * 4
    assert s.hr.dtype == np.uint8 and s.lr.dtype == np.uint8


def test_make_train_iterator_shards_per_process(monkeypatch):
    """Multi-host contract (round-2 review): each process must feed a
    DISTINCT batch_size/P local shard to shard_batch — identical host
    streams would assemble a global batch of P duplicated copies."""
    from pesr_tpu.data import datasets as ds

    opts = Opts(train_dataset="synthetic", batch_size=8, patch_size=16)

    def batches_for(idx, count):
        monkeypatch.setattr(jax, "process_count", lambda: count)
        monkeypatch.setattr(jax, "process_index", lambda: idx)
        it, lr_from_files = ds.make_train_iterator(opts)
        try:
            lr, hr = next(it)
        finally:
            if hasattr(it, "close"):
                it.close()
        return hr

    hr0 = batches_for(0, 2)
    hr1 = batches_for(1, 2)
    assert hr0.shape[0] == 4 and hr1.shape[0] == 4  # 8 global / 2 hosts
    assert not np.array_equal(hr0, hr1)  # distinct per-host streams

    # Determinism per host: same (seed, index) -> same stream.
    np.testing.assert_array_equal(hr0, batches_for(0, 2))

    # Indivisible global batch fails loudly.
    monkeypatch.setattr(jax, "process_count", lambda: 3)
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    with pytest.raises(ValueError, match="divisible"):
        ds.make_train_iterator(opts)


def test_make_train_iterator_resume_uses_fresh_stream():
    """--resume continuation (round-2 review): the stream at start_step
    N must differ from the start-of-run stream (a plain re-seed replays
    the batches the interrupted run already trained on) and stay
    deterministic per (seed, start_step)."""
    from pesr_tpu.data import datasets as ds

    opts = Opts(train_dataset="synthetic", batch_size=4, patch_size=16)

    def first_batch(start_step):
        it, _ = ds.make_train_iterator(opts, start_step=start_step)
        try:
            _, hr = next(it)
        finally:
            if hasattr(it, "close"):
                it.close()
        return hr

    fresh = first_batch(0)
    resumed = first_batch(1000)
    assert not np.array_equal(fresh, resumed)
    np.testing.assert_array_equal(resumed, first_batch(1000))
    np.testing.assert_array_equal(fresh, first_batch(0))


def test_prefetcher_propagates_worker_errors():
    """Round-2 review regression: a worker exception (missing LR file,
    corrupt image) must re-raise in the consumer with its type, not
    vanish into a bare StopIteration."""
    def bad_iter():
        yield 1
        raise ValueError("corrupt image")

    pf = Prefetcher(bad_iter(), depth=2)
    assert next(pf) == 1
    with pytest.raises(ValueError, match="corrupt image"):
        next(pf)


def test_prefetcher_close_joins_blocked_worker():
    """close() must actually stop a worker blocked on a full depth-1
    queue (the old drain could eat the sentinel and leave the thread —
    and a later __next__ — wedged forever)."""
    import itertools

    pf = Prefetcher(itertools.count(), depth=1)
    assert next(pf) == 0
    pf.close()
    assert not pf._thread.is_alive()
    with pytest.raises(RuntimeError, match="closed"):
        next(pf)


def test_prefetcher_raises_stopiteration_repeatedly():
    """Review regression: a second next() after exhaustion must re-raise
    StopIteration (standard iterator contract), not block forever on
    the empty queue."""
    from pesr_tpu.data.datasets import Prefetcher
    p = Prefetcher(iter([1, 2]))
    assert list(p) == [1, 2]
    import pytest as _pytest
    with _pytest.raises(StopIteration):
        next(p)
    with _pytest.raises(StopIteration):
        next(p)
    p.close()


def test_prefetcher_reraises_worker_error_repeatedly():
    from pesr_tpu.data.datasets import Prefetcher

    def boom():
        yield 1
        raise RuntimeError("decode failed")

    p = Prefetcher(boom())
    assert next(p) == 1
    import pytest as _pytest
    for _ in range(2):  # both the first and any later next() re-raise
        with _pytest.raises(RuntimeError, match="decode failed"):
            next(p)
    p.close()


def test_load_eval_set_natural_real_photos():
    """--test_dataset natural: the curated real-photo registry loads as
    a reference-based eval set (HR = the photo, LR = MATLAB-bicubic),
    including the metric-holdout photo."""
    opts = Opts(test_dataset="natural", scale=4)
    samples = load_eval_set(opts, max_images=3)
    assert len(samples) == 3
    for s in samples:
        assert s.hr is not None
        assert s.hr.shape[0] == s.lr.shape[0] * 4
        assert s.hr.dtype == np.uint8 and s.lr.dtype == np.uint8
    assert samples[0].name == "china"


def test_natural_train_source_excludes_holdout():
    """--train_dataset natural: training samples real photos but never
    the metric-holdout image (it must stay unseen by models AND
    metrics)."""
    from pesr_tpu.data.datasets import NaturalImages, _resolve_train_source

    src = _resolve_train_source(Opts(train_dataset="natural"))
    assert isinstance(src, NaturalImages)
    names = {src.name(i) for i in range(len(src))}
    # All three round-5 holdouts stay unseen by models AND metrics.
    assert not names & {"camera_rgb", "white_marble_tile2", "marble1"}
    assert len(names) >= 10
    # Patch sampling works on the smallest registered photo.
    it = PatchIterator(src, patch_size=48, scale=4, batch_size=2, seed=0)
    lr, hr = next(it)
    assert lr is None and hr.shape == (2, 192, 192, 3)
