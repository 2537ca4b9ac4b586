"""AOT serving-artifact tests (pesr_tpu/serving.py): export the tiled
engine with jax.export, reload WITHOUT model code, and pin bitwise
equality against the live engine — the deploy-bundle analog of the
reference's .pth-plus-model-code serving story (SURVEY.md §3.3)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pesr_tpu.models import Generator
from pesr_tpu.ops.tiling import BatchTiledUpscaler
from pesr_tpu.serving import export_upscaler, load_upscaler, read_meta


def _engine(scale=2, c=8, blocks=2, tile=16, ov=4):
    gen = Generator(scale=scale, num_blocks=blocks, num_channels=c,
                    dtype=jnp.float32)
    variables = gen.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
    return BatchTiledUpscaler(gen.apply, variables, scale,
                              tile_size=tile, overlap=ov)


def _imgs(b=2, h=21, w=17, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8)


def test_export_load_roundtrip_bitwise(tmp_path):
    engine = _engine()
    imgs = _imgs()
    path = os.path.join(tmp_path, "up.pesr")
    meta = export_upscaler(engine, *imgs.shape[:3], path,
                           precision_path="f32")
    assert meta["scale"] == 2 and meta["output_crop"] == [42, 34]

    served = load_upscaler(path)
    got = served(imgs)
    ref = engine.upscale_batch(imgs)
    assert got.dtype == np.uint8 and got.shape == (2, 42, 34, 3)
    np.testing.assert_array_equal(got, ref)

    # Metadata reads without touching the program.
    m = read_meta(path)
    assert m["precision_path"] == "f32"
    assert jax.default_backend() in m["platforms"]


def test_serving_rejects_wrong_shape_and_dtype(tmp_path):
    engine = _engine()
    path = os.path.join(tmp_path, "up.pesr")
    export_upscaler(engine, 2, 21, 17, path)
    served = load_upscaler(path)
    with pytest.raises(ValueError, match="static"):
        served(_imgs(b=1))
    with pytest.raises(ValueError, match="static"):
        served(_imgs().astype(np.float32))


def test_export_dynamic_batch(tmp_path):
    """batch="any": ONE artifact serves every batch size (symbolic batch
    dim), bitwise-equal to the live engine; H/W stay pinned."""
    engine = _engine()
    path = os.path.join(tmp_path, "dyn.pesr")
    meta = export_upscaler(engine, "any", 21, 17, path, trace_batch=3)
    assert meta["input_shape"][0] == "any"
    served = load_upscaler(path)
    for b in (1, 2, 5):
        imgs = _imgs(b=b, seed=b)
        np.testing.assert_array_equal(served(imgs),
                                      engine.upscale_batch(imgs))
    with pytest.raises(ValueError, match="static"):
        served(_imgs(b=2, h=20, w=17))  # wrong height still rejected


def test_export_cross_platform_lowering(tmp_path):
    """platforms=("tpu","cpu") lowers ONE artifact for both fleets —
    exported here on the CPU test mesh, still loadable/exact locally,
    and advertising tpu for the serving hosts."""
    engine = _engine()
    imgs = _imgs(b=1)
    path = os.path.join(tmp_path, "xplat.pesr")
    meta = export_upscaler(engine, *imgs.shape[:3], path,
                           platforms=("tpu", "cpu"))
    assert set(meta["platforms"]) == {"tpu", "cpu"}
    served = load_upscaler(path)
    np.testing.assert_array_equal(served(imgs),
                                  engine.upscale_batch(imgs))


def test_export_rejects_mesh_engine(tmp_path):
    from pesr_tpu.parallel import make_mesh
    gen = Generator(scale=2, num_blocks=1, num_channels=8,
                    dtype=jnp.float32)
    variables = gen.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
    engine = BatchTiledUpscaler(gen.apply, variables, 2, tile_size=16,
                                overlap=4, mesh=make_mesh(None))
    with pytest.raises(ValueError, match="single-chip"):
        export_upscaler(engine, 2, 21, 17,
                        os.path.join(tmp_path, "x.pesr"))


def test_export_spatial_parallel_roundtrip(tmp_path):
    """mesh_axis='tiles' exports as a genuine 8-device program: the
    reloaded artifact runs the embedded shardings (N chips cooperate on
    one image) and matches the live spatial engine bitwise."""
    from pesr_tpu.parallel import make_mesh
    gen = Generator(scale=2, num_blocks=2, num_channels=8,
                    dtype=jnp.float32)
    variables = gen.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
    engine = BatchTiledUpscaler(gen.apply, variables, 2, tile_size=10,
                                overlap=4, mesh=make_mesh(8),
                                mesh_axis="tiles")
    imgs = _imgs(b=1, h=30, w=26)
    path = os.path.join(tmp_path, "sp.pesr")
    meta = export_upscaler(engine, 1, 30, 26, path)
    assert meta["mesh_devices"] == 8

    # Fixed-batch only: the tile-batch sharding is laid out per shape.
    with pytest.raises(ValueError, match="fixed-batch"):
        export_upscaler(engine, "any", 30, 26,
                        os.path.join(tmp_path, "no.pesr"))

    served = load_upscaler(path)
    got = served(imgs)
    np.testing.assert_array_equal(got, engine.upscale_batch(imgs))
    # Device-resident path replicates host input over the mesh itself.
    got_dev = np.asarray(served.upscale_device(jnp.asarray(imgs)))
    np.testing.assert_array_equal(got_dev, got)


def test_load_spatial_rejects_too_few_devices(tmp_path, monkeypatch):
    from pesr_tpu.parallel import make_mesh
    gen = Generator(scale=2, num_blocks=1, num_channels=8,
                    dtype=jnp.float32)
    variables = gen.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
    engine = BatchTiledUpscaler(gen.apply, variables, 2, tile_size=16,
                                overlap=4, mesh=make_mesh(8),
                                mesh_axis="tiles")
    path = os.path.join(tmp_path, "sp.pesr")
    export_upscaler(engine, 1, 21, 17, path)
    monkeypatch.setattr(jax, "device_count", lambda *a, **k: 4)
    with pytest.raises(ValueError, match="needs 8 devices"):
        load_upscaler(path)


@pytest.mark.slow
def test_cli_export_artifact_flag(tmp_path, capsys):
    """`test.py --export_artifact` end-to-end: flags -> checkpointless
    tiny model -> artifact on disk that serves the advertised shape."""
    import test as test_cli
    path = os.path.join(tmp_path, "cli.pesr")
    rc = test_cli.main(["--dataset", "synthetic", "--scale", "2",
                        "--num_blocks", "2", "--num_channels", "8",
                        "--compute_dtype", "float32", "--infer_batch",
                        "2", "--export_artifact", path])
    assert rc == 0
    assert "exported serving artifact" in capsys.readouterr().out
    served = load_upscaler(path)
    b, h, w, _ = served.input_shape
    rng = np.random.default_rng(0)
    out = served(rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8))
    assert out.shape == (b, 2 * h, 2 * w, 3) and out.dtype == np.uint8


@pytest.mark.slow
def test_cli_export_spatial_mesh(tmp_path, capsys):
    """`--mesh_axis tiles --export_artifact` ships an 8-device artifact."""
    import test as test_cli
    path = os.path.join(tmp_path, "sp.pesr")
    rc = test_cli.main(["--dataset", "synthetic", "--scale", "2",
                        "--num_blocks", "2", "--num_channels", "8",
                        "--compute_dtype", "float32", "--infer_batch",
                        "1", "--mesh_shape", "8", "--mesh_axis", "tiles",
                        "--export_artifact", path])
    assert rc == 0
    assert read_meta(path)["mesh_devices"] == 8
    served = load_upscaler(path)
    b, h, w, _ = served.input_shape
    out = served(np.random.default_rng(0).integers(
        0, 256, (b, h, w, 3), dtype=np.uint8))
    assert out.shape == (b, 2 * h, 2 * w, 3) and out.dtype == np.uint8


def test_cli_export_rejects_whole_image_mode():
    import test as test_cli
    with pytest.raises(SystemExit, match="tiled mode"):
        test_cli.main(["--dataset", "synthetic", "--tile_size", "0",
                       "--export_artifact", "/tmp/never.pesr"])


def test_export_int8_path(tmp_path):
    """The production int8 W8A8 apply exports and reloads exactly like
    the float path (same run signature, scales baked as constants)."""
    from pesr_tpu.models.quant_apply import (default_calib_tiles,
                                             int8_inference)
    gen = Generator(scale=2, num_blocks=2, num_channels=8,
                    dtype=jnp.float32)
    params = gen.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))["params"]
    imgs = _imgs(b=1, h=24, w=20, seed=3)
    tiles = default_calib_tiles([imgs[0]])
    apply_fn, variables = int8_inference(params, 2, tiles)
    engine = BatchTiledUpscaler(apply_fn, variables, 2, tile_size=16,
                                overlap=4)
    path = os.path.join(tmp_path, "up_int8.pesr")
    export_upscaler(engine, *imgs.shape[:3], path,
                    precision_path="int8-w8a8")
    served = load_upscaler(path)
    np.testing.assert_array_equal(served(imgs),
                                  engine.upscale_batch(imgs))
    assert read_meta(path)["precision_path"] == "int8-w8a8"


def test_export_rejects_pallas_interpreter(tmp_path):
    """On a non-TPU host make_pallas_apply resolves to interpret mode;
    exporting that would silently bake the (drastically slower)
    interpreter emulation into the artifact — export must refuse."""
    from pesr_tpu.models.pallas_apply import make_pallas_apply
    gen = Generator(scale=2, num_blocks=2, num_channels=8,
                    dtype=jnp.float32)
    variables = gen.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
    apply_fn = make_pallas_apply(scale=2)  # interpret=None -> True on CPU
    assert apply_fn.uses_pallas and apply_fn.pallas_interpret
    engine = BatchTiledUpscaler(apply_fn, variables, 2, tile_size=16,
                                overlap=4)
    with pytest.raises(ValueError, match="Pallas"):
        export_upscaler(engine, 2, 21, 17,
                        os.path.join(tmp_path, "pal.pesr"))
    # Non-TPU-exclusive platform sets are rejected even with real
    # (non-interpret) kernels requested.
    apply_hw = make_pallas_apply(scale=2, interpret=False)
    engine_hw = BatchTiledUpscaler(apply_hw, variables, 2, tile_size=16,
                                   overlap=4)
    with pytest.raises(ValueError, match="Pallas"):
        export_upscaler(engine_hw, 2, 21, 17,
                        os.path.join(tmp_path, "pal2.pesr"),
                        platforms=("tpu", "cpu"))


def test_meta_records_actual_halos(tmp_path):
    """grid.ov_h/ov_w are the halos the exported program actually uses
    (min_halo floor applied per axis), not the constructor's request."""
    from pesr_tpu.models.quant_apply import (default_calib_tiles,
                                             int8_inference)
    gen = Generator(scale=4, num_blocks=1, num_channels=8,
                    dtype=jnp.float32)
    params = gen.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))["params"]
    imgs = _imgs(b=1, h=12, w=40, seed=5)
    apply_fn, variables = int8_inference(
        params, 4, default_calib_tiles([imgs[0]]))
    engine = BatchTiledUpscaler(apply_fn, variables, 4, tile_size=16,
                                overlap=0)  # request BELOW min_halo=3
    meta = export_upscaler(engine, *imgs.shape[:3],
                           os.path.join(tmp_path, "halo.pesr"))
    g = meta["grid"]
    assert g["ov_h"] == engine._ov_for(g["nh"])
    assert g["ov_w"] == engine._ov_for(g["nw"])
    assert g["min_halo"] == 3 and g["overlap"] == 0
    # The multi-tile axis is floored up to min_halo.
    assert (g["nw"] > 1 and g["ov_w"] >= 3) or g["nw"] == 1


def test_load_accepts_gpu_backend_alias(tmp_path, monkeypatch):
    """jax.default_backend() says 'gpu'; jax.export platform names say
    'cuda'/'rocm'.  load_upscaler must map between them instead of
    spuriously rejecting a GPU artifact on the box that exported it."""
    import pesr_tpu.serving as serving
    engine = _engine()
    path = os.path.join(tmp_path, "up.pesr")
    export_upscaler(engine, 2, 21, 17, path)
    # Rewrite the platform list as a CUDA export, then pretend to be a
    # GPU process: the alias must be accepted...
    import json as _json
    import zipfile as _zip
    with _zip.ZipFile(path) as zf:
        meta = _json.loads(zf.read("meta.json"))
        blob = zf.read("fn.bin")
    meta["platforms"] = ["cuda"]
    with _zip.ZipFile(path, "w") as zf:
        zf.writestr("meta.json", _json.dumps(meta))
        zf.writestr("fn.bin", blob)
    monkeypatch.setattr(serving.jax, "default_backend", lambda: "gpu")
    try:
        # May succeed (deserialize doesn't re-check platforms) or fail
        # downstream; the platform GATE must not be what rejects it.
        serving.load_upscaler(path)
    except ValueError as e:
        assert "re-export with" not in str(e)
    # ...and a genuinely incompatible backend still errors with the
    # canonical ('cuda', not 'gpu') suggestion.
    meta["platforms"] = ["tpu"]
    with _zip.ZipFile(path, "w") as zf:
        zf.writestr("meta.json", _json.dumps(meta))
        zf.writestr("fn.bin", blob)
    with pytest.raises(ValueError, match="'cuda'"):
        serving.load_upscaler(path)


def test_cli_export_rejects_mesh_flag():
    import test as test_cli
    with pytest.raises(SystemExit, match="mesh_shape"):
        test_cli.main(["--dataset", "synthetic", "--mesh_shape", "2",
                       "--export_artifact", "/tmp/never.pesr"])
