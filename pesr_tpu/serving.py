"""AOT serving artifacts: compile the device-resident tiled-SR program
ahead of time with ``jax.export``, bake the generator weights in as
constants, and serialize everything into ONE self-contained file that a
serving host loads and runs WITHOUT the model-building Python — no flax
module, no checkpoint tree, no flag parsing.  The TPU-native analog of
the reference's deploy story (a torch ``.pth`` plus its model code;
SURVEY.md §3.3), redesigned around XLA's compilation model: serving
shapes are FIXED, so the whole pad→tile→forward→stitch pipeline of
:class:`pesr_tpu.ops.tiling.BatchTiledUpscaler` exports as a single
StableHLO program per (batch, H, W).

Why shapes are part of the artifact: everything on the MXU path is
static-shape (BASELINE.md roofline; dynamic shapes would force
recompiles or host fallbacks at serve time).  Export one artifact per
served input geometry — each is hermetic, and a fleet can mix them
freely because nothing is shared at runtime.

Multi-chip: a ``mesh_axis="tiles"`` (spatial-parallel) engine exports
as a genuine N-device program — the embedded shardings make N chips
cooperate on each image at serve time, and :func:`load_upscaler`
rebuilds the mesh and replicates inputs automatically.  Batch-DP
meshes are intentionally NOT exportable: hermetic single-chip replicas
shard a batch with zero coordination, so that is the better deploy
shape (the export error says so).

Cross-platform: pass ``platforms=("tpu", "cpu")`` to lower for both —
an artifact exported on a CPU dev box then runs unmodified on the TPU
serving fleet (and vice versa for local debugging).  All production
apply paths (plain/bf16, folded, int8 W8A8) are pure XLA and lower for
either platform; the opt-in Pallas path is TPU-only and is rejected at
export unless the artifact targets TPU exclusively.

Artifact layout (zip):
  meta.json   scale / shapes / grid / precision path / versions
  fn.bin      ``jax.export`` serialization (weights as constants)
"""

from __future__ import annotations

import io
import json
import zipfile
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pesr_tpu.ops.tiling import BatchTiledUpscaler

_META_NAME = "meta.json"
_FN_NAME = "fn.bin"
_FORMAT_VERSION = 1


def export_upscaler(engine: BatchTiledUpscaler, batch, height: int,
                    width: int, path: str,
                    platforms: Optional[Sequence[str]] = None,
                    precision_path: str = "unspecified",
                    trace_batch: int = 8) -> dict:
    """Export ``engine``'s full tiled-SR program for input shape
    ``[batch, height, width, 3] uint8`` to a hermetic artifact at
    ``path``.  Returns the artifact metadata dict.

    ``batch``: an int for a fixed serve batch, or the string ``"any"``
    for a shape-POLYMORPHIC batch dimension (jax.export symbolic
    shapes): one artifact serves every batch size, including the ragged
    final batch of a stream.  H/W stay fixed either way — spatial dims
    drive tile-grid selection and MXU tiling, the batch dim is just the
    outer loop.  With ``"any"`` the tile grid is chosen for
    ``trace_batch`` (the HBM activation budget is per-batch; serve far
    above it and peak memory grows past the chooser's budget).

    ``platforms``: lowering targets (default: the current backend only).
    ``precision_path``: recorded in metadata so a consumer can tell an
    int8-W8A8 artifact from a bf16 one (the program itself is opaque).
    """
    mesh_devices = 0
    if engine.mesh is not None:
        if engine.mesh_axis != "tiles":
            raise ValueError(
                "export_upscaler exports single-chip programs for DP "
                "serving — export once and load the artifact on every "
                "chip (the batch shards trivially across hermetic "
                "replicas).  Only mesh_axis='tiles' (spatial "
                "parallelism: N chips cooperate on ONE image) exports "
                "as a genuine multi-chip artifact.")
        if batch in ("any", "dynamic"):
            raise ValueError(
                "spatial-parallel artifacts are fixed-batch: the "
                "exported program's tile-batch sharding is laid out for "
                "one (batch, H, W); export one artifact per served "
                "geometry")
        mesh_devices = int(engine.mesh.size)
    from jax import export as jax_export

    if getattr(engine._apply_fn, "uses_pallas", False):
        targets = set(platforms) if platforms else {jax.default_backend()}
        interp = getattr(engine._apply_fn, "pallas_interpret", False)
        if interp or targets != {"tpu"}:
            raise ValueError(
                "the Pallas apply path exports only as real Mosaic "
                "kernels for TPU exclusively (platforms=('tpu',) on a "
                f"TPU host); got platforms={sorted(targets)}, "
                f"interpret={interp}.  Exporting the interpreter "
                "emulation would silently bake a drastically slower "
                "program.  The XLA paths (bf16/folded/int8) are "
                "cross-platform — use those for mixed fleets.")

    dynamic = batch in ("any", "dynamic")
    b_trace = trace_batch if dynamic else int(batch)
    run, (nh, nw, th, tw) = engine._build(b_trace, height, width)
    variables = engine._variables

    fn = jax.jit(lambda imgs_u8: run(variables, imgs_u8))
    spec = jax.ShapeDtypeStruct((b_trace, height, width, 3), jnp.uint8)
    if dynamic:
        spec = jax_export.symbolic_args_specs(
            spec, f"b, {height}, {width}, 3")
    exported = jax_export.export(
        fn, platforms=list(platforms) if platforms else None)(spec)

    s = engine.scale
    meta = {
        "format_version": _FORMAT_VERSION,
        "scale": s,
        "input_shape": ["any" if dynamic else int(batch),
                        height, width, 3],
        "trace_batch": b_trace,
        "input_dtype": "uint8",
        "canvas_shape": ["any" if dynamic else int(batch),
                         nh * th * s, nw * tw * s, 3],
        "output_crop": [height * s, width * s],
        # ov_h/ov_w are the halos the exported program ACTUALLY uses
        # per axis (single-tile axes drop to the min_halo floor;
        # multi-tile axes are raised to it) — a consumer reconstructing
        # tile geometry from this dict must use them, not "overlap"
        # (the constructor's request, kept for provenance).
        "grid": {"nh": nh, "nw": nw, "th": th, "tw": tw,
                 "ov_h": engine._ov_for(nh), "ov_w": engine._ov_for(nw),
                 "overlap": engine.ov, "min_halo": engine.min_halo},
        # 0 = single-chip program; N>0 = spatial-parallel
        # (mesh_axis='tiles') program that must run on exactly N devices
        # — load_upscaler builds the mesh and replicates inputs.
        "mesh_devices": mesh_devices,
        "precision_path": precision_path,
        "platforms": list(exported.platforms),
        "jax_version": jax.__version__,
        "calling_convention_version":
            exported.calling_convention_version,
    }
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(_META_NAME, json.dumps(meta, indent=1))
        zf.writestr(_FN_NAME, exported.serialize())
    with open(path, "wb") as f:
        f.write(buf.getvalue())
    return meta


class ServingUpscaler:
    """A loaded artifact: ``uint8 [B,H,W,3] -> uint8 [B,H*s,W*s,3]``.

    Stateless and hermetic — construct once per process/chip and call
    from the serving loop.  The exported program runs under ``jax.jit``
    (compiled on first call, cached after), and the canvas crop to the
    true output size happens on device before the fetch.
    """

    def __init__(self, meta: dict, exported) -> None:
        self.meta = meta
        self.scale = int(meta["scale"])
        self.input_shape = tuple(meta["input_shape"])
        ch, cw = meta["output_crop"]
        call = exported.call

        def run(imgs_u8):
            return call(imgs_u8)[:, :ch, :cw, :]

        self._fn = jax.jit(run)
        # Spatial-parallel artifacts (mesh_devices > 0) execute over an
        # N-device mesh: inputs must land replicated on those devices
        # (export embeds the tile-batch shardings; the input itself is
        # read everywhere for tile extraction).
        self._replicated = None
        if int(meta.get("mesh_devices", 0) or 0):
            from pesr_tpu.parallel import make_mesh, replicated
            self._replicated = replicated(
                make_mesh(int(meta["mesh_devices"])))

    def upscale_device(self, imgs_u8) -> jax.Array:
        """Device-resident variant (composition with downstream stages)."""
        imgs_u8 = jnp.asarray(imgs_u8)
        if (self._replicated is not None
                and getattr(imgs_u8, "sharding", None) != self._replicated):
            imgs_u8 = jax.device_put(imgs_u8, self._replicated)
        want = self.input_shape
        got = tuple(imgs_u8.shape)
        shape_ok = (len(got) == 4 and got[1:] == tuple(want[1:])
                    and (want[0] == "any" or got[0] == want[0]))
        if imgs_u8.dtype != jnp.uint8 or not shape_ok:
            raise ValueError(
                f"artifact serves exactly uint8 {tuple(want)}, got "
                f"{imgs_u8.dtype} {got} — export one "
                "artifact per served shape (serving shapes are static; "
                'batch="any" exports a batch-polymorphic one)')
        return self._fn(imgs_u8)

    def __call__(self, imgs_u8: np.ndarray) -> np.ndarray:
        return np.asarray(self.upscale_device(imgs_u8))


def load_upscaler(path: str) -> ServingUpscaler:
    """Load an artifact written by :func:`export_upscaler`."""
    from jax import export as jax_export

    with zipfile.ZipFile(path) as zf:
        meta = json.loads(zf.read(_META_NAME))
        blob = zf.read(_FN_NAME)
    if meta.get("format_version") != _FORMAT_VERSION:
        raise ValueError(
            f"unsupported artifact format_version {meta.get('format_version')}"
            f" (this build reads {_FORMAT_VERSION})")
    backend = jax.default_backend()
    # jax.default_backend() reports 'gpu' where jax.export platform
    # names distinguish 'cuda'/'rocm' — accept either for a GPU process.
    compatible = {"gpu": {"cuda", "rocm"}}.get(backend, {backend})
    if not compatible & set(meta["platforms"]):
        want = "cuda" if backend == "gpu" else backend
        raise ValueError(
            f"artifact was lowered for {meta['platforms']}, but this "
            f"process runs on {backend!r} — re-export with "
            f"platforms={sorted(set(meta['platforms']) | {want})}")
    need = int(meta.get("mesh_devices", 0) or 0)
    if need and jax.device_count() < need:
        raise ValueError(
            f"spatial-parallel artifact needs {need} devices, this "
            f"process has {jax.device_count()}")
    return ServingUpscaler(meta, jax_export.deserialize(blob))


def read_meta(path: str) -> dict:
    """Artifact metadata without deserializing the program (cheap)."""
    with zipfile.ZipFile(path) as zf:
        return json.loads(zf.read(_META_NAME))
