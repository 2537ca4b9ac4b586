#!/usr/bin/env python
"""Single-image latency benchmark (round-3 verdict #5; SURVEY.md §5.7).

Throughput (bench.py) saturates the chip with batched tiles; LATENCY is
the other serving axis — one 2K image, batch 1, how many milliseconds
until its SR canvas exists?  Two measurements:

1. **Batch-1 ms/image on the real chip** — flagship 32x256 x4 over one
   DIV2K-val-sized input (510x336 LR -> 2040x1344 HR), device-resident
   engine, int8 + bf16 paths.  This is the number a latency-sensitive
   deployment quotes for a single-chip replica.
2. **Spatial-parallel scaling curve** (``mesh_axis="tiles"``) on the
   8-device virtual CPU mesh: the same image's tile grid sharded over
   1/2/4/8 devices, one stitching all-gather.  Correctness is pinned
   bitwise in tests/test_tiling.py; this records the latency CLAIM —
   how the per-image wall time falls as devices join.  Caveat recorded
   in the JSON: virtual CPU devices share one host's cores, so the
   curve shows the orchestration + collective overhead and the
   parallelizable fraction, not real-ICI speedup; run with real chips
   for deployment numbers (same flag, ``--mesh_axis tiles``).

    python benchmarks/latency_bench.py [--reps 10]
        [--out benchmarks/latency_r4.json]
    python benchmarks/latency_bench.py --spatial_curve   # child mode

Writes one JSON artifact; the committed copy backs BASELINE.md's
latency row.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _one_image(scale: int, seed: int = 0):
    import numpy as np
    lr_h, lr_w = 2040 // scale, 1344 // scale
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (1, lr_h, lr_w, 3), dtype=np.uint8)


def _time_engine(tiler, imgs_dev, reps: int) -> dict:
    """Best + median wall-clock of a batch-1 device-resident pass."""
    import numpy as np

    def once() -> float:
        t0 = time.perf_counter()
        canvas = tiler.upscale_batch_device(imgs_dev)
        _ = np.asarray(canvas[0, 0, 0, 0])  # scalar fetch forces exec
        return time.perf_counter() - t0

    once()  # compile + warm
    times = sorted(once() for _ in range(reps))
    return {"ms_best": round(times[0] * 1e3, 2),
            "ms_median": round(times[len(times) // 2] * 1e3, 2)}


def chip_latency(reps: int) -> dict:
    """Part 1: batch-1 flagship latency on the real device."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pesr_tpu.models import Generator
    from pesr_tpu.models.fold import folded_inference
    from pesr_tpu.models.quant_apply import (default_calib_tiles,
                                             int8_inference)
    from pesr_tpu.ops.tiling import BatchTiledUpscaler

    scale = 4
    gen = Generator(scale=scale, num_blocks=32, num_channels=256)
    variables = jax.jit(gen.init)(jax.random.key(0),
                                  jnp.zeros((1, 16, 16, 3)))
    img = _one_image(scale)
    imgs_dev = jnp.asarray(img)
    _ = np.asarray(imgs_dev[0, 0, 0, 0])
    out_mp = (img.shape[1] * scale) * (img.shape[2] * scale) / 1e6

    out = {"model": "32x256", "scale": scale,
           "lr_shape": list(img.shape[1:3]),
           "hr_megapixels": round(out_mp, 3), "paths": {}}
    for path in ("int8-w8a8", "bf16"):
        if path == "int8-w8a8":
            apply_fn, pvars = int8_inference(
                variables["params"], scale,
                default_calib_tiles([img[0]]))
        else:
            apply_fn, pvars = folded_inference(variables["params"], scale,
                                               dtype=jnp.bfloat16)
        tiler = BatchTiledUpscaler(apply_fn, pvars, scale, "auto", 8)
        t = _time_engine(tiler, imgs_dev, reps)
        t["mps_equivalent"] = round(out_mp / (t["ms_best"] / 1e3), 2)
        print(f"[latency] chip {path}: {t}", flush=True)
        out["paths"][path] = t
        del tiler
    return out


def spatial_curve(reps: int) -> dict:
    """Part 2: tiles-axis scaling on the virtual CPU mesh (child mode —
    requires JAX_PLATFORMS=cpu + xla_force_host_platform_device_count)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pesr_tpu.models import Generator
    from pesr_tpu.models.fold import folded_inference
    from pesr_tpu.ops.tiling import BatchTiledUpscaler
    from pesr_tpu.parallel import make_mesh

    scale = 4
    # 8x64 on CPU: the flagship takes minutes/pass on host cores; the
    # curve's SHAPE (parallelizable fraction + collective overhead) is
    # what this measures, and it is model-size independent enough.
    gen = Generator(scale=scale, num_blocks=8, num_channels=64)
    variables = jax.jit(gen.init)(jax.random.key(0),
                                  jnp.zeros((1, 16, 16, 3)))
    apply_fn, pvars = folded_inference(variables["params"], scale,
                                       dtype=jnp.float32)
    img = _one_image(scale)
    imgs_dev = jnp.asarray(img)

    out = {"model": "8x64", "scale": scale, "platform": "cpu-virtual",
           "caveat": ("virtual CPU devices share one host's cores: the "
                      "curve bounds orchestration+collective overhead, "
                      "it does not demonstrate real-ICI speedup"),
           "curve": []}
    base_ms = None
    import math
    for n in (1, 2, 4, 8):
        mesh = make_mesh(n)
        tiler = BatchTiledUpscaler(apply_fn, pvars, scale, "auto", 8,
                                   mesh=mesh, mesh_axis="tiles")
        t = _time_engine(tiler, imgs_dev, reps)
        if base_ms is None:
            base_ms = t["ms_best"]
        h, w = int(img.shape[1]), int(img.shape[2])
        th, tw = tiler._tile_hw(h, w, b=1)
        grid = math.ceil(h / th) * math.ceil(w / tw)
        row = {"devices": n, **t,
               "speedup_vs_1": round(base_ms / t["ms_best"], 2),
               "tiles_total": grid,
               "tiles_per_device": math.ceil(grid / n)}
        print(f"[latency] spatial {row}", flush=True)
        out["curve"].append(row)
        del tiler
    return out


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--reps", type=int, default=10)
    p.add_argument("--spatial_curve", action="store_true",
                   help="child mode: CPU-mesh tiles-axis curve only")
    p.add_argument("--out", default=os.path.join(
        REPO, "benchmarks", "latency_r4.json"))
    args = p.parse_args()

    if args.spatial_curve:
        # Env vars alone don't survive this box's TPU-plugin
        # sitecustomize (it force-sets jax_platforms at boot); the
        # shared helper also updates the jax config.
        from pesr_tpu.parallel import force_cpu_devices
        force_cpu_devices(8)
        print(json.dumps({"spatial": spatial_curve(args.reps)}))
        return 0

    from tpu_lease import acquire_tpu
    acquire_tpu()
    from pesr_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    chip = chip_latency(args.reps)

    # The spatial curve needs a fresh process: platform + device count
    # are fixed at first jax use.
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS=(os.environ.get("XLA_FLAGS", "")
                          + " --xla_force_host_platform_device_count=8"))
    child = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--spatial_curve",
         "--reps", str(max(3, args.reps // 2))],
        env=env, capture_output=True, text=True)
    spatial = None
    if child.returncode == 0:
        spatial = json.loads(child.stdout.strip().splitlines()[-1]
                             )["spatial"]
    else:
        print(f"[latency] spatial child failed:\n{child.stderr[-2000:]}",
              file=sys.stderr)

    record = {"single_chip": chip, "spatial_cpu_mesh": spatial}
    with open(args.out, "w") as f:
        json.dump(record, f, indent=1)
        f.write("\n")
    print(json.dumps(record))
    return 0 if spatial is not None else 1


if __name__ == "__main__":
    sys.exit(main())
