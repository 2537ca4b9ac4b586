#!/usr/bin/env python
"""Serving-artifact throughput check: the AOT bundle must serve at the
SAME MP/s as the live engine it was exported from (pesr_tpu/serving.py
bakes the identical StableHLO, so any gap would mean dispatch overhead
in the load path).

Protocol mirrors bench.py's contract measurement (flagship 32x256,
device-resident 510x336 uint8 batch, scalar-fetch timing, best-of-N),
restricted to the headline int8 path.  Prints ONE JSON line with both
numbers and their ratio.

Env: SB_IMAGES (8), SB_REPEATS (5), SB_BLOCKS (32), SB_CHANNELS (256),
SB_SCALE (4).
"""

import json
import os
import sys
import time


def main() -> int:
    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.dirname(here))
    sys.path.insert(0, here)
    from tpu_lease import acquire_tpu
    acquire_tpu()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pesr_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    from pesr_tpu.models import Generator
    from pesr_tpu.models.quant_apply import (default_calib_tiles,
                                             int8_inference)
    from pesr_tpu.ops.tiling import BatchTiledUpscaler
    from pesr_tpu.serving import export_upscaler, load_upscaler

    n_images = int(os.environ.get("SB_IMAGES", "8"))
    repeats = int(os.environ.get("SB_REPEATS", "5"))
    blocks = int(os.environ.get("SB_BLOCKS", "32"))
    channels = int(os.environ.get("SB_CHANNELS", "256"))
    scale = int(os.environ.get("SB_SCALE", "4"))

    gen = Generator(scale=scale, num_blocks=blocks, num_channels=channels)
    variables = jax.jit(gen.init)(jax.random.key(0),
                                  jnp.zeros((1, 16, 16, 3)))
    rng = np.random.default_rng(0)
    lr_h, lr_w = 2040 // scale, 1344 // scale
    imgs = rng.integers(0, 256, (n_images, lr_h, lr_w, 3), dtype=np.uint8)
    calib = [rng.integers(0, 256, (510, 336, 3), dtype=np.uint8)]

    apply_fn, pvars = int8_inference(
        variables["params"], scale, default_calib_tiles(calib))
    engine = BatchTiledUpscaler(apply_fn, pvars, scale, "auto", 8)

    art_path = "/tmp/serve_bench_artifact.pesr"
    export_upscaler(engine, n_images, lr_h, lr_w, art_path,
                    precision_path="int8-w8a8")
    served = load_upscaler(art_path)

    imgs_dev = jnp.asarray(imgs)
    _ = np.asarray(imgs_dev[0, 0, 0, 0])
    out_mp = n_images * lr_h * lr_w * scale * scale / 1e6

    def time_fn(fn) -> float:
        def once():
            t0 = time.perf_counter()
            out = fn(imgs_dev)
            _ = np.asarray(out[0, 0, 0, 0])
            return time.perf_counter() - t0
        once()  # compile + warm
        return out_mp / min(once() for _ in range(repeats))

    engine_mps = time_fn(engine.upscale_batch_device)
    artifact_mps = time_fn(served.upscale_device)
    print(json.dumps({
        "metric": "serving_artifact_throughput",
        "engine_mps": round(engine_mps, 2),
        "artifact_mps": round(artifact_mps, 2),
        "ratio": round(artifact_mps / engine_mps, 4),
        "unit": "MP/s/chip",
        "artifact_bytes": os.path.getsize(art_path),
        "config": {"blocks": blocks, "channels": channels,
                   "scale": scale, "images": n_images},
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
