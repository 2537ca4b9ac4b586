#!/usr/bin/env python
"""PESR-compatible inference entry point (SURVEY.md §2 item 8, §3.3).

Loads a generator checkpoint, tiled-upscales every image of a benchmark
set, writes PNGs into ``<output_dir>/<dataset>/`` (consumed by the PIRM
perceptual evaluation — pesr_tpu.metrics), and prints mean PSNR/SSIM and
throughput:

  python test.py --dataset Set5 --model_path check_point/pesr --scale 4

Without datasets on disk: ``--dataset synthetic``.
"""

import os
import sys
import time

from pesr_tpu.config import opts_from_args
from pesr_tpu.data.datasets import load_eval_set
from pesr_tpu.metrics import calc_psnr, calc_ssim
from pesr_tpu.ops.tiling import TiledUpscaler
from pesr_tpu.training import checkpoint as ckpt
from pesr_tpu.training.loop import build_generator
from pesr_tpu.utils.image_io import imwrite_uint8
from pesr_tpu.utils.logging import AverageMeter


def main(argv=None) -> int:
    from pesr_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    opts = opts_from_args(argv, mode="test")
    gen = build_generator(opts)

    if opts.model_path:
        import jax
        import jax.numpy as jnp
        expected = jax.eval_shape(
            lambda: gen.init(jax.random.key(0),
                             jnp.zeros((1, 8, 8, opts.img_channels))))
        if opts.model_path.endswith((".pt", ".pth")):
            # Reference torch checkpoints load directly (SURVEY.md §5.4
            # torch->JAX converter; BASELINE.json:5 output parity).
            from pesr_tpu.convert import load_generator_weights
            params = load_generator_weights(
                opts.model_path, expected["params"], opts.num_blocks,
                opts.scale)
            print(f"converted torch generator from {opts.model_path}")
        else:
            params, step = ckpt.restore_generator_params(opts.model_path)
            ckpt.validate_params_compat(expected["params"], params)
            print(f"loaded generator at step {step} from "
                  f"{opts.model_path}")
    else:
        # Random init — exercises the full pipeline when no checkpoint
        # exists yet (this environment ships none; SURVEY.md §7).
        import jax
        import jax.numpy as jnp
        params = gen.init(
            jax.random.key(opts.seed),
            jnp.zeros((1, 8, 8, opts.img_channels)))["params"]
        print("WARNING: no --model_path; using randomly-initialized "
              "generator")

    samples = load_eval_set(opts)
    variables = {"params": params}
    if opts.quant == "int8":
        from pesr_tpu.models.quant_apply import (make_int8_apply,
                                                 quantize_generator_params)
        variables = {"params": quantize_generator_params(params)}
        apply_fn = make_int8_apply(opts.scale, opts.res_scale)
        print("using int8 PTQ inference path")
    elif opts.use_pallas:
        from pesr_tpu.models.pallas_apply import make_pallas_apply
        apply_fn = make_pallas_apply(opts.scale, opts.res_scale)
        print("using fused Pallas residual-block body")
    else:
        apply_fn = gen.apply
        if opts.compute_dtype == "bfloat16":
            # Pre-cast params for inference: halves weight HBM traffic
            # and residency vs casting f32 weights inside the program.
            import jax
            import jax.numpy as jnp
            variables = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16), variables)
    if opts.tile_size == 0:
        # Reference behavior: whole-image forward, no tiling
        # (SURVEY.md §3.3; recompiles per distinct image shape).
        from pesr_tpu.ops.tiling import WholeImageUpscaler
        tiler = WholeImageUpscaler(apply_fn, variables, opts.scale)
        print("whole-image mode (no tiling)")
    else:
        tiler = TiledUpscaler(apply_fn, variables, opts.scale,
                              opts.tile_size, opts.tile_overlap,
                              opts.infer_batch)
    tiler.warmup()

    out_dir = os.path.join(opts.output_dir, opts.test_dataset)
    psnr_m, ssim_m = AverageMeter(), AverageMeter()
    total_mp = 0.0
    t0 = time.time()
    if opts.self_ensemble:
        from pesr_tpu.ops.tiling import self_ensemble_upscale
        srs = [self_ensemble_upscale(tiler, s.lr) for s in samples]
    else:
        srs = tiler.upscale_many([s.lr for s in samples])
    elapsed = time.time() - t0

    bicubic_m = AverageMeter()
    for s, sr in zip(samples, srs):
        imwrite_uint8(os.path.join(out_dir, f"{s.name}.png"), sr)
        total_mp += sr.shape[0] * sr.shape[1] / 1e6
        if s.hr is not None:
            psnr = calc_psnr(sr, s.hr, crop_border=opts.scale)
            ssim = calc_ssim(sr, s.hr, crop_border=opts.scale)
            psnr_m.update(psnr)
            ssim_m.update(ssim)
            # Bicubic upscale baseline: the floor any trained model
            # must beat (MATLAB-exact kernel, host numpy).
            from pesr_tpu.data.datasets import host_bicubic_resize
            h, w = s.lr.shape[:2]
            bic = host_bicubic_resize(s.lr, h * opts.scale,
                                      w * opts.scale)
            bpsnr = calc_psnr(bic, s.hr, crop_border=opts.scale)
            bicubic_m.update(bpsnr)
            print(f"{s.name}: PSNR {psnr:.2f} dB  SSIM {ssim:.4f}  "
                  f"(bicubic {bpsnr:.2f} dB)")

    print(f"[{opts.test_dataset} x{opts.scale}] mean PSNR {psnr_m.avg:.2f} "
          f"dB  mean SSIM {ssim_m.avg:.4f}  bicubic {bicubic_m.avg:.2f} dB"
          f"  ({total_mp / elapsed:.1f} MP/s end-to-end incl. host I/O "
          f"over {len(samples)} images; bench.py measures the "
          f"device-resident contract number)")
    print(f"SR images written to {out_dir}/")
    return 0


if __name__ == "__main__":
    sys.exit(main())
