#!/usr/bin/env python
"""PESR-compatible training entry point (SURVEY.md §1 L3, §2 item 7).

Usage mirrors the reference recipes (BASELINE.json:8-9):

  # phase 1: L1 pretraining
  python train.py --phase pretrain --train_dataset DIV2K \
      --batch_size 16 --patch_size 48 --scale 4

  # phase 2: GAN fine-tune from the pretrained generator
  python train.py --phase train --pretrained_model check_point/pesr \
      --gan_type RSGAN --alpha_vgg 50 --alpha_gan 1 --alpha_tv 1e-6

No datasets on disk?  ``--train_dataset synthetic --valid_dataset
synthetic`` runs the identical compute path on a procedural corpus.
"""

import json
import sys

from pesr_tpu.config import opts_from_args
from pesr_tpu.training.loop import run_training


def main(argv=None) -> int:
    from pesr_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    opts = opts_from_args(argv, mode="train")
    if opts.distributed:
        # Multi-host bring-up must precede any backend use (SURVEY.md
        # §2.11); explicit flag -> mis-configured clusters fail loudly.
        import jax
        from pesr_tpu import parallel
        parallel.initialize_distributed(required=True)
        print(f"distributed: process {jax.process_index()} of "
              f"{jax.process_count()}")
    summary = run_training(opts)
    print("[done] " + json.dumps({k: round(v, 4)
                                  for k, v in summary.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
