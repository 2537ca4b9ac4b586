"""Committed demo checkpoints must keep loading and inferring.

The demo set promises a working out-of-the-box model at every
supported ``--scale`` (demo/README.md).  These artifacts are orbax
payloads committed in round 2-4; a checkpoint-layout or
restore-contract refactor could silently strand them until a human
runs the CLI.  This pins each committed dir: restore -> folded engine
-> SR of the right shape/dtype with non-degenerate content.
"""

import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DEMOS = [  # (dir, scale)
    ("demo/checkpoint", 4),
    ("demo/checkpoint_gan", 4),
    ("demo/checkpoint_x2", 2),
    ("demo/checkpoint_x2_hard", 2),
    ("demo/checkpoint_x3", 3),
    ("demo/checkpoint_x6", 6),
    ("demo/checkpoint_x8", 8),
]


@pytest.mark.parametrize("path,scale", DEMOS,
                         ids=[d for d, _ in DEMOS])
def test_demo_checkpoint_restores_and_infers(path, scale):
    from pesr_tpu.models.fold import folded_inference
    from pesr_tpu.ops.tiling import BatchTiledUpscaler
    from pesr_tpu.training.checkpoint import restore_generator_params

    full = os.path.join(REPO, path)
    assert os.path.isdir(full), f"committed demo dir missing: {path}"
    params, step = restore_generator_params(full)
    assert step > 0
    # 8 blocks x 64 channels is the demo convention (demo/README.md).
    assert params["head"]["kernel"].shape[-1] == 64

    apply_fn, variables = folded_inference(params, scale)
    eng = BatchTiledUpscaler(apply_fn, variables, scale, 24, 4)
    rng = np.random.default_rng(0)
    lr = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    sr = eng.upscale_many([lr], batch_size=1)[0]
    assert sr.shape == (24 * scale, 24 * scale, 3)
    assert sr.dtype == np.uint8
    # Non-degenerate: a trained model's SR of noise isn't constant.
    assert sr.std() > 1.0
