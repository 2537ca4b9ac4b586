"""VGG-19 feature extractor for the perceptual loss (SURVEY.md §2 item 4).

The reference truncates torchvision's pretrained ``vgg19().features`` at
conv5_4 *pre-activation* (the SRGAN/ESRGAN "VGG54" convention), freezes
it, normalizes inputs with ImageNet statistics, and compares SR/HR
features in the generator loss (SURVEY.md §2 item 6).

This is a from-scratch flax implementation of the same trunk.  ImageNet
weights are NOT on this machine (SURVEY.md §7 hard-parts item 1); the
loss is therefore gated behind ``alpha_vgg`` and the weights come from
either
  * ``pesr_tpu.convert.convert_torch_vgg19`` applied to any torch VGG19
    checkpoint the user provides (``--vgg_weights``), or
  * a fixed-seed random init — a random deep CNN is still a valid
    perceptual metric for *tests* (parity math is weight-agnostic), but
    training quality parity requires real weights.

Layer naming follows the convX_Y convention so converted checkpoints map
unambiguously.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any

# VGG-19 configuration: (stage, convs-per-stage, channels).
_VGG19_CFG: Tuple[Tuple[int, int, int], ...] = (
    (1, 2, 64),
    (2, 2, 128),
    (3, 4, 256),
    (4, 4, 512),
    (5, 4, 512),
)

# ImageNet normalization (torchvision convention, RGB in [0,1]).
_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


def vgg_preprocess(x: jnp.ndarray) -> jnp.ndarray:
    """Map model-space images in [-1, 1] to normalized VGG input."""
    x01 = (x.astype(jnp.float32) + 1.0) * 0.5
    mean = jnp.asarray(_IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(_IMAGENET_STD, jnp.float32)
    return (x01 - mean) / std


class VGG19Features(nn.Module):
    """VGG-19 trunk up to a requested layer (default conv5_4 pre-act).

    ``layer`` uses the two-digit PESR/SRGAN shorthand: "54" = stage 5,
    conv 4 (pre-activation); "22" = stage 2, conv 2; etc.
    """

    layer: str = "54"
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        target_stage, target_conv = int(self.layer[0]), int(self.layer[1])
        x = vgg_preprocess(x).astype(self.dtype)
        for stage, n_convs, ch in _VGG19_CFG:
            for conv in range(1, n_convs + 1):
                x = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype,
                            param_dtype=self.param_dtype,
                            name=f"conv{stage}_{conv}")(x)
                if stage == target_stage and conv == target_conv:
                    return x.astype(jnp.float32)  # pre-activation output
                x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        raise ValueError(f"layer {self.layer!r} not in VGG-19 trunk")


def vgg_layer_names() -> Dict[str, Tuple[int, int]]:
    """All valid conv layer shorthands -> (stage, conv) — used by the
    torch converter to validate coverage."""
    names = {}
    for stage, n_convs, _ in _VGG19_CFG:
        for conv in range(1, n_convs + 1):
            names[f"{stage}{conv}"] = (stage, conv)
    return names
