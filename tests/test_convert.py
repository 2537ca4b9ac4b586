"""torch->flax conversion golden tests (SURVEY.md §4 "parity vs converted
PyTorch checkpoints"; §7 hard-parts item 4).

No reference checkpoints exist on disk, so the oracle is a torch module
built HERE with the reference architecture (EDSR-style generator per
SURVEY.md §3.4): random torch weights -> convert -> the flax generator
must reproduce the torch forward to float tolerance.  When real PESR
checkpoints appear, the same converter + this harness make parity a
one-command check.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn

from pesr_tpu.convert import (convert_torch_generator, convert_torch_vgg19,
                              validate_against_template)
from pesr_tpu.models import Generator, VGG19Features

SCALE, BLOCKS, CH = 4, 3, 8


class TorchResBlock(nn.Module):
    def __init__(self, ch, res_scale):
        super().__init__()
        self.conv1 = nn.Conv2d(ch, ch, 3, padding=1)
        self.conv2 = nn.Conv2d(ch, ch, 3, padding=1)
        self.res_scale = res_scale

    def forward(self, x):
        return x + self.res_scale * self.conv2(torch.relu(self.conv1(x)))


class TorchGenerator(nn.Module):
    """The reference generator architecture (SURVEY.md §3.4) in torch."""

    def __init__(self, scale=SCALE, blocks=BLOCKS, ch=CH, res_scale=0.1):
        super().__init__()
        self.head = nn.Conv2d(3, ch, 3, padding=1)
        self.body = nn.Sequential(
            *[TorchResBlock(ch, res_scale) for _ in range(blocks)])
        self.tail = nn.Conv2d(ch, ch, 3, padding=1)
        ups = []
        for _ in range(int(np.log2(scale))):
            ups += [nn.Conv2d(ch, 4 * ch, 3, padding=1), nn.PixelShuffle(2)]
        self.upsampler = nn.Sequential(*ups)
        self.out = nn.Conv2d(ch, 3, 3, padding=1)

    def forward(self, x):
        h = self.head(x)
        y = self.tail(self.body(h)) + h
        return self.out(self.upsampler(y))


@pytest.fixture(scope="module")
def torch_gen():
    torch.manual_seed(0)
    m = TorchGenerator()
    m.eval()
    return m


def test_generator_conversion_forward_parity(torch_gen):
    params = convert_torch_generator(torch_gen.state_dict(), BLOCKS, SCALE)

    flax_gen = Generator(scale=SCALE, num_blocks=BLOCKS, num_channels=CH,
                         res_scale=0.1, dtype=jnp.float32)
    template = flax_gen.init(jax.random.key(0),
                             jnp.zeros((1, 8, 8, 3)))["params"]
    validate_against_template(template, params, "generator")

    x = np.random.default_rng(0).standard_normal((2, 12, 10, 3)).astype(
        np.float32)
    ours = np.asarray(flax_gen.apply({"params": jax.tree_util.tree_map(
        jnp.asarray, params)}, jnp.asarray(x)))

    with torch.no_grad():
        ref = torch_gen(torch.from_numpy(x).permute(0, 3, 1, 2)
                        ).permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_generator_conversion_rejects_wrong_depth(torch_gen):
    with pytest.raises(ValueError, match="expected .* convs"):
        convert_torch_generator(torch_gen.state_dict(), BLOCKS + 1, SCALE)


def test_vgg19_conversion_forward_parity():
    """Small-channel VGG19-shaped torch trunk -> converted flax VGG must
    match torch forward at conv5_4 pre-activation."""
    cfg = [(1, 2, 4), (2, 2, 8), (3, 4, 8), (4, 4, 8), (5, 4, 8)]

    torch.manual_seed(1)
    layers, in_ch = [], 3
    for _, n, ch in cfg:
        for _ in range(n):
            layers += [nn.Conv2d(in_ch, ch, 3, padding=1), nn.ReLU()]
            in_ch = ch
        layers += [nn.MaxPool2d(2)]
    # Drop the trailing [ReLU, MaxPool] so the trunk ends at conv5_4
    # PRE-activation, matching VGG19Features(layer="54").
    trunk = nn.Sequential(*layers[:-2])
    trunk.eval()

    params = convert_torch_vgg19(trunk.state_dict())

    # flax VGG with the same reduced channel plan, via monkeypatched cfg.
    import pesr_tpu.models.vgg as vggmod
    orig = vggmod._VGG19_CFG
    vggmod._VGG19_CFG = tuple(cfg)
    try:
        m = VGG19Features(layer="54", dtype=jnp.float32)
        x01 = np.random.default_rng(2).random((1, 32, 32, 3)).astype(
            np.float32)
        x_model = x01 * 2.0 - 1.0  # model space [-1,1]
        ours = np.asarray(m.apply(
            {"params": jax.tree_util.tree_map(jnp.asarray, params)},
            jnp.asarray(x_model)))
    finally:
        vggmod._VGG19_CFG = orig

    # torch side gets the same normalized input VGG19Features feeds its
    # convs (ImageNet mean/std over [0,1]).
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    xn = (x01 - mean) / std
    with torch.no_grad():
        feats = trunk(torch.from_numpy(xn).permute(0, 3, 1, 2))
    ref = feats.permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(ours, ref, atol=2e-5)
