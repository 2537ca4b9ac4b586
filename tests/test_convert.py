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


@pytest.mark.slow
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


class TorchDiscriminator(nn.Module):
    """SRGAN-style torch discriminator mirroring the reconstructed
    reference registration order (SURVEY.md §2 item 3): {stride-1,
    stride-2} conv pairs over 64->128->256->512, BatchNorm after every
    conv but the first, dense(1024) -> dense(1)."""

    def __init__(self, hr=32, chs=(4, 8, 8, 8)):
        super().__init__()
        layers = [nn.Conv2d(3, chs[0], 3, 1, 1), nn.LeakyReLU(0.2)]
        layers += [nn.Conv2d(chs[0], chs[0], 3, 2, 1),
                   nn.BatchNorm2d(chs[0]), nn.LeakyReLU(0.2)]
        in_ch = chs[0]
        for ch in chs[1:]:
            layers += [nn.Conv2d(in_ch, ch, 3, 1, 1),
                       nn.BatchNorm2d(ch), nn.LeakyReLU(0.2)]
            layers += [nn.Conv2d(ch, ch, 3, 2, 1),
                       nn.BatchNorm2d(ch), nn.LeakyReLU(0.2)]
            in_ch = ch
        self.features = nn.Sequential(*layers)
        flat = chs[-1] * (hr // 16) ** 2
        self.fc = nn.Sequential(nn.Linear(flat, 16), nn.LeakyReLU(0.2),
                                nn.Linear(16, 1))

    def forward(self, x):
        return self.fc(self.features(x).flatten(1))


def test_discriminator_conversion_forward_parity():
    """Torch D (batch-stat mode) vs flax D with converted weights —
    pins the conv/BN positional mapping AND the NCHW-vs-NHWC flatten
    permutation of the dense head (convert.convert_torch_discriminator).
    """
    from pesr_tpu.convert import convert_torch_discriminator
    from pesr_tpu.models import Discriminator

    hr, chs = 32, (4, 8, 8, 8)
    torch.manual_seed(3)
    td = TorchDiscriminator(hr=hr, chs=chs)
    # Randomize BN affine params (default 1/0 would hide mapping bugs).
    with torch.no_grad():
        for m in td.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.3, 0.3)
    td.train()  # batch-statistics mode = our BatchStatNorm semantics

    params = convert_torch_discriminator(td.state_dict(), hr,
                                         channel_schedule=chs)

    fd = Discriminator(channel_schedule=chs, dense_features=16,
                       dtype=jnp.float32)
    template = fd.init(jax.random.key(0),
                       jnp.zeros((2, hr, hr, 3)))["params"]
    validate_against_template(template, params, "discriminator")

    x = np.random.default_rng(4).standard_normal((4, hr, hr, 3)).astype(
        np.float32)
    ours = np.asarray(fd.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(x)))
    with torch.no_grad():
        ref = td(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    np.testing.assert_allclose(ours, ref, atol=5e-5)


def test_discriminator_conversion_rejects_wrong_geometry():
    from pesr_tpu.convert import convert_torch_discriminator
    torch.manual_seed(3)
    td = TorchDiscriminator(hr=32, chs=(4, 8, 8, 8))
    with pytest.raises(ValueError, match="flat dim"):
        convert_torch_discriminator(td.state_dict(), 64,
                                    channel_schedule=(4, 8, 8, 8))


def test_vgg19_conversion_rejects_extra_convs():
    """Extra 4-D convs must error, not silently truncate (round-1
    advisor finding on convert.py)."""
    torch.manual_seed(1)
    layers, in_ch = [], 3
    for ch in [4] * 17:  # one conv too many
        layers += [nn.Conv2d(in_ch, ch, 3, padding=1)]
        in_ch = ch
    trunk = nn.Sequential(*layers)
    with pytest.raises(ValueError, match="exactly 16"):
        convert_torch_vgg19(trunk.state_dict())


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


def test_load_vgg_weights_with_truncated_template(tmp_path):
    """--vgg_layer 22 initializes only the trunk PREFIX (VGG19Features
    returns early), while a torch checkpoint has all 16 convs:
    load_vgg_weights must load the prefix instead of erroring on the
    extra layers (round-2 review finding)."""
    from pesr_tpu.convert import load_vgg_weights

    cfg = [(1, 2, 4), (2, 2, 8), (3, 4, 8), (4, 4, 8), (5, 4, 8)]
    torch.manual_seed(4)
    layers, in_ch = [], 3
    for _, n, ch in cfg:
        for _ in range(n):
            layers += [nn.Conv2d(in_ch, ch, 3, padding=1), nn.ReLU()]
            in_ch = ch
        layers += [nn.MaxPool2d(2)]
    trunk = nn.Sequential(*layers[:-2])
    path = str(tmp_path / "vgg.pth")
    torch.save(trunk.state_dict(), path)

    import pesr_tpu.models.vgg as vggmod
    orig = vggmod._VGG19_CFG
    vggmod._VGG19_CFG = tuple(cfg)
    try:
        m = VGG19Features(layer="22", dtype=jnp.float32)
        template = m.init(jax.random.key(0),
                          jnp.zeros((1, 16, 16, 3)))["params"]
        assert len(template) == 4  # prefix only: conv1_1..conv2_2
        loaded = load_vgg_weights(path, template)
        assert set(loaded) == set(template)
        # and the loaded prefix matches the checkpoint's weights
        w = trunk[0].weight.detach().numpy().transpose(2, 3, 1, 0)
        np.testing.assert_allclose(
            np.asarray(loaded["conv1_1"]["kernel"]), w, atol=1e-6)

        # a checkpoint MISSING required prefix layers still errors
        import pesr_tpu.convert as cv
        partial = {k: v for i, (k, v) in enumerate(trunk.state_dict()
                                                   .items()) if i < 4}
        partial_path = str(tmp_path / "partial.pth")
        torch.save(partial, partial_path)
        with pytest.raises(ValueError):
            cv.load_vgg_weights(partial_path, template)
    finally:
        vggmod._VGG19_CFG = orig


def test_export_torch_generator_roundtrip(tmp_path):
    """flax -> torch .pth -> flax round-trips bitwise through our own
    importer, for every scale's stage count (the interchange contract:
    models trained here hand a .pth back to reference tooling)."""
    from pesr_tpu.convert import (load_generator_weights,
                                  save_generator_torch)

    for scale in (1, 2, 4, 8):
        gen = Generator(scale=scale, num_blocks=3, num_channels=8,
                        dtype=jnp.float32)
        variables = gen.init(jax.random.key(scale),
                             jnp.zeros((1, 8, 8, 3)))
        params = variables["params"]
        path = str(tmp_path / f"g_x{scale}.pth")
        n = save_generator_torch(params, scale, path)
        assert n == sum(int(np.asarray(v).size) for v in
                        jax.tree_util.tree_leaves(params))
        back = load_generator_weights(path, params, 3, scale)
        flat_a = jax.tree_util.tree_leaves_with_path(params)
        flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
        for k, va in flat_a:
            np.testing.assert_array_equal(np.asarray(va, np.float32),
                                          flat_b[k], err_msg=str(k))


@pytest.mark.slow
def test_convert_cli_to_torch(tmp_path):
    """The --to_torch CLI direction: orbax ckpt dir -> .pth that
    test.py then loads directly as a torch checkpoint."""
    import orbax.checkpoint as ocp

    from pesr_tpu.convert import main as convert_main

    gen = Generator(scale=2, num_blocks=2, num_channels=8,
                    dtype=jnp.float32)
    variables = gen.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
    ckpt_dir = str(tmp_path / "ckpt")
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(ckpt_dir, {"step": np.asarray(7),
                              "g": {"params": variables["params"]}})
    pth = str(tmp_path / "g.pth")
    rc = convert_main([ckpt_dir, pth, "--to_torch", "--scale", "2"])
    assert rc == 0 and torch.load(pth, weights_only=True)

    import test as test_cli
    rc = test_cli.main(["--dataset", "synthetic", "--scale", "2",
                        "--num_blocks", "2", "--num_channels", "8",
                        "--compute_dtype", "float32",
                        "--model_path", pth,
                        "--output_dir", str(tmp_path / "out")])
    assert rc == 0
