"""Converter coverage at the other scales + VGG layer map (SURVEY.md §4
golden tier extensions)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn

from pesr_tpu.convert import convert_torch_generator
from pesr_tpu.models import Generator
from pesr_tpu.models.vgg import vgg_layer_names
from pesr_tpu.scales import upsample_stages


class _TorchGen(nn.Module):
    def __init__(self, scale, blocks=2, ch=8):
        super().__init__()
        self.head = nn.Conv2d(3, ch, 3, padding=1)
        body = []
        for _ in range(blocks):
            body += [nn.Conv2d(ch, ch, 3, padding=1),
                     nn.Conv2d(ch, ch, 3, padding=1)]
        self.body = nn.ModuleList(body)
        self.tail = nn.Conv2d(ch, ch, 3, padding=1)
        ups = []
        for f in upsample_stages(scale):
            ups += [nn.Conv2d(ch, f * f * ch, 3, padding=1),
                    nn.PixelShuffle(f)]
        self.ups = nn.Sequential(*ups)
        self.out = nn.Conv2d(ch, 3, 3, padding=1)

    def forward(self, x):
        h = self.head(x)
        y = h
        for i in range(0, len(self.body), 2):
            y = y + 0.1 * self.body[i + 1](torch.relu(self.body[i](y)))
        return self.out(self.ups(self.tail(y) + h))


@pytest.mark.parametrize("scale", [2, 3, 8])
def test_conversion_parity_other_scales(scale):
    torch.manual_seed(scale)
    tg = _TorchGen(scale)
    tg.eval()
    params = convert_torch_generator(tg.state_dict(), num_blocks=2,
                                     scale=scale)
    fg = Generator(scale=scale, num_blocks=2, num_channels=8,
                   res_scale=0.1, dtype=jnp.float32)
    x = np.random.default_rng(0).standard_normal((1, 6, 7, 3)).astype(
        np.float32)
    ours = np.asarray(fg.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(x)))
    with torch.no_grad():
        ref = tg(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(
            0, 2, 3, 1).numpy()
    assert ours.shape == (1, 6 * scale, 7 * scale, 3)
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_vgg_layer_names_cover_trunk():
    names = vgg_layer_names()
    assert len(names) == 16                   # VGG-19 conv trunk
    assert names["54"] == (5, 4)
    assert names["11"] == (1, 1)
    assert "55" not in names


def test_pirm_evaluate_dir_smoke(tmp_path):
    from pesr_tpu.data.datasets import SyntheticImages
    from pesr_tpu.metrics.niqe import NiqeModel, fit_niqe_model
    from pesr_tpu.metrics.pirm import evaluate_dir
    from pesr_tpu.utils.image_io import imwrite_uint8

    src = SyntheticImages(3, 192, 192, seed=11)
    for i in range(2):
        imwrite_uint8(str(tmp_path / f"im{i}.png"), src.get(i))
    model = fit_niqe_model([SyntheticImages(4, 288, 288, seed=12).get(i)
                            for i in range(4)])
    result = evaluate_dir(str(tmp_path), model, verbose=False)
    assert result["n_images"] == 2
    for key in ("pi", "niqe", "ma"):
        assert np.isfinite(result[key])
    # Spread fields (round-4 verdict #5): per-image std + SEM of the
    # mean, consistent with each other.
    for key in ("pi_std", "pi_sem", "niqe_std", "ma_std"):
        assert np.isfinite(result[key]) and result[key] >= 0
    np.testing.assert_allclose(result["pi_sem"],
                               result["pi_std"] / np.sqrt(2), rtol=1e-9)


def test_niqe_from_features_matches_niqe():
    """The precomputed-features scoring path (pi_precision resampling)
    is the same math as niqe()."""
    from pesr_tpu.data.datasets import SyntheticImages
    from pesr_tpu.metrics.niqe import (extract_niqe_features,
                                       fit_niqe_model, niqe,
                                       niqe_from_features)

    model = fit_niqe_model([SyntheticImages(4, 288, 288, seed=12).get(i)
                            for i in range(4)])
    img = SyntheticImages(1, 192, 192, seed=13).get(0)
    assert niqe(img, model) == niqe_from_features(
        extract_niqe_features(img), model)


def test_fit_forests_matches_fit_ma_model():
    """fit_forests (the resampling entry point) reproduces fit_ma_model
    exactly when given the same features."""
    from pesr_tpu.data.datasets import SyntheticImages
    from pesr_tpu.metrics.fit_ma import (build_training_set, fit_forests,
                                         fit_ma_model)

    x, y = build_training_set(num_images=2, seed=5)
    a = fit_forests(x, y, n_trees=3, max_depth=4, seed=5)
    b = fit_ma_model(num_images=2, n_trees=3, max_depth=4, seed=5)
    img = SyntheticImages(1, 192, 192, seed=14).get(0)
    assert a(img) == b(img)


@pytest.mark.slow
def test_convert_cli_discriminator_kind(tmp_path):
    """python -m pesr_tpu.convert --kind discriminator end-to-end:
    torch SRGAN-D .pth -> orbax payload with a 'd' tree."""
    import torch
    import numpy as np
    import orbax.checkpoint as ocp
    from pesr_tpu.convert import main as convert_main
    from tests.test_convert import TorchDiscriminator

    hr = 32
    torch.manual_seed(0)
    td = TorchDiscriminator(hr=hr, chs=(64, 128, 256, 512))
    # match the flax head width (dense_features=1024)
    import torch.nn as nn
    flat = 512 * (hr // 16) ** 2
    td.fc = nn.Sequential(nn.Linear(flat, 1024), nn.LeakyReLU(0.2),
                          nn.Linear(1024, 1))
    src = str(tmp_path / "d.pth")
    torch.save(td.state_dict(), src)

    dst = str(tmp_path / "d_ckpt")
    assert convert_main([src, dst, "--kind", "discriminator",
                         "--hr_size", str(hr)]) == 0
    with ocp.PyTreeCheckpointer() as ckptr:
        payload = ckptr.restore(dst)
    assert "d" in payload and "conv0" in payload["d"]["params"]
    assert payload["d"]["params"]["fc0"]["kernel"].shape == (flat, 1024)
    assert np.asarray(payload["step"]) == 0

    # The artifact must have a consumer (round-2 review: it was a dead
    # end): --pretrained_d loads it back against the flax template.
    from pesr_tpu.convert import load_discriminator_params
    from pesr_tpu.models import Discriminator
    template = Discriminator().init(
        jax.random.key(0), jnp.zeros((1, hr, hr, 3)))["params"]
    loaded = load_discriminator_params(dst, template, hr)
    np.testing.assert_allclose(
        np.asarray(loaded["fc0"]["kernel"]),
        np.asarray(payload["d"]["params"]["fc0"]["kernel"]))


def test_convert_cli_vgg19_artifact_loads_back(tmp_path):
    """--kind vgg19 output must feed --vgg_weights (round-2 review):
    load_vgg_weights accepts the orbax dir, including against a
    truncated --vgg_layer template."""
    import torch.nn as nn
    from pesr_tpu.convert import load_vgg_weights, main as convert_main
    import pesr_tpu.models.vgg as vggmod
    from pesr_tpu.models import VGG19Features

    cfg = [(1, 2, 4), (2, 2, 8), (3, 4, 8), (4, 4, 8), (5, 4, 8)]
    torch.manual_seed(6)
    layers, in_ch = [], 3
    for _, n, ch in cfg:
        for _ in range(n):
            layers += [nn.Conv2d(in_ch, ch, 3, padding=1), nn.ReLU()]
            in_ch = ch
        layers += [nn.MaxPool2d(2)]
    trunk = nn.Sequential(*layers[:-2])
    src = str(tmp_path / "vgg.pth")
    torch.save(trunk.state_dict(), src)

    orig = vggmod._VGG19_CFG
    vggmod._VGG19_CFG = tuple(cfg)
    try:
        dst = str(tmp_path / "vgg_ckpt")
        assert convert_main([src, dst, "--kind", "vgg19"]) == 0
        template = VGG19Features(layer="22", dtype=jnp.float32).init(
            jax.random.key(0), jnp.zeros((1, 16, 16, 3)))["params"]
        loaded = load_vgg_weights(dst, template)
        assert set(loaded) == set(template)
    finally:
        vggmod._VGG19_CFG = orig
