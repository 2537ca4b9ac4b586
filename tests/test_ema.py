"""--ema_decay (EMA of generator params) and network interpolation
(test.py --interp_model): the two parameter-space quality tools of the
perceptual-SR toolbox (ESRGAN lineage, PAPERS.md).

EMA contract: the jitted step updates ``ema += (1-d)*(params - ema)``
AFTER the optimizer update; eval/best-ckpt/inference use the EMA tree.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pesr_tpu.config import Opts
from pesr_tpu.training import checkpoint as ckpt
from pesr_tpu.training import (create_discriminator_state,
                               create_generator_state, make_gan_step,
                               make_pretrain_step)
from pesr_tpu.training.loop import build_discriminator, build_generator
from pesr_tpu.training.state import init_vgg_params

TINY = Opts(num_blocks=2, num_channels=8, patch_size=12, batch_size=8,
            compute_dtype="float32", steps_per_epoch=10,
            alpha_vgg=1.0, alpha_tv=1e-6, alpha_gan=1.0)


def _batch(opts, seed=0):
    rng = np.random.default_rng(seed)
    hr = np.tanh(rng.standard_normal(
        (opts.batch_size, opts.hr_patch_size, opts.hr_patch_size, 3)
    ).astype(np.float32))
    return jnp.asarray(hr[:, ::opts.scale, ::opts.scale]), jnp.asarray(hr)


def _tree_allclose(a, b, atol=1e-6):
    for x, y in zip(jax.tree_util.tree_leaves(jax.device_get(a)),
                    jax.tree_util.tree_leaves(jax.device_get(b))):
        np.testing.assert_allclose(x, y, atol=atol, rtol=1e-6)


def test_pretrain_ema_matches_manual_average():
    decay = 0.5
    opts = dataclasses.replace(TINY, ema_decay=decay, learning_rate=1e-3)
    g = create_generator_state(opts, build_generator(opts),
                               jax.random.key(0))
    step = make_pretrain_step(opts)
    ema = jax.tree_util.tree_map(jnp.copy, g.params)
    expect = jax.device_get(g.params)
    lr, hr = _batch(opts)
    for i in range(3):
        g, ema, _ = step(g, ema, lr, hr)
        expect = jax.tree_util.tree_map(
            lambda e, p: e + (1 - decay) * (p - e),
            expect, jax.device_get(g.params))
    _tree_allclose(ema, expect)
    # EMA must trail the raw params (decay > 0), not alias them.
    diffs = [np.abs(x - y).max() for x, y in zip(
        jax.tree_util.tree_leaves(jax.device_get(ema)),
        jax.tree_util.tree_leaves(jax.device_get(g.params)))]
    assert max(diffs) > 0


def test_pretrain_ema_decay_zero_keeps_legacy_signature():
    step = make_pretrain_step(TINY)
    g = create_generator_state(TINY, build_generator(TINY),
                               jax.random.key(0))
    lr, hr = _batch(TINY)
    out = step(g, lr, hr)
    assert len(out) == 2  # (state, metrics) — no EMA arg


def test_gan_step_updates_ema():
    decay = 0.9
    opts = dataclasses.replace(TINY, phase="train", ema_decay=decay)
    g = create_generator_state(opts, build_generator(opts),
                               jax.random.key(0))
    disc = build_discriminator(opts)
    d = create_discriminator_state(opts, disc, jax.random.key(1))
    from pesr_tpu.models import VGG19Features
    vgg = VGG19Features(layer=opts.vgg_layer, dtype=jnp.float32)
    vgg_params = init_vgg_params(opts, vgg, jax.random.key(2))
    step = make_gan_step(
        opts, d_apply=lambda p, x: disc.apply({"params": p}, x),
        vgg_apply=lambda p, x: vgg.apply({"params": p}, x))
    ema = jax.tree_util.tree_map(jnp.copy, g.params)
    p0 = jax.device_get(g.params)
    lr, hr = _batch(opts)
    g, d, ema, m = step(g, d, vgg_params, ema, lr, hr, jax.random.key(3))
    expect = jax.tree_util.tree_map(
        lambda e, p: e + (1 - decay) * (p - e), p0,
        jax.device_get(g.params))
    _tree_allclose(ema, expect)
    assert np.isfinite(float(m["g_loss"]))


def test_ema_checkpoint_roundtrip(tmp_path):
    opts = dataclasses.replace(TINY, ema_decay=0.9)
    g = create_generator_state(opts, build_generator(opts),
                               jax.random.key(0))
    ema = jax.tree_util.tree_map(lambda p: p + 1.0, g.params)
    ckpt.save_train_ckpt(str(tmp_path / "exp"), 5, g, ema_params=ema)

    # Inference prefers the EMA tree; prefer_ema=False gets raw params.
    p_ema, step = ckpt.restore_generator_params(str(tmp_path / "exp"))
    assert step == 5
    _tree_allclose(p_ema, ema)
    p_raw, _ = ckpt.restore_generator_params(str(tmp_path / "exp"),
                                             prefer_ema=False)
    _tree_allclose(p_raw, g.params)

    # Resume path: restore onto a params template.
    restored = ckpt.restore_ema_params(str(tmp_path / "exp"), g.params)
    _tree_allclose(restored, ema)

    # Pre-EMA checkpoints: no 'ema' key -> raw params + None.
    ckpt.save_train_ckpt(str(tmp_path / "old"), 3, g)
    p_old, _ = ckpt.restore_generator_params(str(tmp_path / "old"))
    _tree_allclose(p_old, g.params)
    assert ckpt.restore_ema_params(str(tmp_path / "old"),
                                   g.params) is None


@pytest.mark.slow
def test_run_training_with_ema_end_to_end(tmp_path):
    """Loop wiring: EMA threads through steps, eval runs on the EMA
    weights, snapshots carry the tree, and --resume continues the
    average instead of re-seeding it."""
    from pesr_tpu.training.loop import run_training
    opts = dataclasses.replace(
        TINY, phase="pretrain", ema_decay=0.8, steps_per_epoch=3,
        num_epochs=1, batch_size=8, train_dataset="synthetic",
        valid_dataset="synthetic", num_valids=1, eval_every=1,
        eval_pi=False, check_point=str(tmp_path / "exp"),
        snapshot_every=1, log_every=100, learning_rate=1e-3)
    run_training(opts)
    payload = ckpt.restore_payload(str(tmp_path / "exp"))
    assert payload.get("ema") is not None
    raw = jax.tree_util.tree_leaves(payload["g"]["params"])
    avg = jax.tree_util.tree_leaves(payload["ema"])
    assert any(np.abs(a - b).max() > 0 for a, b in zip(raw, avg))

    ema_before = payload["ema"]
    opts2 = dataclasses.replace(opts, resume=True, num_epochs=2)
    run_training(opts2)
    payload2 = ckpt.restore_payload(str(tmp_path / "exp"))
    assert int(payload2["step"]) == 6
    # The resumed EMA evolved from the restored average (decay 0.8 over
    # 3 more steps cannot leave it bitwise-equal, and a re-seed from the
    # raw params would match payload2's params instead).
    after = jax.tree_util.tree_leaves(payload2["ema"])
    assert any(np.abs(a - b).max() > 0 for a, b in zip(
        jax.tree_util.tree_leaves(ema_before), after))
    assert any(np.abs(a - b).max() > 0 for a, b in zip(
        jax.tree_util.tree_leaves(payload2["g"]["params"]), after))


def test_interpolate_params_endpoints_and_midpoint():
    a = {"w": np.full((3, 3), 2.0, np.float32),
         "b": np.zeros((3,), np.float32)}
    b = {"w": np.full((3, 3), 4.0, np.float32),
         "b": np.ones((3,), np.float32)}
    _tree_allclose(ckpt.interpolate_params(a, b, 0.0), a)
    _tree_allclose(ckpt.interpolate_params(a, b, 1.0), b)
    mid = ckpt.interpolate_params(a, b, 0.5)
    np.testing.assert_allclose(mid["w"], 3.0)
    np.testing.assert_allclose(mid["b"], 0.5)


def test_test_cli_network_interpolation(tmp_path, monkeypatch):
    """test.py --interp_model blends two checkpoints before inference;
    alpha outside [0,1] and --interp_model without --model_path are
    rejected."""
    opts = dataclasses.replace(TINY, scale=2)
    g = create_generator_state(opts, build_generator(opts),
                               jax.random.key(0))
    ckpt.save_train_ckpt(str(tmp_path / "a"), 1, g)
    g2 = g.replace(params=jax.tree_util.tree_map(
        lambda p: p + 0.01, g.params))
    ckpt.save_train_ckpt(str(tmp_path / "b"), 2, g2)

    import test as test_cli
    monkeypatch.chdir(tmp_path)
    base = ["--dataset", "synthetic", "--scale", "2",
            "--num_blocks", "2", "--num_channels", "8",
            "--compute_dtype", "float32", "--tile_size", "16",
            "--model_path", str(tmp_path / "a"),
            "--interp_model", str(tmp_path / "b"),
            "--output_dir", str(tmp_path / "out")]
    assert test_cli.main(base + ["--interp_alpha", "0.25"]) == 0

    with pytest.raises(SystemExit, match="outside"):
        test_cli.main(base + ["--interp_alpha", "1.5"])
    with pytest.raises(SystemExit, match="needs --model_path"):
        test_cli.main(["--dataset", "synthetic", "--scale", "2",
                       "--num_blocks", "2", "--num_channels", "8",
                       "--interp_model", str(tmp_path / "b")])
