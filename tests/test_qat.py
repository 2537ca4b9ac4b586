"""QAT phase (models/qat.py): the fake-quant forward must bit-match
the real int8 inference conv, gradients must flow through the STE, and
the --phase qat loop must run end-to-end."""

import pytest
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from pesr_tpu.config import Opts
from pesr_tpu.models import Generator
from pesr_tpu.models.qat import fake_quant_conv, make_qat_apply

TINY = Opts(num_blocks=2, num_channels=8, patch_size=8, batch_size=8,
            compute_dtype="float32", steps_per_epoch=4)


def test_fake_quant_conv_matches_int8_qconv():
    """With calibration amax == this batch's amax, the QAT forward conv
    and quant_apply._qconv are the same computation."""
    from pesr_tpu.models.quant_apply import (_qconv,
                                             _quantize_conv_folded)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 12, 12, 8)) * 0.5,
                    jnp.float32)
    kernel = rng.standard_normal((3, 3, 8, 8)).astype(np.float32) * 0.1
    bias = rng.standard_normal((8,)).astype(np.float32) * 0.01

    got = np.asarray(fake_quant_conv(x, jnp.asarray(kernel),
                                     jnp.asarray(bias),
                                     dtype=jnp.float32))
    amax = np.max(np.abs(np.asarray(x)), axis=(0, 1, 2))
    qp = _quantize_conv_folded(kernel, bias, amax)
    ref = np.asarray(_qconv(x.astype(jnp.bfloat16), qp))
    # _qconv returns bf16, so agreement is to bf16 resolution (1 ulp at
    # |y|~2 is ~0.01); the integer conv itself is exact in both paths.
    np.testing.assert_allclose(got, ref, atol=1.2e-2, rtol=1e-2)
    assert np.median(np.abs(got - ref)) < 3e-3


def test_ste_gradients_flow():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    kernel = jnp.asarray(rng.standard_normal((3, 3, 4, 4)) * 0.1,
                         jnp.float32)
    bias = jnp.zeros((4,), jnp.float32)

    def loss(k):
        return jnp.mean(fake_quant_conv(x, k, bias,
                                        dtype=jnp.float32) ** 2)

    g = jax.grad(loss)(kernel)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 0


def test_qat_apply_shapes_and_loss_decreases():
    """A few QAT L1 steps on a fixed batch must reduce the loss — the
    STE path trains."""
    import optax
    gen = Generator(scale=2, num_blocks=2, num_channels=8,
                    dtype=jnp.float32)
    params = gen.init(jax.random.key(0),
                      jnp.zeros((1, 8, 8, 3), jnp.float32))["params"]
    apply_fn = make_qat_apply(2, dtype=jnp.float32)

    rng = np.random.default_rng(2)
    hr = jnp.asarray(np.tanh(rng.standard_normal((4, 16, 16, 3))),
                     jnp.float32)
    lr = hr[:, ::2, ::2]
    assert apply_fn({"params": params}, lr).shape == hr.shape

    tx = optax.adam(2e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            return jnp.mean(jnp.abs(apply_fn({"params": p}, lr) - hr))
        l, g = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), opt, l

    first = last = None
    for _ in range(15):
        params, opt, l = step(params, opt)
        first = first if first is not None else float(l)
        last = float(l)
    assert last < first * 0.9, (first, last)


@pytest.mark.slow
def test_phase_qat_end_to_end(tmp_path):
    from pesr_tpu.training.loop import run_training
    opts = dataclasses.replace(
        TINY, phase="qat", num_epochs=1, train_dataset="synthetic",
        valid_dataset="synthetic", num_valids=1, eval_pi=False,
        check_point=str(tmp_path / "exp"), snapshot_every=100,
        log_every=100)
    summary = run_training(opts)
    assert summary["steps"] == 4
    assert np.isfinite(summary["val_psnr"])
