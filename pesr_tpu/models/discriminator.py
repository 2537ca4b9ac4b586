"""SRGAN-style strided-conv discriminator (SURVEY.md §2 item 3).

Reference behavior (reconstructed): repeated {3x3 conv stride 1, 3x3 conv
stride 2} pairs walking channels 64->128->256->512, BatchNorm + LeakyReLU,
then flatten -> dense(1024) -> LeakyReLU -> dense(1).  No sigmoid in the
net — the relativistic GAN losses apply BCE-with-logits externally
(SURVEY.md §2 item 6).

TPU-native deviations (documented, D is training-only so no checkpoint
parity is owed):
  * Normalization is per-channel batch-statistics normalization with
    learned scale/bias — identical math to torch BatchNorm in training
    mode but WITHOUT running-average state.  The reference never runs its
    discriminator in eval mode, so running stats are dead state; dropping
    them keeps the GAN train step a pure function (no mutable
    collections threaded through jit).
  * Optional spectral normalization (the reference exposes a flag for it)
    is implemented *statelessly*: a fixed-seed power iteration re-run per
    call.  A few matvecs on weights <=(4608, 512) are noise on the MXU and
    it avoids mutable power-iteration state inside the compiled step.
  * The dense head is sized for the training HR patch (static shapes under
    jit); GAN training always runs on fixed patch sizes (BASELINE.json:8).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class BatchStatNorm(nn.Module):
    """BatchNorm-in-training-mode without running statistics."""

    epsilon: float = 1e-5
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,),
                          self.param_dtype)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(xf, axis=(0, 1, 2), keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return y.astype(x.dtype)


def _spectral_normalize(w: jnp.ndarray,
                        num_iters: int = 10) -> jnp.ndarray:
    """Stateless spectral norm: divide w by its top singular value,
    estimated with a fixed-start power iteration (deterministic).

    Stateless means a COLD start every call (torch carries a persistent
    ``u`` across steps; a flax mutable collection would complicate the
    purely-functional train step), so convergence is (s2/s1)^num_iters
    from the ones vector.  10 iterations keep the estimate tight even
    after training decorrelates the top singular direction from the
    start vector — at 3 (the old default) sigma was systematically
    underestimated and the Lipschitz bound silently violated.  Cost is
    ~20 small matvecs per conv, noise next to the convs themselves."""
    mat = w.reshape(-1, w.shape[-1]).astype(jnp.float32)
    u = jnp.ones((mat.shape[0],), jnp.float32) / jnp.sqrt(mat.shape[0])
    for _ in range(num_iters):
        v = mat.T @ u
        v = v / (jnp.linalg.norm(v) + 1e-12)
        u = mat @ v
        u = u / (jnp.linalg.norm(u) + 1e-12)
    sigma = u @ (mat @ v)
    return (w / (sigma + 1e-12)).astype(w.dtype)


class SNConv(nn.Module):
    """3x3 conv with optional stateless spectral normalization."""

    features: int
    strides: int = 1
    use_sn: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_feats = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, in_feats, self.features),
            self.param_dtype,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          self.param_dtype)
        if self.use_sn:
            kernel = _spectral_normalize(kernel)
        # Compute dtype throughout (MXU accumulates bf16 convs in f32
        # internally); preferred_element_type is avoided because mixed
        # fwd/cotangent dtypes break the conv VJP.
        # Explicit (1,1) padding = torch Conv2d(padding=1) semantics.
        # For stride 2 on even extents XLA's "SAME" pads (0,1) instead,
        # shifting the sample grid by one pixel vs torch — explicit pad
        # keeps converted reference discriminators numerically exact
        # (convert.convert_torch_discriminator).
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=(self.strides, self.strides),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(self.dtype)


class Discriminator(nn.Module):
    """Strided-conv discriminator producing raw logits [B, 1].

    ``channel_schedule`` overrides the widths explicitly; when left
    None it derives from ``base_channels`` as (1, 2, 4, 8) x base (the
    SRGAN doubling plan) — previously base_channels was a dead field
    every consumer silently ignored."""

    base_channels: int = 64
    channel_schedule: Optional[Sequence[int]] = None
    dense_features: int = 1024
    leak: float = 0.2
    spectral_norm: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(self.dtype)
        act = lambda v: nn.leaky_relu(v, self.leak)  # noqa: E731
        schedule = (tuple(self.channel_schedule)
                    if self.channel_schedule is not None
                    else tuple(self.base_channels * m
                               for m in (1, 2, 4, 8)))

        # First conv: no norm (SRGAN convention).
        x = act(SNConv(schedule[0], 1, self.spectral_norm,
                       self.dtype, self.param_dtype, name="conv0")(x))
        x = act(BatchStatNorm(name="bn0")(
            SNConv(schedule[0], 2, self.spectral_norm,
                   self.dtype, self.param_dtype, name="conv0s")(x)))

        for i, ch in enumerate(schedule[1:], start=1):
            x = act(BatchStatNorm(name=f"bn{i}a")(
                SNConv(ch, 1, self.spectral_norm, self.dtype,
                       self.param_dtype, name=f"conv{i}")(x)))
            x = act(BatchStatNorm(name=f"bn{i}b")(
                SNConv(ch, 2, self.spectral_norm, self.dtype,
                       self.param_dtype, name=f"conv{i}s")(x)))

        x = x.reshape(x.shape[0], -1)
        x = act(nn.Dense(self.dense_features, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="fc0")(x))
        logits = nn.Dense(1, dtype=self.dtype, param_dtype=self.param_dtype,
                          name="fc1")(x)
        return logits.astype(jnp.float32)
