"""Folded upsampler: collapse the generator's linear tail-to-RGB chain
into ONE conv + ONE depth-to-space (inference-only MXU optimization).

The reference generator ends with  conv0 -> PixelShuffle(2) [-> conv1 ->
PixelShuffle(2) ...] -> out-conv  with NO nonlinearity anywhere in that
chain (EDSR-lineage upsamplers are activation-free; SURVEY.md §3.4), so
the whole map from the 256-ch LR-resolution tensor to the RGB output is
a single linear operator.  Executed as written it is the worst part of
the program for the MXU:

  * the out-conv runs at HRxHR resolution with N=3 output channels —
    3/128 lane utilization, ~10% of wall-clock for ~0.2% of FLOPs;
  * each stage-k conv runs at 2^k x LR resolution with a full 256->1024
    matmul, paying resolution-scaled FLOPs for a linear reshuffle.

Folding composes the chain into one conv  [S, S, C, 3*s^2]  at LR
resolution followed by a single pixel_shuffle(s): for the flagship x4
model this cuts total MXU work ~22% and removes the lane-starved stage
entirely (see bench history).

Exactness: the composite is mathematically identical on the interior;
only pixels within R = (kernel radius) of a zero-padded border differ,
because the original chain zero-pads its INTERMEDIATE activations at
the border while the folded conv zero-pads only its input.  R is at
most ``num_stages + 1`` LR pixels; the apply function advertises it as
a ``min_halo`` attribute and the tiling engines (ops/tiling.py)
replicate-pad + crop at least that much context on EVERY border —
tile seams AND outer image borders — so the production path computes
every emitted pixel with full interior semantics.  Whole-image mode
(--tile_size 0) keeps the original chain for bit-level reference
parity.

The composite kernel is derived numerically by impulse probing the
original chain in float32/HIGHEST — immune to off-by-one convention
bugs and verified against the reference apply in tests/test_fold.py.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pesr_tpu.ops.pixel_shuffle import (fold_min_halo, pixel_shuffle,
                                        upsample_stages)


def _chain_apply(up_params: Dict[str, Any], out_params: Dict[str, Any],
                 stages: Tuple[int, ...], x: jnp.ndarray) -> jnp.ndarray:
    """The original linear chain (f32, HIGHEST precision): per-stage
    [conv3x3 SAME, pixel_shuffle(f)] then the 3x3 SAME out-conv."""
    hi = jax.lax.Precision.HIGHEST
    y = x.astype(jnp.float32)
    for i, f in enumerate(stages):
        p = up_params[f"conv{i}"]
        y = jax.lax.conv_general_dilated(
            y, jnp.asarray(p["kernel"], jnp.float32), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=hi)
        y = y + jnp.asarray(p["bias"], jnp.float32)
        y = pixel_shuffle(y, f)
    y = jax.lax.conv_general_dilated(
        y, jnp.asarray(out_params["kernel"], jnp.float32), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=hi)
    return y + jnp.asarray(out_params["bias"], jnp.float32)


def fold_upsampler(params: Dict[str, Any], scale: int
                   ) -> Tuple[np.ndarray, np.ndarray, Tuple[int, int]]:
    """Fold ``params["upsampler"] + params["out"]`` into one conv.

    Returns ``(kernel [S, S, C, 3*s^2] f32, bias [3*s^2] f32,
    (pad_lo, pad_hi))`` such that

        y = conv(x, kernel, padding=((pad_lo, pad_hi),)*2)
        out = pixel_shuffle(y, scale)

    reproduces the original chain exactly on the interior.  The kernel
    support is trimmed to its (possibly asymmetric — pixel-shuffle
    phases are not center-symmetric) nonzero bounding box.
    """
    stages = upsample_stages(scale)  # (2, 2) for x4, (3,) for x3, ...
    num_stages = len(stages)
    s = scale
    up = params.get("upsampler", {})
    out = params["out"]
    c = int(np.asarray(out["kernel"]).shape[2]) if num_stages == 0 else \
        int(np.asarray(up["conv0"]["kernel"]).shape[2])
    img_ch = int(np.asarray(out["kernel"]).shape[3])

    # Probe geometry: centered kernel of radius R.  All C channel
    # impulses live in ONE image on a spacing grid wide enough that
    # their responses cannot overlap (the chain is linear, responses
    # have radius <= r) — one batch-1 forward instead of a batch-C one,
    # which is both ~C times cheaper and avoids a TPU-compiler failure
    # observed on the batch-256 x8 probe shape.
    r = num_stages + 1
    size = 2 * r + 1
    cols = int(np.ceil(np.sqrt(c)))
    spacing = 2 * r + 2
    m0 = r + 2
    p_in = 2 * m0 + cols * spacing

    chain = jax.jit(functools.partial(_chain_apply, up, out, stages))

    # Bias field = response to zero input (constant on the interior per
    # phase; read at an impulse site).
    zero = jnp.zeros((1, p_in, p_in, c), jnp.float32)
    bias_field = np.asarray(chain(zero))[0]

    ci = np.arange(c)
    my = m0 + (ci // cols) * spacing
    mx = m0 + (ci % cols) * spacing
    impulse = jnp.zeros((1, p_in, p_in, c), jnp.float32)
    impulse = impulse.at[0, my, mx, ci].set(1.0)
    resp = np.asarray(chain(impulse))[0] - bias_field  # [Ps*s, Ps*s, 3]

    # Read out the centered-conv kernel:
    #   y[p] = sum_u K[u] x[p + u - r]  =>  K[u] = y[m + r - u] | impulse@m
    # in pixel_shuffle(s) channel order ch = col*s^2 + i*s + j, with
    # y48[p, q, ch] == chain_out[p*s + i, q*s + j, col].
    kernel = np.zeros((size, size, c, img_ch * s * s), np.float32)
    bias = np.zeros((img_ch * s * s,), np.float32)
    u = np.arange(size)
    for i in range(s):
        for j in range(s):
            for col in range(img_ch):
                ch = col * s * s + i * s + j
                pu = (my[:, None] + r - u[None, :]) * s + i  # [c, size]
                qv = (mx[:, None] + r - u[None, :]) * s + j
                kernel[:, :, :, ch] = resp[
                    pu[:, :, None], qv[:, None, :], col].transpose(1, 2, 0)
                bias[ch] = bias_field[my[0] * s + i, mx[0] * s + j, col]

    # Trim exact-zero fringes (support is asymmetric across phases).
    nz = np.argwhere(np.any(kernel != 0.0, axis=(2, 3)))
    u0, v0 = nz.min(axis=0)
    u1, v1 = nz.max(axis=0)
    lo, hi = int(min(u0, v0)), int(max(u1, v1))  # keep square: conv is
    kernel = kernel[lo:hi + 1, lo:hi + 1]        # cheap, bookkeeping isn't
    pad_lo = r - lo
    pad_hi = hi - r
    return kernel, bias, (pad_lo, pad_hi)


def fold_generator_params(params: Dict[str, Any], scale: int
                          ) -> Dict[str, Any]:
    """Params tree for :func:`make_folded_apply`: head/body/tail are
    shared with models.Generator; the upsampler+out chain becomes one
    ``upfold`` conv."""
    kernel, bias, pads = fold_upsampler(params, scale)
    return {
        "head": params["head"],
        "body": params["body"],
        "tail": params["tail"],
        "upfold": {"kernel": jnp.asarray(kernel),
                   "bias": jnp.asarray(bias)},
        # static metadata rides outside the jit-traced leaves
        "_pads": pads,
    }


def make_folded_apply(scale: int, res_scale: float = 0.1,
                      dtype=jnp.bfloat16,
                      pads: Tuple[int, int] = None) -> Callable:
    """Build ``apply(variables, x)`` interchangeable with
    models.Generator.apply for the tiling engines, executing the folded
    upsampler.  ``variables = {"params": fold_generator_params(...)}``
    (the ``_pads`` entry is popped into the closure by
    :func:`folded_inference`; pass ``pads`` explicitly when calling this
    directly)."""
    if pads is None:
        raise ValueError(
            "make_folded_apply requires the fold's (pad_lo, pad_hi) — "
            "pop the '_pads' entry from fold_generator_params(...) and "
            "pass it, or use folded_inference() which does both")
    s = scale

    def _conv(x, p, padding):
        y = jax.lax.conv_general_dilated(
            x.astype(dtype), jnp.asarray(p["kernel"]).astype(dtype),
            (1, 1), padding, dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + jnp.asarray(p["bias"]).astype(dtype)

    def _trunk(variables: Any, x: jnp.ndarray) -> jnp.ndarray:
        p = variables["params"]
        x = x.astype(dtype)
        head = _conv(x, p["head"], "SAME")

        blk = p["body"]["block"]

        def body_fn(carry, per_block):
            c1, c2 = per_block
            y = jnp.maximum(_conv(carry, c1, "SAME"), 0.0)
            y = _conv(y, c2, "SAME")
            return carry + jnp.asarray(res_scale, dtype) * y, None

        y, _ = jax.lax.scan(body_fn, head, (blk["conv1"], blk["conv2"]))
        y = _conv(y, p["tail"], "SAME") + head

        return _conv(y, p["upfold"], (pads, pads))

    def apply(variables: Any, x: jnp.ndarray) -> jnp.ndarray:
        return pixel_shuffle(_trunk(variables, x), s).astype(jnp.float32)

    def apply_u8(variables: Any, x: jnp.ndarray) -> jnp.ndarray:
        # uint8 BEFORE the depth-to-space: denormalize_to_uint8 is
        # per-element, so it commutes with the PS layout shuffle
        # bitwise — and the shuffle is a strided HBM copy of the whole
        # HR tensor (the single largest non-conv cost in the x8
        # profile: ~13% of pass time at bf16), which now moves 1-byte
        # pixels instead of 2/4-byte floats.  The tiling engines pick
        # this variant for their uint8 paths (ops/tiling.py).
        from pesr_tpu.data.augment import denormalize_to_uint8
        return pixel_shuffle(denormalize_to_uint8(_trunk(variables, x)), s)

    # Correctness floor for the tiling engines (ops/tiling.py
    # required_min_halo): the fold is exact only R = num_stages+1 LR px
    # away from a zero-padded border, so every border — including outer
    # image borders covered by a single tile — must carry at least this
    # much replicate-padded context, cropped after the forward.
    apply.min_halo = apply_u8.min_halo = fold_min_halo(scale)
    apply.uint8_variant = apply_u8
    return apply


def folded_inference(params: Dict[str, Any], scale: int,
                     res_scale: float = 0.1, dtype=jnp.bfloat16
                     ) -> Tuple[Callable, Dict[str, Any]]:
    """One-call setup: fold ``params`` (a models.Generator tree) and
    return ``(apply_fn, variables)`` ready for the tiling engines."""
    folded = fold_generator_params(params, scale)
    pads = folded.pop("_pads")
    cast = jax.tree_util.tree_map(lambda a: jnp.asarray(a, dtype), folded)
    return (make_folded_apply(scale, res_scale, dtype, pads=pads),
            {"params": cast})
