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


def analytic_fold_upsampler(up_params: Dict[str, Any],
                            out_params: Dict[str, Any], scale: int,
                            precision=jax.lax.Precision.HIGHEST
                            ) -> Tuple[jnp.ndarray, jnp.ndarray,
                                       Tuple[int, int]]:
    """Differentiable (pure-jnp) fold of the upsampler+out chain.

    Same composite as :func:`fold_upsampler` (verified equal in
    tests/test_fold.py) but built by ANALYTIC kernel composition instead
    of impulse probing, so it is cheap (~45 GFLOP of weight-space
    einsums at flagship x4 vs ~0.7 TFLOP of probe forwards) and
    **differentiable** — gradients flow through the fold back to the
    canonical ``upsampler``/``out`` parameters.  This is what makes the
    folded upsampler usable in TRAINING (``--fold_train``): the train
    state keeps the reference parameter tree (checkpoints unchanged)
    while the compiled step runs the single folded conv at LR
    resolution, skipping the resolution-scaled stage convs, the
    pixel-shuffle layout copies, and the 3-lane out conv (~27% of the
    flagship pretrain step, profiled on-chip 2026-08-18).

    Composition rule: maintain ``(G, F)`` where the chain so far is
    ``pixel_shuffle(conv(x, G), F)`` with ``G`` centered (radius rG,
    zero padding) and pixel-shuffle channel order ``m*F² + i*F + j``
    (ops/pixel_shuffle contract).  Absorbing the next SAME conv ``k``
    (radius ρ, at resolution F·LR) uses, per output phase ``i`` and tap
    ``di``:  ``i + di = F·a + i'`` (``a`` the LR shift, ``i'`` the
    source phase), i.e.

        H[rH+a+u, rH+b+v, c, (n,i,j)]
            += k[ρ+di, ρ+dj, m, n] · G[rG+u, rG+v, c, (m,i',j')]

    then a following pixel_shuffle(f) re-maps ``n = m·f² + i₂·f + j₂``
    to combined phase ``(f·i₁+i₂, f·j₁+j₂)`` at factor ``F·f`` (a pure
    channel permutation).  Biases compose by running the original chain
    on a zero input (linear => the bias field) at a tiny interior-safe
    size and reading one LR pixel's s² phases — also differentiable.

    Returns ``(kernel [h,h,C,3·s²] f32, bias [3·s²] f32, (rH, rH))``
    with the full symmetric support (no zero-fringe trim — the trim is
    data-dependent, which a traced/differentiable path cannot do; the
    extra taps are multiply-by-zero work, <1% of a training step).
    """
    stages = upsample_stages(scale)
    if not stages:
        k = jnp.asarray(out_params["kernel"], jnp.float32)
        b = jnp.asarray(out_params["bias"], jnp.float32)
        r = (k.shape[0] - 1) // 2
        return k, b, (r, r)

    def absorb(G: jnp.ndarray, F: int, k: jnp.ndarray
               ) -> Tuple[jnp.ndarray, int]:
        """Absorb SAME conv ``k`` [κ,κ,M,N] at resolution F·LR into
        centered composite ``G`` [g,g,C,F²·M] -> H [h,h,C,F²·N]."""
        g, _, c, fm = G.shape
        kk, _, m, n = k.shape
        assert fm == F * F * m, (fm, F, m)
        rg, rho = (g - 1) // 2, (kk - 1) // 2
        # LR shift range: a = floor((i + di) / F), i in [0,F), di in
        # [-rho, rho].
        a_min = -((rho + F - 1) // F)         # floor(-rho / F)
        a_max = (F - 1 + rho) // F
        ra = max(-a_min, a_max)
        rh = rg + ra
        h = 2 * rh + 1
        # G by source phase: [g, g, C, M, F(i'), F(j')]
        Gp = G.reshape(g, g, c, m, F, F)
        # Per output phase: sum the κ² shifted einsum terms as padded
        # adds (fuses into one loop fusion; a scatter-add formulation
        # would rewrite the whole H buffer per term), then stack the
        # F² phases into the trailing layout axes.
        rows = []
        for i in range(F):
            row = []
            for j in range(F):
                acc = None
                for di in range(-rho, rho + 1):
                    a, ip = divmod(i + di, F)
                    for dj in range(-rho, rho + 1):
                        b_, jp = divmod(j + dj, F)
                        # HIGHEST by default: the composite kernel is a
                        # parameter-space object reused across the whole
                        # batch — fold it in full f32 (default precision
                        # rounds the contraction through bf16 on TPU,
                        # ~0.4% relative error measured).  bf16 TRAINING
                        # passes precision=DEFAULT instead: its forward
                        # already rounds every conv input to bf16, so
                        # HIGHEST here buys nothing but ~12 ms/step of
                        # 6-pass einsum fwd+VJP (profiled on-chip).
                        term = jnp.einsum(
                            "uvcm,mn->uvcn", Gp[:, :, :, :, ip, jp],
                            k[rho + di, rho + dj], precision=precision)
                        u0 = rh - rg + a
                        v0 = rh - rg + b_
                        padded = jnp.pad(
                            term, ((u0, h - g - u0), (v0, h - g - v0),
                                   (0, 0), (0, 0)))
                        acc = padded if acc is None else acc + padded
                row.append(acc)
            rows.append(jnp.stack(row, axis=-1))          # [h,h,c,n,F(j)]
        H = jnp.stack(rows, axis=-2)                      # [h,h,c,n,F,F]
        return H.reshape(h, h, c, F * F * n), F

    def ps_remap(H: jnp.ndarray, F: int, f: int) -> Tuple[jnp.ndarray, int]:
        """Channel layout (n·F²+i₁·F+j₁ with n = m·f²+i₂·f+j₂) ->
        m·(Ff)² + (f·i₁+i₂)·(Ff) + (f·j₁+j₂)."""
        h, _, c, _ = H.shape
        m = H.shape[3] // (F * F * f * f)
        x = H.reshape(h, h, c, m, f, f, F, F)  # m, i2, j2, i1, j1
        x = x.transpose(0, 1, 2, 3, 6, 4, 7, 5)  # m, i1, i2, j1, j2
        return x.reshape(h, h, c, m * (F * f) ** 2), F * f

    # Stage 0 conv feeds the first pixel_shuffle directly: its output
    # channel order IS the PS layout.
    G = jnp.asarray(up_params["conv0"]["kernel"], jnp.float32)
    F = stages[0]
    for t, f in enumerate(stages[1:], start=1):
        k_t = jnp.asarray(up_params[f"conv{t}"]["kernel"], jnp.float32)
        G, F = absorb(G, F, k_t)
        G, F = ps_remap(G, F, f)
    G, F = absorb(G, F, jnp.asarray(out_params["kernel"], jnp.float32))
    assert F == scale
    rh = (G.shape[0] - 1) // 2

    # Static trim to the TRUE support: a conv of radius ρ at resolution
    # F·LR moves the LR receptive field by at most ρ/F, so the composite
    # radius is ceil(Σ ρ_t / F_t) — exact rational arithmetic, and the
    # equality-vs-probe tests in tests/test_fold.py would fail loudly if
    # this ever under-counted.  (absorb's per-stage bound accumulates
    # whole-pixel shifts and overshoots: 7x7/9x9 of mostly-zero taps at
    # x4/x8 where the true support is 5x5 at every scale here.)
    from fractions import Fraction

    def _radius(p):
        return (int(p["kernel"].shape[0]) - 1) // 2

    r_frac = Fraction(_radius(up_params["conv0"]))  # conv0 runs at LR
    ft = stages[0]
    for t, f in enumerate(stages[1:], start=1):
        r_frac += Fraction(_radius(up_params[f"conv{t}"]), ft)
        ft *= f
    r_frac += Fraction(_radius(out_params), ft)     # out conv at scale·LR
    rt = int(-(-r_frac.numerator // r_frac.denominator))  # ceil
    if rt < rh:
        G = G[rh - rt:rh + rt + 1, rh - rt:rh + rt + 1]
        rh = rt

    # Bias: the chain is affine, so bias = chain(0) — constant per
    # final-PS phase on the interior.  Evaluate on a zero input just
    # big enough that the center LR pixel is interior, and read its s²
    # phases (differentiable; ~nothing FLOPs).
    p_in = 2 * (rh + 1) + 1
    zero = jnp.zeros((1, p_in, p_in, G.shape[2]), jnp.float32)
    field = _chain_apply(up_params, out_params, stages, zero)[0]
    cy = cx = (p_in // 2) * scale
    img_ch = int(out_params["kernel"].shape[3])
    # bias[col·s² + i·s + j] = field[cy+i, cx+j, col]
    patch = field[cy:cy + scale, cx:cx + scale, :]  # [s, s, col]
    bias = patch.transpose(2, 0, 1).reshape(img_ch * scale * scale)
    return G, bias, (rh, rh)


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


def _bias_conv(x: jnp.ndarray, p: Dict[str, Any], padding,
               dtype) -> jnp.ndarray:
    """conv + bias in ``dtype`` (NHWC/HWIO), shared by every folded
    apply in this module."""
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), jnp.asarray(p["kernel"]).astype(dtype),
        (1, 1), padding, dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + jnp.asarray(p["bias"]).astype(dtype)


def _make_trunk(res_scale: float, dtype, relu_fn=None,
                remat: bool = False, unroll=1) -> Callable:
    """The shared head -> scanned residual body -> tail+skip trunk over a
    CANONICAL-layout params tree (stacked ``body/block`` weights), used
    by both the inference fold (make_folded_apply) and the training fold
    (make_fold_train_apply) so the two cannot drift.  ``relu_fn``
    defaults to plain max(x, 0); training passes the output-keyed-VJP
    variant.  Returns ``trunk(params, x) -> pre-upsampler tensor``."""
    if relu_fn is None:
        relu_fn = lambda v: jnp.maximum(v, 0.0)  # noqa: E731

    def trunk(p: Dict[str, Any], x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(dtype)
        head = _bias_conv(x, p["head"], "SAME", dtype)
        blk = p["body"]["block"]

        def body_fn(carry, per_block):
            c1, c2 = per_block
            y = relu_fn(_bias_conv(carry, c1, "SAME", dtype))
            y = _bias_conv(y, c2, "SAME", dtype)
            return carry + jnp.asarray(res_scale, dtype) * y, None

        fn = jax.checkpoint(body_fn) if remat else body_fn
        y, _ = jax.lax.scan(fn, head, (blk["conv1"], blk["conv2"]),
                            unroll=unroll)
        return _bias_conv(y, p["tail"], "SAME", dtype) + head

    return trunk


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
    run_trunk = _make_trunk(res_scale, dtype)

    def _trunk(variables: Any, x: jnp.ndarray) -> jnp.ndarray:
        p = variables["params"]
        y = run_trunk(p, x)
        return _bias_conv(y, p["upfold"], (pads, pads), dtype)

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


def make_fold_train_apply(scale: int, res_scale: float = 0.1,
                          dtype=jnp.bfloat16, remat: bool = False,
                          unroll: bool = False) -> Callable:
    """Trainable folded-upsampler forward (``--fold_train``).

    Signature-compatible with ``models.Generator.apply`` over the
    CANONICAL parameter tree (head/body/tail/upsampler/out) — train
    states, checkpoints, and the torch converter are untouched — but
    the compiled step derives the folded conv from the upsampler+out
    weights via :func:`analytic_fold_upsampler` (differentiable; the
    optimizer updates the canonical weights through the fold's VJP) and
    runs ONE small conv at LR resolution plus one depth-to-space.

    Why: profiled on-chip (flagship x4 pretrain step, 2026-08-18), the
    unfolded upsampler chain costs ~27% of the step — the stage convs
    pay resolution-scaled 256->1024 matmuls, the pixel-shuffle reshape
    materializes layout copies of the 2x/4x-resolution tensors in fwd
    AND bwd, and the 3-channel out conv runs at 3/128 lane utilization.
    The fold removes all three for ~0.05 ms of weight-space einsums.

    Semantics: identical to the reference forward on the patch
    INTERIOR; within ``fold_min_halo(scale)`` LR pixels of a patch
    border the folded conv zero-pads its input once where the original
    chain zero-pads each intermediate (same trade the inference fold
    makes, where the tiling engines hide it with replicate-padded
    halos).  Training patches are random interior crops, so the border
    band is a tiny, unbiased fraction of the loss — measured
    convergence matches the unfolded step (tests/test_fold.py) — but
    it is a semantic deviation from the reference recipe, so it stays
    OPT-IN.  Self-validation through the tiling engines is exact: the
    returned apply carries ``min_halo`` and the engines pad/crop it.
    """
    from pesr_tpu.models.generator import _relu_save_output
    s = scale
    if unroll:
        print("[fold_train] note: --unroll_body measured 2.6x SLOWER "
              "than the default scan when combined with --fold_train on "
              "v5e (16.7 -> 5.8 steps/s; XLA schedules the unrolled "
              "64-conv body poorly next to the fold einsums).  Honoring "
              "the flag, but prefer dropping it here.")

    # bf16 training folds at DEFAULT precision: the composite-kernel
    # rounding (~0.4% relative) is the same order as the bf16 rounding
    # every conv input in this forward already gets, and HIGHEST costs
    # ~12 ms/step of 6-pass einsums fwd+bwd (profiled).  f32 training
    # keeps the exact fold.
    fold_precision = (jax.lax.Precision.HIGHEST if dtype == jnp.float32
                      else jax.lax.Precision.DEFAULT)
    run_trunk = _make_trunk(res_scale, dtype, relu_fn=_relu_save_output,
                            remat=remat, unroll=True if unroll else 1)

    def apply(variables: Any, x: jnp.ndarray) -> jnp.ndarray:
        p = variables["params"]
        # scale 1 has no upsampler module — the "fold" is the out conv.
        kernel, bias, pads = analytic_fold_upsampler(
            p.get("upsampler", {}), p["out"], scale,
            precision=fold_precision)
        y = run_trunk(p, x)
        y = _bias_conv(y, {"kernel": kernel, "bias": bias}, (pads, pads),
                       dtype)
        return pixel_shuffle(y, s).astype(jnp.float32)

    # The loop's self-validation runs this apply through the tiling
    # engines — the fold band needs the same replicate-pad + crop floor
    # as the inference fold.
    apply.min_halo = fold_min_halo(scale)
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
