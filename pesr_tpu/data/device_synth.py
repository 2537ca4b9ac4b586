"""On-device procedural training corpus (round 5).

``--train_dataset synthetic_device`` renders HR training patches
INSIDE XLA, from the loop's PRNG stream — zero host->device batch
traffic.  Motivation, measured this round: the production loop's step
rate is bounded by the host->device link when batches cross it
(BASELINE.md "Production data path": a 1.8 MB uint8 batch per step =
a hard steps/s ceiling on thin links; on this session's dev tunnel the
same flagship recipe ran 25x slower in the first window of a cold
link).  A TPU-native framework can make the synthetic data path
link-immune: the renderer below is a few MFLOPs of VPU work per batch
(~0.1% of a flagship train step), runs fused under the same mesh
sharding as the model, and leaves the interconnect free for
collectives.  The host pipeline (PairedImageFolder/native sampler/
Prefetcher) remains the path for real on-disk corpora.

Content matches the procedural family of ``SyntheticImages``
(datasets.py): a smooth low-frequency base plus Gaussian-windowed
oriented gratings, soft checkerboards, glyph-like strokes, and
windowed step edges.  Feature frequencies concentrate in a
scale-derived band that sits BELOW the LR Nyquist of the trained
scale (0.175/scale .. 0.48/scale cycles/px; cf. the hand-tuned
``hard_x4`` band 0.044-0.12 at scale 4), so the content is
*recoverable* by SR at that scale — this corpus exists to train/bench,
not to be a negative control.  Unlike the host corpus there is no
2x-supersample + area-downsample pass: every feature is drawn with a
soft (antialiased) profile directly, the same trade
``benchmarks/make_div2k_corpus.py`` ships for the disk corpus.

Determinism: the batch is a pure function of the PRNG key (plus static
shape/config), so training streams inherit the loop's seed/resume
semantics (loop.py folds ``start_step`` into the stream) and the
multi-host contract for free: every process traces the same function
with the same key, per-sample keys derive from the GLOBAL batch index,
and ``out_shardings=batch_sharding(mesh)`` makes each device render
exactly its local samples — content is index-determined, never
process-determined, so DP shards are distinct by construction.

Feature counts are static (vectorized over a feature axis, ``vmap``
over the batch); everything is float32 VPU work with static shapes.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def band_for_scale(scale: int) -> Tuple[float, float]:
    """Feature-frequency band in cycles/px of the HR grid: inside
    (0, LR-Nyquist = 0.5/scale), with margin at both ends."""
    return 0.175 / scale, 0.48 / scale


def _u(key, lo, hi, shape=()):
    return jax.random.uniform(key, shape, jnp.float32, lo, hi)


def _grid(hp: int):
    y = jnp.arange(hp, dtype=jnp.float32)[:, None]
    x = jnp.arange(hp, dtype=jnp.float32)[None, :]
    return y, x


def _render_one(key: jax.Array, hp: int, f_lo: float, f_hi: float
                ) -> jnp.ndarray:
    """One [hp, hp, 3] HR patch in uint8. Static: hp and the band."""
    y, x = _grid(hp)
    ks = jax.random.split(key, 6)

    # --- smooth base: 3 full-patch cosine gratings (low frequency) ---
    kb = jax.random.split(ks[0], 5)
    n_base = 3
    fb = _u(kb[0], 0.5 / hp, 4.8 / hp, (n_base, 2))       # cyc/px, per axis
    phb = _u(kb[1], 0.0, 2.0 * jnp.pi, (n_base,))
    ab = _u(kb[2], 0.05, 0.3, (n_base,))
    cb = _u(kb[3], 0.3, 1.0, (n_base, 3))
    arg = 2.0 * jnp.pi * (fb[:, 0, None, None] * y
                          + fb[:, 1, None, None] * x) + phb[:, None, None]
    base = jnp.einsum("fhw,f,fc->hwc", jnp.cos(arg), ab, cb)

    # --- windowed oriented gratings in the band ---
    kg = jax.random.split(ks[1], 7)
    n_g = 6
    f = _u(kg[0], f_lo, f_hi, (n_g,))
    th = _u(kg[1], 0.0, jnp.pi, (n_g,))
    cyx = _u(kg[2], 0.05 * hp, 0.95 * hp, (n_g, 2))
    sig = _u(kg[3], 0.08 * hp, 0.25 * hp, (n_g,))
    ph = _u(kg[4], 0.0, 2.0 * jnp.pi, (n_g,))
    ag = _u(kg[5], 0.25, 0.5, (n_g,))
    cg = _u(kg[6], 0.5, 1.0, (n_g, 3))
    ly = y - cyx[:, 0, None, None]
    lx = x - cyx[:, 1, None, None]
    win = jnp.exp(-(ly * ly + lx * lx)
                  / (2.0 * sig[:, None, None] ** 2))
    carrier = jnp.cos(2.0 * jnp.pi * f[:, None, None]
                      * (jnp.cos(th)[:, None, None] * ly
                         + jnp.sin(th)[:, None, None] * lx)
                      + ph[:, None, None])
    grat = jnp.einsum("fhw,f,fc->hwc", win * carrier, ag, cg)

    # --- soft checkerboards: cosine product at per-axis frequency
    # f/sqrt(2), so the DIAGONAL component (radial sqrt(2)*f_axis = f)
    # lands in the band — a pure-tone board, band-limited by
    # construction (the host corpus squares its boards and relies on
    # supersample+area-downsample antialiasing instead). ---
    kc = jax.random.split(ks[2], 6)
    n_c = 2
    fc = _u(kc[0], f_lo, f_hi, (n_c,)) / jnp.sqrt(2.0)
    offs = _u(kc[1], 0.0, hp, (n_c, 2))
    ctr = _u(kc[2], 0.2 * hp, 0.8 * hp, (n_c, 2))
    half = _u(kc[3], 0.15 * hp, 0.35 * hp, (n_c,))
    ac = _u(kc[4], 0.3, 0.6, (n_c,))
    cc = _u(kc[5], 0.5, 1.0, (n_c, 3))
    by = jnp.cos(2.0 * jnp.pi * fc[:, None, None]
                 * (y - offs[:, 0, None, None]))
    bx = jnp.cos(2.0 * jnp.pi * fc[:, None, None]
                 * (x - offs[:, 1, None, None]))
    # soft rectangular window around the board's center
    wy = jax.nn.sigmoid((half[:, None, None]
                         - jnp.abs(y - ctr[:, 0, None, None])) / 3.0)
    wx = jax.nn.sigmoid((half[:, None, None]
                         - jnp.abs(x - ctr[:, 1, None, None])) / 3.0)
    board = jnp.einsum("fhw,f,fc->hwc", by * bx * wy * wx, ac, cc)

    # --- glyph-like strokes: GAUSSIAN ridge along a segment.  The
    # cross-profile exp(-d^2/(2*sig^2)) with sig = thick/2 >= 0.25/f_hi
    # keeps the ridge spectrum essentially inside the band (a clipped
    # 1-px ramp, the host profile, leaks far above Nyquist without the
    # host corpus's supersampled render). ---
    kst = jax.random.split(ks[3], 5)
    n_s = 4
    p0 = _u(kst[0], 0.0, hp, (n_s, 2))
    ang = _u(kst[1], 0.0, jnp.pi, (n_s,))
    ln = _u(kst[2], 0.15 * hp, 0.7 * hp, (n_s,))
    thick = _u(kst[3], 0.5 / f_hi, 0.5 / f_lo, (n_s,))
    a_s = _u(kst[4], -0.9, 0.9, (n_s,))
    dyx = jnp.stack([jnp.sin(ang) * ln, jnp.cos(ang) * ln], -1)
    den = jnp.sum(dyx * dyx, -1) + 1e-9
    ry = y - p0[:, 0, None, None]
    rx = x - p0[:, 1, None, None]
    tt = jnp.clip((ry * dyx[:, 0, None, None]
                   + rx * dyx[:, 1, None, None]) / den[:, None, None],
                  0.0, 1.0)
    dist = jnp.hypot(ry - tt * dyx[:, 0, None, None],
                     rx - tt * dyx[:, 1, None, None])
    sig_s = thick[:, None, None] / 2.0
    smask = jnp.exp(-(dist * dist) / (2.0 * sig_s * sig_s))
    strokes = jnp.einsum("fhw,f->hw", smask, a_s)[:, :, None]

    # --- windowed step edges: soft half-plane inside a soft circle,
    # both transitions ~1/(2*f_hi) px wide (band-limited ramps). ---
    ke = jax.random.split(ks[4], 4)
    n_e = 2
    w_e = 0.5 / f_hi
    ec = _u(ke[0], 0.0, hp, (n_e, 2))
    rad = _u(ke[1], 0.1 * hp, 0.3 * hp, (n_e,))
    eth = _u(ke[2], 0.0, jnp.pi, (n_e,))
    ae = _u(ke[3], -0.5, 0.5, (n_e,))
    ey = y - ec[:, 0, None, None]
    ex = x - ec[:, 1, None, None]
    d = jnp.sqrt(ey * ey + ex * ex)
    inside = jax.nn.sigmoid((rad[:, None, None] - d) / (w_e * 0.5))
    sd = jnp.sin(eth)[:, None, None] * ey + jnp.cos(eth)[:, None, None] * ex
    edges = jnp.einsum("fhw,f->hw",
                       inside * jnp.clip(sd / w_e + 0.5, 0.0, 1.0),
                       ae)[:, :, None]

    img = base + grat + board + strokes + edges
    lo = jnp.min(img)
    img = (img - lo) / jnp.maximum(jnp.max(img) - lo, 1e-9)
    # uint8 ground truth, like every other corpus (round-half-up).
    return jnp.clip(jnp.floor(img * 255.0 + 0.5), 0.0, 255.0
                    ).astype(jnp.uint8)


def render_hr_batch(key: jax.Array, batch: int, hp: int, scale: int
                    ) -> jnp.ndarray:
    """[batch, hp, hp, 3] uint8 HR patches; per-sample keys derive from
    the global batch index (fold_in), so sharding the batch axis gives
    each device distinct, index-determined samples."""
    f_lo, f_hi = band_for_scale(scale)
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
        jnp.arange(batch))
    return jax.vmap(
        functools.partial(_render_one, hp=hp, f_lo=f_lo, f_hi=f_hi)
    )(keys)


def make_device_renderer(mesh, opts):
    """Jitted renderer for the training loop: key -> sharded HR uint8
    batch, out-sharded on the mesh's data axis (the same placement
    ``shard_batch`` gives host batches)."""
    from pesr_tpu.parallel.mesh import batch_sharding

    hp = opts.patch_size * opts.scale
    fn = functools.partial(render_hr_batch, batch=opts.batch_size,
                           hp=hp, scale=opts.scale)
    return jax.jit(fn, out_shardings=batch_sharding(mesh))


class DeviceSyntheticStream:
    """Drop-in for ``make_train_iterator``'s iterator in
    ``synthetic_device`` mode: ``next()`` yields ``(None, hr_batch)``
    where ``hr_batch`` is a DEVICE uint8 array already sharded on the
    mesh's data axis (``shard_batch`` passes it through untouched), so
    the training loop's data plumbing is unchanged and zero batch bytes
    cross the host->device link.

    Seeding mirrors the host stream contract (datasets.py
    ``make_train_iterator``): ``start_step`` folds into the key so a
    ``--resume`` continues on fresh content.  Unlike host streams the
    key is deliberately IDENTICAL across processes — samples are
    determined by global batch index inside the jit (fold_in), and the
    out-sharding hands each device its own index range, so per-process
    seed skew would be wrong here, not required.
    """

    def __init__(self, mesh, opts, start_step: int = 0) -> None:
        self._fn = make_device_renderer(mesh, opts)
        key = jax.random.key(opts.seed)
        if start_step:
            key = jax.random.fold_in(key, start_step)
        self._key = key

    def __iter__(self):
        return self

    def __next__(self):
        self._key, k = jax.random.split(self._key)
        return None, self._fn(k)
