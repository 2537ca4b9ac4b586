#!/usr/bin/env python
"""Pretrain a VGG19-trunk perceptual anchor on the synthetic corpus
(round-2 verdict #5).

ImageNet VGG19 weights do not exist on this machine (zero egress), so
PESR's config-3 perceptual loss had only a random-feature stand-in.
This script trains the SAME flax VGG19 trunk the loss consumes
(models/vgg.py) as a *denoising autoencoder* on synthetic HR patches:
the encoder (trunk up to --layer) sees clean, noised, or
bicubic-degraded patches and a light pixel-shuffle decoder must
reconstruct the CLEAN patch from the features.  Degradation-robust
reconstruction forces the features to encode exactly what a perceptual
loss needs — texture/sharpness structure that separates clean from
degraded — while staying 100% within the ``--vgg_weights`` contract:

    python benchmarks/pretrain_vgg.py --out demo/vgg_synthetic
    python train.py --phase train --vgg_weights demo/vgg_synthetic \
        --vgg_layer 22 ...

The artifact is the orbax payload ``{"vgg": {"params": ...}}`` that
``pesr_tpu.convert.load_vgg_weights`` already loads (convert.py:276).
Default --layer 22 (SRGAN's low-level VGG22 convention): the trunk
prefix is ~0.3 M params, small enough to commit as a demo artifact.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default=os.path.join(REPO, "demo",
                                                 "vgg_synthetic"))
    p.add_argument("--layer", default="22")
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--patch", type=int, default=96)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true",
                   help="run on CPU (tests); default acquires the TPU")
    args = p.parse_args()

    if args.cpu:
        from pesr_tpu.parallel import force_cpu_devices
        force_cpu_devices(1)
    else:
        from tpu_lease import acquire_tpu
        acquire_tpu()

    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from pesr_tpu.data.datasets import PatchIterator, SyntheticImages
    from pesr_tpu.models.vgg import VGG19Features
    from pesr_tpu.ops.pixel_shuffle import pixel_shuffle
    from pesr_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    stage = int(args.layer[0])
    up = 2 ** (stage - 1)  # feature stride at a pre-pool layer

    class Decoder(nn.Module):
        """Features -> clean RGB in [-1,1]: one mixing conv + a
        pixel-shuffle projection back to input resolution."""

        @nn.compact
        def __call__(self, f):
            f = nn.relu(nn.Conv(128, (3, 3), padding="SAME")(f))
            f = nn.Conv(3 * up * up, (3, 3), padding="SAME")(f)
            return pixel_shuffle(f, up) if up > 1 else f

    enc = VGG19Features(layer=args.layer, dtype=jnp.float32)
    dec = Decoder()

    rng = jax.random.key(args.seed)
    rng, ek, dk = jax.random.split(rng, 3)
    x0 = jnp.zeros((1, args.patch, args.patch, 3), jnp.float32)
    e_params = enc.init(ek, x0)["params"]
    d_params = dec.init(dk, enc.apply({"params": e_params}, x0))["params"]

    tx = optax.adam(args.lr)
    params = {"enc": e_params, "dec": d_params}
    opt_state = tx.init(params)

    blur_k = jnp.full((3, 3, 1, 1), 1.0 / 9.0, jnp.float32)

    def degrade(key, clean):
        """Per-batch random degradation: clean / additive noise /
        2x box-blur (depthwise) — all shapes static."""
        k1, k2 = jax.random.split(key)
        mode = jax.random.randint(k1, (), 0, 3)
        noise = clean + 0.1 * jax.random.normal(k2, clean.shape)
        blurred = jax.lax.conv_general_dilated(
            clean, jnp.tile(blur_k, (1, 1, 1, 3)), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=3)
        return jax.lax.switch(mode, [lambda: clean, lambda: noise,
                                     lambda: blurred])

    @jax.jit
    def step(params, opt_state, key, hr_u8):
        clean = hr_u8.astype(jnp.float32) / 127.5 - 1.0
        x = degrade(key, clean)

        def loss_fn(p):
            feats = enc.apply({"params": p["enc"]}, x)
            recon = dec.apply({"params": p["dec"]}, feats)
            return jnp.mean(jnp.abs(recon - clean))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    src = SyntheticImages(num_images=32, seed=args.seed)
    # PatchIterator emits HR patches; scale=1 keeps LR==HR unused.
    it = iter(PatchIterator(src, args.patch, 1, args.batch,
                            seed=args.seed))

    t0 = time.time()
    for i in range(args.steps):
        _, hr = next(it)
        rng, key = jax.random.split(rng)
        params, opt_state, loss = step(params, opt_state, key,
                                       jnp.asarray(hr))
        if (i + 1) % 200 == 0 or i == 0:
            print(f"[vgg] step {i + 1}/{args.steps} "
                  f"l1={float(loss):.4f} "
                  f"({(i + 1) / (time.time() - t0):.1f} steps/s)",
                  flush=True)

    import orbax.checkpoint as ocp
    payload = {"vgg": {"params": jax.device_get(params["enc"])}}
    path = os.path.abspath(args.out)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)
    n = sum(x.size for x in jax.tree_util.tree_leaves(params["enc"]))
    print(f"[vgg] saved trunk ({n / 1e6:.2f} M params, layer "
          f"{args.layer}) -> {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
