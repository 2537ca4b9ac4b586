"""torch -> flax checkpoint conversion (SURVEY.md §7.3; BASELINE.json:5
"matches the reference PyTorch checkpoints' outputs").

No reference checkpoints exist on this machine (SURVEY.md §0), so the
converter is built against the *structural* contract of an EDSR-style
generator rather than the reference's (unverifiable) parameter names:
PyTorch state_dicts preserve registration order, and for any EDSR-family
module that order is

    head conv, (block conv1, block conv2) x num_blocks, tail conv,
    upsampler conv x num_stages, output conv

so the converter maps tensors positionally, validating every shape
against the target flax tree.  This works for arbitrary naming schemes
(model.head.0.weight / head.weight / module.head...) as long as the
architecture matches; a mismatch dies loudly with both shape lists.

Layout conversions:
  * conv kernels: torch OIHW -> flax HWIO (transpose (2, 3, 1, 0));
  * the generator's per-block convs are stacked on a leading axis to
    match the nn.scan'd body (models/generator.py);
  * activations are NCHW in torch vs NHWC here — handled by kernel
    transposition alone; PixelShuffle channel order is preserved by
    pesr_tpu.ops.pixel_shuffle (see its docstring).

VGG-19: torchvision's ``vgg19().features`` registers exactly 16 convs in
trunk order, so the same positional mapping fills VGG19Features
(conv1_1 ... conv5_4) from any torch VGG19 checkpoint the user provides
(``--vgg_weights``).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from pesr_tpu.scales import upsample_stages


def _as_numpy(t: Any) -> np.ndarray:
    """torch.Tensor | ndarray -> float32 ndarray without importing torch
    at module scope (torch is an optional oracle dependency)."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _extract_pairs(state_dict: Dict[str, Any], ndim: int, what: str
                   ) -> List[Tuple[str, np.ndarray, np.ndarray]]:
    """(name, weight, bias) for every ``ndim``-D weight entry, in
    registration order — the single definition of the torch
    weight->sibling-bias matching rule (conv/norm/dense extractors all
    route here, so a convention fix lands once; review finding)."""
    pairs = []
    for key, val in state_dict.items():
        if not key.endswith("weight"):
            continue
        w = _as_numpy(val)
        if w.ndim != ndim:
            continue
        bkey = key[: -len("weight")] + "bias"
        if bkey not in state_dict:
            raise ValueError(f"{what} {key} has no matching bias {bkey}")
        pairs.append((key, w, _as_numpy(state_dict[bkey])))
    return pairs


def extract_conv_pairs(state_dict: Dict[str, Any]
                       ) -> List[Tuple[str, np.ndarray, np.ndarray]]:
    """(name, OIHW weight, bias) for every 4-D conv entry, in
    registration order.  Dense (2-D) weights are skipped here."""
    return _extract_pairs(state_dict, 4, "conv")


def _oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def convert_torch_generator(state_dict: Dict[str, Any], num_blocks: int,
                            scale: int) -> Dict[str, Any]:
    """Positionally map an EDSR-style torch state_dict onto the flax
    Generator param tree (models/generator.py naming)."""
    num_stages = len(upsample_stages(scale))
    convs = extract_conv_pairs(state_dict)
    expected = 1 + 2 * num_blocks + 1 + num_stages + 1
    if len(convs) != expected:
        raise ValueError(
            f"expected {expected} convs (head + 2x{num_blocks} body + tail"
            f" + {num_stages} upsample + out), found {len(convs)}: "
            f"{[c[0] for c in convs]}")

    i = 0

    def take():
        nonlocal i
        name, w, b = convs[i]
        i += 1
        return _oihw_to_hwio(w), b

    params: Dict[str, Any] = {}
    hw, hb = take()
    params["head"] = {"kernel": hw, "bias": hb}

    c1k, c1b, c2k, c2b = [], [], [], []
    for _ in range(num_blocks):
        k1, b1 = take()
        k2, b2 = take()
        c1k.append(k1)
        c1b.append(b1)
        c2k.append(k2)
        c2b.append(b2)
    params["body"] = {"block": {
        "conv1": {"kernel": np.stack(c1k), "bias": np.stack(c1b)},
        "conv2": {"kernel": np.stack(c2k), "bias": np.stack(c2b)},
    }}

    tw, tb = take()
    params["tail"] = {"kernel": tw, "bias": tb}

    up = {}
    for s in range(num_stages):
        uw, ub = take()
        up[f"conv{s}"] = {"kernel": uw, "bias": ub}
    params["upsampler"] = up

    ow, ob = take()
    params["out"] = {"kernel": ow, "bias": ob}
    return params


_VGG19_LAYERS: Sequence[str] = (
    "conv1_1", "conv1_2",
    "conv2_1", "conv2_2",
    "conv3_1", "conv3_2", "conv3_3", "conv3_4",
    "conv4_1", "conv4_2", "conv4_3", "conv4_4",
    "conv5_1", "conv5_2", "conv5_3", "conv5_4",
)


def convert_torch_vgg19(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Map a torch VGG19 checkpoint's 16 feature convs onto
    VGG19Features params (models/vgg.py naming)."""
    convs = extract_conv_pairs(state_dict)
    # Classifier weights are 2-D and already skipped; some checkpoints
    # prefix with "features." — order is what matters.  The count must
    # be EXACT: extra 4-D convs would silently shift the positional
    # mapping onto the wrong trunk layers (many VGG stages share shapes,
    # so template validation alone cannot catch it).
    if len(convs) != len(_VGG19_LAYERS):
        raise ValueError(
            f"need exactly {len(_VGG19_LAYERS)} 4-D convs for the VGG19 "
            f"trunk, found {len(convs)}: {[c[0] for c in convs]}")
    params: Dict[str, Any] = {}
    for name, (key, w, b) in zip(_VGG19_LAYERS, convs):
        params[name] = {"kernel": _oihw_to_hwio(w), "bias": b}
    return params


def _extract_1d_scale_bias(state_dict: Dict[str, Any]
                           ) -> List[Tuple[str, np.ndarray, np.ndarray]]:
    """(name, weight, bias) for 1-D weight entries in registration order
    — torch BatchNorm affine params.  running_mean/var/num_batches are
    intentionally dropped: the TPU discriminator normalizes with batch
    statistics only (models/discriminator.py BatchStatNorm) and the
    reference never runs D in eval mode, so running stats are dead."""
    return _extract_pairs(state_dict, 1, "norm")


def _extract_dense_pairs(state_dict: Dict[str, Any]
                         ) -> List[Tuple[str, np.ndarray, np.ndarray]]:
    """(name, [out,in] weight, bias) for 2-D weight entries in order."""
    return _extract_pairs(state_dict, 2, "dense")


def convert_torch_discriminator(
        state_dict: Dict[str, Any], hr_size: int,
        channel_schedule: Sequence[int] = (64, 128, 256, 512),
) -> Dict[str, Any]:
    """Positionally map an SRGAN-style torch discriminator state_dict
    onto the flax Discriminator tree (models/discriminator.py naming).

    Expected registration order (the SRGAN/PESR convention): 8 convs
    {conv stride1, conv stride2} x 4 channel stages, BatchNorm after
    every conv except the first (7), then dense(1024) + dense(1).

    ``hr_size`` is the training HR patch side the torch head was built
    for: the first dense layer's input flattens NCHW in torch but NHWC
    here, so its weight must be permuted with the known (C, H, W) =
    (512, hr_size/16, hr_size/16) feature-map geometry.
    """
    n_stages = len(channel_schedule)
    convs = extract_conv_pairs(state_dict)
    if len(convs) != 2 * n_stages:
        raise ValueError(
            f"expected {2 * n_stages} discriminator convs, found "
            f"{len(convs)}: {[c[0] for c in convs]}")
    bns = _extract_1d_scale_bias(state_dict)
    if len(bns) != 2 * n_stages - 1:
        raise ValueError(
            f"expected {2 * n_stages - 1} norm layers, found {len(bns)}: "
            f"{[b[0] for b in bns]}")
    dense = _extract_dense_pairs(state_dict)
    if len(dense) != 2:
        raise ValueError(f"expected 2 dense layers, found {len(dense)}: "
                         f"{[d[0] for d in dense]}")

    params: Dict[str, Any] = {}
    conv_names = ["conv0", "conv0s"]
    bn_names = ["bn0"]
    for i in range(1, n_stages):
        conv_names += [f"conv{i}", f"conv{i}s"]
        bn_names += [f"bn{i}a", f"bn{i}b"]
    for name, (key, w, b) in zip(conv_names, convs):
        params[name] = {"kernel": _oihw_to_hwio(w), "bias": b}
    for name, (key, w, b) in zip(bn_names, bns):
        params[name] = {"scale": w, "bias": b}

    # Dense head: torch flattens (C, H, W), flax flattens (H, W, C).
    c = channel_schedule[-1]
    hw = hr_size // (2 ** n_stages)
    (k0, w0, b0), (k1, w1, b1) = dense
    if w0.shape[1] != c * hw * hw:
        raise ValueError(
            f"dense {k0} expects flat dim {w0.shape[1]}, but hr_size="
            f"{hr_size} gives {c}x{hw}x{hw}={c * hw * hw}")
    w0 = (w0.reshape(w0.shape[0], c, hw, hw)
          .transpose(0, 2, 3, 1)
          .reshape(w0.shape[0], -1))
    params["fc0"] = {"kernel": w0.T, "bias": b0}
    params["fc1"] = {"kernel": w1.T, "bias": b1}
    return params


def _tree_shapes(tree: Any) -> Dict[str, Tuple[int, ...]]:
    import jax
    return {jax.tree_util.keystr(k): tuple(np.shape(v)) for k, v in
            jax.tree_util.tree_leaves_with_path(tree)}


def validate_against_template(template: Any, converted: Any,
                              what: str) -> None:
    exp, got = _tree_shapes(template), _tree_shapes(converted)
    bad = [f"  {k}: template {exp.get(k)} vs converted {got.get(k)}"
           for k in sorted(exp.keys() | got.keys())
           if exp.get(k) != got.get(k)]
    if bad:
        raise ValueError(f"converted {what} does not match the flax "
                         f"template:\n" + "\n".join(bad[:12]))


def load_torch_state_dict(path: str) -> Dict[str, Any]:
    """Load a .pth/.pt state_dict (handles common wrapper keys)."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=True)
    for key in ("state_dict", "model", "params", "generator"):
        if isinstance(obj, dict) and key in obj and isinstance(
                obj[key], dict):
            obj = obj[key]
    if not isinstance(obj, dict):
        raise ValueError(f"{path} does not contain a state_dict")
    return obj


def load_vgg_weights(path: str, template: Any) -> Any:
    """--vgg_weights entry point: torch VGG19 checkpoint -> flax params
    validated against the initialized template tree.

    The template holds only the trunk PREFIX up to the requested
    ``--vgg_layer`` (VGG19Features returns early, so later convs are
    never created); the torch checkpoint always carries all 16 convs.
    Extra converted layers are dropped — validating the full set against
    a truncated template made every non-"54" layer flag unusable.

    ``path`` may be the original torch ``.pth`` OR a directory written
    by ``python -m pesr_tpu.convert ... --kind vgg19`` (an orbax payload
    ``{"vgg": {"params": ...}}``) — the CLI artifact was previously a
    dead end no consumer could load (round-2 review)."""
    import os
    if os.path.isdir(path):
        from pesr_tpu.training.checkpoint import restore_payload
        converted = restore_payload(path)["vgg"]["params"]
    else:
        converted = convert_torch_vgg19(load_torch_state_dict(path))
    missing = set(template) - set(converted)
    if missing:
        raise ValueError(f"VGG19 checkpoint lacks layers required by "
                         f"the template: {sorted(missing)}")
    converted = {k: v for k, v in converted.items() if k in template}
    validate_against_template(template, converted, "VGG19")
    return converted


def load_generator_weights(path: str, template: Any, num_blocks: int,
                           scale: int) -> Any:
    """Reference-checkpoint entry point: torch PESR/EDSR generator
    checkpoint -> flax params validated against the template tree."""
    converted = convert_torch_generator(load_torch_state_dict(path),
                                        num_blocks, scale)
    validate_against_template(template, converted, "generator")
    return converted


def _hwio_to_oihw(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w, np.float32
                                           ).transpose(3, 2, 0, 1))


def export_torch_generator(params: Dict[str, Any],
                           scale: int) -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_torch_generator`: flax Generator params
    -> an EDSR-lineage torch-style state_dict (OIHW float32 ndarrays,
    registration order head / body / tail-conv / upsampler / out).

    Completes the checkpoint interchange (SURVEY.md §5.4): models
    trained here hand a ``.pth`` back to reference-ecosystem tooling,
    and the pair round-trips bitwise through our own importer (pinned
    in tests/test_convert.py).  Key names follow the EDSR ``Sequential``
    convention (``body.{i}.body.{0,2}``, ``tail.0.{2s}``); the importer
    side is positional, so order is the contract and names are
    cosmetic."""
    num_stages = len(upsample_stages(scale))
    sd: Dict[str, np.ndarray] = {}

    def put(name: str, leaf: Dict[str, Any],
            index: Optional[int] = None) -> None:
        k, b = leaf["kernel"], leaf["bias"]
        if index is not None:
            k, b = k[index], b[index]
        sd[name + ".weight"] = _hwio_to_oihw(k)
        sd[name + ".bias"] = np.asarray(b, np.float32)

    put("head.0", params["head"])
    blk = params["body"]["block"]
    num_blocks = int(np.shape(blk["conv1"]["kernel"])[0])
    for i in range(num_blocks):
        put(f"body.{i}.body.0", blk["conv1"], i)
        put(f"body.{i}.body.2", blk["conv2"], i)
    put(f"body.{num_blocks}", params["tail"])
    for s in range(num_stages):
        put(f"tail.0.{2 * s}", params["upsampler"][f"conv{s}"])
    put("tail.1" if num_stages else "tail.0", params["out"])
    return sd


def save_generator_torch(params: Dict[str, Any], scale: int,
                         path: str) -> int:
    """Write flax Generator params as a torch ``.pth`` state_dict.
    Returns the parameter count."""
    import torch

    sd = export_torch_generator(params, scale)
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, path)
    return sum(v.size for v in sd.values())


def load_discriminator_params(path: str, template: Any,
                              hr_size: int) -> Any:
    """``--pretrained_d`` entry point: accepts a torch ``.pth`` OR an
    orbax dir — either the converter CLI's ``{"d": {"params": ...}}``
    artifact or any training checkpoint carrying a ``d`` payload —
    validated against the initialized template tree.  (The CLI artifact
    was previously a dead end no consumer could load; round-2 review.)"""
    import os
    if os.path.isdir(path):
        from pesr_tpu.training.checkpoint import restore_payload
        payload = restore_payload(path)
        if "d" not in payload or payload["d"] is None:
            raise ValueError(f"{path} has no discriminator ('d') payload")
        converted = payload["d"]["params"]
        validate_against_template(template, converted, "discriminator")
        return converted
    return load_discriminator_weights(path, template, hr_size)


def load_discriminator_weights(path: str, template: Any,
                               hr_size: int) -> Any:
    """Reference GAN-state import: torch SRGAN-style discriminator
    checkpoint -> flax params validated against the template tree."""
    converted = convert_torch_discriminator(load_torch_state_dict(path),
                                            hr_size)
    validate_against_template(template, converted, "discriminator")
    return converted


def main(argv=None) -> int:
    """Standalone converter CLI:

        python -m pesr_tpu.convert generator.pth out_ckpt \\
            --num_blocks 32 --scale 4 [--num_channels 256]
        python -m pesr_tpu.convert D.pth out_d --kind discriminator \\
            --hr_size 192
        python -m pesr_tpu.convert vgg19.pth out_vgg --kind vgg19
        python -m pesr_tpu.convert ckpt_dir out.pth --to_torch \\
            --scale 4   # REVERSE: orbax generator ckpt -> torch .pth

    Writes an orbax checkpoint loadable by ``test.py --model_path
    out_ckpt`` / ``train.py --pretrained_model out_ckpt`` (generator
    kind) — convert a reference torch checkpoint once instead of on
    every run.  ``--to_torch`` goes the other way: hand a model trained
    here back to reference-ecosystem tooling as a ``.pth``.
    """
    import argparse

    p = argparse.ArgumentParser(description=main.__doc__)
    p.add_argument("src", help="torch .pt/.pth checkpoint (or an orbax "
                               "checkpoint dir with --to_torch)")
    p.add_argument("dst", help="output orbax checkpoint directory (or "
                               ".pth path with --to_torch)")
    p.add_argument("--kind", default="generator",
                   choices=["generator", "discriminator", "vgg19"])
    p.add_argument("--to_torch", action="store_true",
                   help="reverse direction: orbax generator checkpoint "
                        "-> torch state_dict .pth")
    p.add_argument("--num_blocks", type=int, default=32)
    p.add_argument("--num_channels", type=int, default=256)
    p.add_argument("--scale", type=int, default=4)
    p.add_argument("--hr_size", type=int, default=192,
                   help="discriminator: HR patch side its head expects")
    args = p.parse_args(argv)

    import os

    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    if args.to_torch:
        if args.kind != "generator":
            raise SystemExit("--to_torch supports --kind generator only")
        from pesr_tpu.training.checkpoint import restore_generator_params
        params, step = restore_generator_params(args.src)
        n = save_generator_torch(params, args.scale, args.dst)
        print(f"exported {args.src} (step {step}) -> {args.dst} "
              f"({n / 1e6:.2f} M params, torch state_dict, "
              f"x{args.scale})")
        return 0

    if args.kind == "generator":
        from pesr_tpu.models import Generator
        gen = Generator(scale=args.scale, num_blocks=args.num_blocks,
                        num_channels=args.num_channels)
        template = jax.eval_shape(
            lambda: gen.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3))))
        params = load_generator_weights(args.src, template["params"],
                                        args.num_blocks, args.scale)
        payload = {"step": np.asarray(0), "g": {"params": params}}
        desc = f"{args.num_blocks}x{args.num_channels} x{args.scale}"
    elif args.kind == "discriminator":
        from pesr_tpu.models import Discriminator
        disc = Discriminator()
        template = jax.eval_shape(lambda: disc.init(
            jax.random.key(0),
            jnp.zeros((1, args.hr_size, args.hr_size, 3))))
        params = load_discriminator_weights(args.src, template["params"],
                                            args.hr_size)
        payload = {"step": np.asarray(0), "d": {"params": params}}
        desc = f"SRGAN-D hr={args.hr_size}"
    else:
        from pesr_tpu.models import VGG19Features
        vgg = VGG19Features()
        template = jax.eval_shape(lambda: vgg.init(
            jax.random.key(0), jnp.zeros((1, 32, 32, 3))))
        params = load_vgg_weights(args.src, template["params"])
        payload = {"vgg": {"params": params}}
        desc = "VGG19 trunk"

    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(args.dst), payload, force=True)
    n = sum(int(np.asarray(v).size) for v in
            jax.tree_util.tree_leaves(params))
    print(f"converted {args.src} -> {args.dst} ({n / 1e6:.2f} M params, "
          f"{desc})")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
