"""Option/flag system — the public CLI contract (SURVEY.md §2 item 1, §5.6).

The reference drives everything from a single argparse namespace defined in
``opts.py`` and threaded into every constructor.  We mirror that surface so
existing PESR recipes run unchanged (BASELINE.json:5 "Public API mirrors
PESR's train.py/test.py entry points and option flags"), while internally
converting the flat namespace into a typed, hashable config object that is
safe to close over in jitted code.

Provenance note: the reference mount was empty during the survey
(SURVEY.md §0), so the flag names/defaults below are the reconstructed
surface from SURVEY.md §5.6 and BASELINE.json:6-11.  When the real
``opts.py`` becomes readable, run SURVEY.md §0.1 item 2 and reconcile.
"""

from __future__ import annotations

import argparse
import dataclasses
from typing import Optional, Tuple

from pesr_tpu.scales import upsample_stages


# --------------------------------------------------------------------------
# Typed config
# --------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Opts:
    """Typed, frozen view of the CLI namespace.

    Frozen + hashable so it can be a static argument to ``jax.jit`` and
    closed over by compiled train steps without retracing hazards.
    """

    # --- model (SURVEY.md §2 item 2/3) ---
    scale: int = 4
    num_channels: int = 256
    num_blocks: int = 32
    res_scale: float = 0.1
    img_channels: int = 3

    # --- data (SURVEY.md §2 item 5; BASELINE.json:8) ---
    train_dataset: str = "DIV2K"
    valid_dataset: str = "PIRM"
    test_dataset: str = "Set5"
    data_root: str = "data"
    num_valids: int = 10
    patch_size: int = 48          # LR patch side; HR side = patch_size*scale
    batch_size: int = 16
    num_repeats: int = 20         # epoch = image list x num_repeats
                                  # (feeds steps_per_epoch derivation)

    # --- training (SURVEY.md §2 item 7; BASELINE.json:8-9) ---
    phase: str = "pretrain"       # "pretrain" (L1) | "train" (GAN) |
                                  # "qat" (L1 with inference-sim W8A8
                                  # fake-quant forward, models/qat.py)
    pretrained_model: str = ""
    pretrained_d: str = ""        # discriminator init for the GAN phase
    learning_rate: float = 1e-4
    lr_step: int = 120            # epochs between x0.5 LR decays
    num_epochs: int = 300
    # 0 = derive ceil(num_images * num_repeats / batch_size) from the
    # train set (reference epoch semantics: DIV2K 800 x 20 / 16 = 1000).
    steps_per_epoch: int = 0
    seed: int = 0
    ema_decay: float = 0.0        # 0 = off; e.g. 0.999: keep an EMA of
                                  # the generator params inside the
                                  # jitted step — eval/best-ckpt/serving
                                  # use the EMA weights (the standard
                                  # perceptual-SR stabilizer; ESRGAN
                                  # lineage, PAPERS.md)

    # --- GAN losses (SURVEY.md §2 item 6) ---
    gan_type: str = "RSGAN"       # RSGAN | RaSGAN | RaLSGAN | LSGAN | GAN
    use_gp: bool = False          # gradient penalty on D
    spectral_norm: bool = False   # spectral norm on D convs
    # Focal re-weighting is an option the reference exposes; whether it
    # defaults on is unverifiable (SURVEY.md §0) and it sharpens the
    # adversarial gradient, so the safer standard-RaGAN default is off.
    focal_loss: bool = False
    fl_gamma: float = 1.0
    alpha_vgg: float = 50.0
    alpha_gan: float = 1.0
    alpha_tv: float = 1e-6
    alpha_l1: float = 0.0
    vgg_layer: str = "54"         # conv5_4 pre-activation ("VGG54")

    # --- checkpoints / logging (SURVEY.md §5.4/5.5) ---
    check_point: str = "check_point/pesr"
    snapshot_every: int = 10      # epochs between checkpoint snapshots
                                  # (0 = end-of-training save only)
    keep_snapshots: int = 0       # retain only the newest N step_<K>
                                  # snapshot dirs (0 = keep all; the
                                  # ``best`` copy is never pruned)
    log_every: int = 50           # steps between scalar logs (0 = off)
    trim_host_heap: bool = False  # malloc_trim(0) at epoch boundaries
                                  # (utils/memory.py: long-run host-RSS
                                  # hygiene on glibc hosts)
    eval_every: int = 1           # epochs between self-validation evals
                                  # (0 = off)
    eval_pi: bool = True          # PIRM PI (NIQE+Ma) in self-validation
    resume: bool = False          # resume full G/D/optimizer state from
                                  # the latest step under check_point
    profile_dir: str = ""         # jax.profiler trace dir (traces a few
                                  # steady-state steps; SURVEY.md §5.1)

    # --- inference (SURVEY.md §3.3, §5.7; BASELINE.json:10) ---
    model_path: str = ""
    output_dir: str = "results"
    # LR tile core side for tiled inference: int, 0 = whole-image (the
    # reference's mode), or "auto" = rectangular grid minimizing halo
    # waste under the VMEM-safe area budget (test.py CLI default; the
    # dataclass default stays an int for the training-eval tiler).
    tile_size: object = 96
    tile_overlap: int = 8         # LR halo on each side
    infer_batch: int = 8          # tiles per jitted forward
    self_ensemble: bool = False   # x8 geometric TTA at inference
    export_artifact: str = ""     # write an AOT serving bundle
                                  # (pesr_tpu/serving.py) and exit
    interp_model: str = ""        # second checkpoint for network
                                  # interpolation (ESRGAN §4.4):
                                  # params = (1-a)*model_path + a*this
    interp_alpha: float = 0.5     # blend factor a in [0,1]

    # --- TPU-native knobs (new; SURVEY.md §7) ---
    compute_dtype: str = "bfloat16"   # activations/conv compute dtype
    param_dtype: str = "float32"
    use_pallas: bool = False          # fused Pallas kernels (XLA fallback)
    remat: bool = False               # gradient-checkpoint the body scan
                                      # (~3x larger batch*patch^2; one
                                      # extra forward per step)
    grad_accum: int = 1               # microbatches per optimizer step
                                      # (grads averaged in-step; ~1/N
                                      # activation memory, composes with
                                      # remat; training/steps.py)
    unroll_body: bool = False         # unroll the body scan in training
                                      # (+5% pretrain steps/s for a ~1min
                                      # one-time compile; identical
                                      # params/grads)
    fold_train: bool = False          # train through the folded upsampler
                                      # (CLI defaults ON via opts_from_
                                      # args — round-4 equivalence study;
                                      # programmatic default stays
                                      # explicit-off)
                                      # (differentiable analytic fold;
                                      # interior-exact, patch borders see
                                      # fold padding — models/fold.py
                                      # make_fold_train_apply)
    fold: bool = True                 # folded upsampler at inference
                                      # (exact through tiling; models/fold.py)
    quant: str = "none"               # none | int8 (PTQ inference path)
    quant_guard_db: float = 0.0       # >0: int8 quality guard — measure
                                      # int8-vs-bf16 output agreement on
                                      # the calibration tiles and fall
                                      # back to bf16 (loud warning) when
                                      # it lands under this floor; 55 is
                                      # the stress-calibrated default
                                      # floor (quant_apply.int8_
                                      # inference_guarded)
    mesh_shape: str = ""              # e.g. "8" or "" = all local devices
    mesh_axis: str = "batch"          # multi-chip inference parallelism:
                                      # batch (DP) | tiles (spatial: N
                                      # chips cooperate on ONE image)
    distributed: bool = False         # multi-host: jax.distributed bring-up
                                      # before backend use (DCN; SURVEY §2.11)
    vgg_weights: str = ""             # converted VGG19 weights (see convert.py)

    @property
    def hr_patch_size(self) -> int:
        return self.patch_size * self.scale

    @property
    def num_upsample_stages(self) -> int:
        return len(upsample_stages(self.scale))  # ValueError on e.g. 5


# --------------------------------------------------------------------------
# argparse surface
# --------------------------------------------------------------------------


def _tile_size(value: str):
    """--tile_size parser: int or the literal "auto"."""
    if value == "auto":
        return value
    return int(value)


def _add_bool_flag(parser: argparse.ArgumentParser, name: str, default: bool,
                   help_: str) -> None:
    """A PESR-style on/off flag plus a --no_ counterpart."""
    # argparse %-interpolates help text; a literal "%" in prose (e.g.
    # "+5% measured") crashes --help with a ValueError unless escaped.
    parser.add_argument(f"--{name}", dest=name, action="store_true",
                        default=default, help=help_.replace("%", "%%"))
    parser.add_argument(f"--no_{name}", dest=name, action="store_false",
                        help=argparse.SUPPRESS)


def build_parser(mode: str = "train") -> argparse.ArgumentParser:
    """Build the PESR-compatible flag parser.

    ``mode`` is "train" or "test"; both share the model/data flags the way
    the reference's single ``opts.py`` namespace is consumed by both
    entry points (SURVEY.md §1 L2).
    """
    d = Opts()
    p = argparse.ArgumentParser(
        description=f"pesr_tpu {mode} — TPU-native PESR",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )

    g = p.add_argument_group("model")
    g.add_argument("--scale", type=int, default=d.scale,
                   help="super-resolution scale (any 2^a*3^b: 1/2/3/4/6/8/...)")
    g.add_argument("--num_channels", type=int, default=d.num_channels)
    g.add_argument("--num_blocks", type=int, default=d.num_blocks)
    g.add_argument("--res_scale", type=float, default=d.res_scale)

    g = p.add_argument_group("data")
    g.add_argument("--train_dataset", type=str, default=d.train_dataset)
    g.add_argument("--valid_dataset", type=str, default=d.valid_dataset)
    g.add_argument("--test_dataset", "--dataset", dest="test_dataset",
                   type=str, default=d.test_dataset)
    g.add_argument("--data_root", type=str, default=d.data_root)
    g.add_argument("--num_valids", type=int, default=d.num_valids)
    g.add_argument("--patch_size", type=int, default=d.patch_size)
    g.add_argument("--batch_size", type=int, default=d.batch_size)
    g.add_argument("--num_repeats", type=int, default=d.num_repeats)

    if mode == "train":
        g = p.add_argument_group("training")
        g.add_argument("--phase", type=str, default=d.phase,
                       choices=["pretrain", "train", "qat"])
        g.add_argument("--pretrained_model", type=str,
                       default=d.pretrained_model)
        g.add_argument("--pretrained_d", type=str, default=d.pretrained_d,
                       help="discriminator init for the GAN phase: a "
                            "converted orbax dir (convert.py --kind "
                            "discriminator), a torch .pth, or a "
                            "training checkpoint with a 'd' payload")
        g.add_argument("--learning_rate", type=float, default=d.learning_rate)
        g.add_argument("--lr_step", type=int, default=d.lr_step)
        g.add_argument("--num_epochs", type=int, default=d.num_epochs)
        g.add_argument("--steps_per_epoch", type=int,
                       default=d.steps_per_epoch,
                       help="steps per epoch; 0 = derive ceil(num_images"
                            " * num_repeats / batch_size), the reference"
                            " epoch semantics")
        g.add_argument("--seed", type=int, default=d.seed)
        g.add_argument("--ema_decay", type=float, default=d.ema_decay,
                       help="exponential-moving-average decay for the "
                            "generator params (0 = off; e.g. 0.999). "
                            "Eval, best-checkpoint, and inference use "
                            "the EMA weights")

        g = p.add_argument_group("losses")
        g.add_argument("--gan_type", type=str, default=d.gan_type,
                       choices=["RSGAN", "RaSGAN", "RaLSGAN", "LSGAN", "GAN"])
        _add_bool_flag(g, "GP", d.use_gp, "gradient penalty on D")
        _add_bool_flag(g, "spectral_norm", d.spectral_norm,
                       "spectral norm on D convs")
        _add_bool_flag(g, "focal_loss", d.focal_loss,
                       "focal re-weighting of the GAN loss")
        g.add_argument("--fl_gamma", type=float, default=d.fl_gamma)
        g.add_argument("--alpha_vgg", type=float, default=d.alpha_vgg)
        g.add_argument("--alpha_gan", type=float, default=d.alpha_gan)
        g.add_argument("--alpha_tv", type=float, default=d.alpha_tv)
        g.add_argument("--alpha_l1", type=float, default=d.alpha_l1)
        g.add_argument("--vgg_layer", type=str, default=d.vgg_layer)

        g = p.add_argument_group("checkpointing")
        g.add_argument("--check_point", type=str, default=d.check_point)
        g.add_argument("--snapshot_every", type=int, default=d.snapshot_every)
        g.add_argument("--keep_snapshots", type=int,
                       default=d.keep_snapshots,
                       help="retain only the newest N snapshot dirs "
                       "(0 = keep all; 'best' is never pruned)")
        g.add_argument("--log_every", type=int, default=d.log_every)
        g.add_argument("--eval_every", type=int, default=d.eval_every)
        _add_bool_flag(g, "eval_pi", d.eval_pi,
                       "PIRM perceptual index in self-validation")
        _add_bool_flag(g, "resume", d.resume,
                       "resume G/D/optimizer state from check_point")
        _add_bool_flag(g, "trim_host_heap", d.trim_host_heap,
                       "return freed host-heap arenas to the OS at "
                       "epoch boundaries (long-run RSS hygiene)")
        g.add_argument("--profile_dir", type=str, default=d.profile_dir)
    else:
        g = p.add_argument_group("inference")
        g.add_argument("--model_path", type=str, default=d.model_path)
        g.add_argument("--output_dir", type=str, default=d.output_dir)
        g.add_argument("--tile_size", type=_tile_size, default="auto",
                       help='LR tile side, 0 = whole-image (reference '
                            'mode), or "auto" (fastest: device-resident '
                            'rectangular grid)')
        g.add_argument("--tile_overlap", type=int, default=d.tile_overlap)
        g.add_argument("--infer_batch", type=int, default=d.infer_batch)
        _add_bool_flag(g, "self_ensemble", d.self_ensemble,
                       "x8 geometric test-time augmentation")
        g.add_argument("--export_artifact", type=str,
                       default=d.export_artifact,
                       help="write a hermetic AOT serving bundle "
                            "(jax.export; fixed shape = first eval "
                            "batch) to this path and exit")
        g.add_argument("--interp_model", type=str, default=d.interp_model,
                       help="network interpolation (ESRGAN-style): blend "
                            "this checkpoint's params into --model_path's "
                            "as (1-a)*base + a*this before inference")
        g.add_argument("--interp_alpha", type=float,
                       default=d.interp_alpha,
                       help="blend factor a in [0,1]: 0 = pure "
                            "--model_path (PSNR model), 1 = pure "
                            "--interp_model (GAN model)")

    g = p.add_argument_group("tpu")
    g.add_argument("--compute_dtype", type=str, default=d.compute_dtype,
                   choices=["bfloat16", "float32"])
    g.add_argument("--param_dtype", type=str, default=d.param_dtype)
    _add_bool_flag(g, "use_pallas", d.use_pallas, "use fused Pallas kernels")
    _add_bool_flag(g, "remat", d.remat,
                   "gradient-checkpoint the residual body (trade one "
                   "extra forward for ~3x activation-memory headroom)")
    g.add_argument("--grad_accum", type=int, default=d.grad_accum,
                   help="accumulate gradients over N microbatches per "
                        "optimizer step (batch_size must divide; exact "
                        "for per-sample losses, per-microbatch E[C] for "
                        "relativistic-average GAN types)")
    _add_bool_flag(g, "unroll_body", d.unroll_body,
                   "unroll the residual-body scan in the train step "
                   "(+5% measured at flagship; ~1min one-time compile)")
    # CLI default: ON (resolved in opts_from_args) since the round-4
    # flagship equivalence study measured 0.012 dB final-quality delta
    # for +21% pretrain / +17% GAN steps/s
    # (benchmarks/fold_train_study_r4.json); None = "user didn't say",
    # letting the resolver step aside for --use_pallas/--unroll_body.
    # The Opts dataclass default stays False: programmatic users
    # (tests, benchmarks, library embedding) keep explicit control.
    g.add_argument("--fold_train", dest="fold_train",
                   action="store_true", default=None,
                   help="train through the differentiable folded "
                        "upsampler (+21%% pretrain / +17%% GAN steps/s "
                        "measured at flagship; final quality within "
                        "0.012 dB of the plain chain at flagship width "
                        "— CLI default ON; patch borders see the "
                        "fold's one-shot zero padding instead of "
                        "per-stage padding, interior semantics "
                        "identical)")
    g.add_argument("--no_fold_train", dest="fold_train",
                   action="store_false", help=argparse.SUPPRESS)
    _add_bool_flag(g, "fold", d.fold,
                   "fold the linear upsampler+out chain into one conv "
                   "at inference (tiled modes; exact on the interior)")
    g.add_argument("--quant", type=str, default=d.quant,
                   choices=["none", "int8"],
                   help="post-training-quantized inference path")
    g.add_argument("--quant_guard_db", type=float,
                   default=d.quant_guard_db,
                   help="int8 quality guard: minimum int8-vs-bf16 "
                        "output-agreement PSNR (dB) before falling "
                        "back to bf16 with a warning (0 = off; 55 = "
                        "stress-calibrated floor)")
    g.add_argument("--mesh_shape", type=str, default=d.mesh_shape)
    g.add_argument("--mesh_axis", type=str, default=d.mesh_axis,
                   choices=["batch", "tiles"],
                   help="multi-chip inference parallelism: shard the "
                        "image batch (DP throughput) or each image's "
                        "tile grid (spatial; single-image latency)")
    _add_bool_flag(g, "distributed", d.distributed,
                   "multi-host cluster bring-up (jax.distributed)")
    g.add_argument("--vgg_weights", type=str, default=d.vgg_weights)
    return p


def opts_from_args(argv: Optional[Tuple[str, ...]] = None,
                   mode: str = "train") -> Opts:
    """Parse argv into an :class:`Opts`, filling non-parsed fields with
    their defaults (test-mode parses no training flags and vice versa)."""
    ns = vars(build_parser(mode).parse_args(argv))
    ns["use_gp"] = ns.pop("GP", Opts.use_gp)
    if ns.get("fold_train") is None:
        # Unstated --fold_train: default ON (the measured free win),
        # stepping aside for the two applies it conflicts with —
        # --use_pallas replaces the same apply (configure_generator_
        # apply raises on the explicit pair) and --unroll_body
        # measured 2.6x SLOWER combined with the fold.  Train mode
        # only: inference never reads fold_train (it has --fold), and
        # an implicit True from test-mode parsing would surprise future
        # inference/export consumers (round-4 advisor).
        ns["fold_train"] = mode == "train" and not (
            ns.get("use_pallas") or ns.get("unroll_body"))
    elif ns["fold_train"] and ns.get("unroll_body"):
        import sys as _sys
        print("WARNING: --fold_train + --unroll_body measured 2.6x "
              "slower than either alone (docs/FLAGS.md); combining "
              "anyway as requested.", file=_sys.stderr)
    fields = {f.name for f in dataclasses.fields(Opts)}
    opts = Opts(**{k: v for k, v in ns.items() if k in fields})
    upsample_stages(opts.scale)  # fail fast at parse time on e.g. 5
    if opts.grad_accum < 1:
        raise SystemExit(f"--grad_accum must be >= 1, got "
                         f"{opts.grad_accum}")
    if mode == "train" and opts.batch_size % opts.grad_accum:
        raise SystemExit(
            f"--batch_size {opts.batch_size} must be divisible by "
            f"--grad_accum {opts.grad_accum}")
    return opts
