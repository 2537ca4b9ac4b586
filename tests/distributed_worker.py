"""Subprocess worker for tests/test_distributed.py — a REAL
multi-process ``jax.distributed`` run of the training loop on CPU
(round-2 verdict #2: mesh.py's multi-host paths had only ever executed
under monkeypatched ``jax.process_count``).

Each worker: forces ``8 // num_processes`` virtual CPU devices, brings
up the distributed runtime via the PESR_* env contract
(parallel.initialize_distributed), swaps the data pipeline for a
deterministic GLOBAL-batch source (below), runs a short GAN phase via
the real ``run_training`` loop — multi-host ``shard_batch``
(``make_array_from_process_local_data``), replicated states, collective
orbax checkpointing — and dumps its summary as JSON.

The deterministic batch source exists so a 2-process run is comparable
to a 1-process reference: each process slices ITS rows out of a global
batch defined purely by the step index, exactly the local-shard
contract of ``shard_batch``.  (The per-process-distinct *stream*
seeding of the production pipeline is covered by tests/test_data.py; it
is deliberately bypassed here because it makes 1-vs-2-process batches
differ by design.)
"""

import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def tiny_opts(ckpt_dir: str):
    """3-step GAN phase, small enough for single-core CPU devices."""
    from pesr_tpu.config import opts_from_args
    return opts_from_args([
        "--phase", "train",
        "--num_blocks", "2", "--num_channels", "8",
        "--batch_size", "8", "--patch_size", "12",
        "--steps_per_epoch", "3", "--num_epochs", "1",
        "--snapshot_every", "1", "--eval_every", "99",
        "--compute_dtype", "float32", "--param_dtype", "float32",
        "--alpha_vgg", "0", "--alpha_l1", "1.0", "--log_every", "1",
        "--train_dataset", "synthetic",
        "--check_point", ckpt_dir,
    ], mode="train")


def install_deterministic_batches():
    """Replace datasets.make_train_iterator with a step-indexed global
    batch source; each process yields only its local rows."""
    import numpy as np

    from pesr_tpu.data import datasets

    def fake_iterator(opts, start_step: int = 0):
        import jax
        n, i = jax.process_count(), jax.process_index()
        assert opts.batch_size % n == 0
        local = opts.batch_size // n

        def gen():
            step = start_step
            while True:
                rng = np.random.default_rng(987_654 + step)
                hr = rng.integers(
                    0, 256,
                    (opts.batch_size, opts.hr_patch_size,
                     opts.hr_patch_size, 3), dtype=np.uint8)
                yield None, hr[i * local:(i + 1) * local]
                step += 1

        return gen(), False

    datasets.make_train_iterator = fake_iterator


def run_spatial_inference() -> dict:
    """Multi-host SPATIAL-parallel serving (mesh_axis="tiles"): every
    process helps upscale the SAME image — each image's tile grid
    shards over the 8-device global mesh that spans both processes, so
    the conv work splits across hosts and the stitched canvas comes
    back through one cross-host all-gather.  Returns hashes: the
    spatial canvas must be BITWISE the locally-computed single-device
    TILED engine at the same geometry (the invariant the
    single-process spatial tests pin — tiled engines replicate-pad true
    image borders, so the zero-pad whole-image forward legitimately
    differs there), now with the all-gather riding a real DCN
    boundary."""
    import hashlib

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pesr_tpu.models import Generator
    from pesr_tpu.ops.tiling import BatchTiledUpscaler
    from pesr_tpu.parallel import make_mesh

    scale = 2
    gen = Generator(scale=scale, num_blocks=2, num_channels=8,
                    dtype=jnp.float32)
    # Same seed on every process -> identical replicated params.
    variables = gen.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (1, 24, 40, 3), dtype=np.uint8)

    mesh = make_mesh(8)  # global: 4 local devices x 2 processes
    sp = BatchTiledUpscaler(gen.apply, variables, scale, tile_size=8,
                            overlap=8, mesh=mesh, mesh_axis="tiles")
    canvas = np.asarray(sp.upscale_batch(img))

    # Local single-device reference: the same tiled engine, no mesh.
    ref = BatchTiledUpscaler(gen.apply, variables, scale, tile_size=8,
                             overlap=8).upscale_batch(img)
    h, w = img.shape[1:3]
    assert canvas.shape == (1, h * scale, w * scale, 3)
    return {
        "canvas_sha": hashlib.sha256(canvas.tobytes()).hexdigest(),
        "ref_sha": hashlib.sha256(np.asarray(ref).tobytes()).hexdigest(),
        "bitwise_equal_local_ref": bool((canvas == np.asarray(ref)).all()),
    }


def main() -> int:
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, out_path, ckpt_dir = sys.argv[3], sys.argv[4], sys.argv[5]
    mode = sys.argv[6] if len(sys.argv) > 6 else "train"

    from pesr_tpu.parallel import force_cpu_devices
    force_cpu_devices(8 // nproc)

    os.environ["PESR_COORDINATOR"] = f"127.0.0.1:{port}"
    os.environ["PESR_NUM_PROCESSES"] = str(nproc)
    os.environ["PESR_PROCESS_ID"] = str(pid)
    from pesr_tpu.parallel import initialize_distributed
    assert initialize_distributed(required=True)

    import jax
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()

    if mode == "spatial":
        summary = run_spatial_inference()
    else:
        install_deterministic_batches()
        from pesr_tpu.training.loop import run_training
        summary = run_training(tiny_opts(ckpt_dir))

    with open(out_path, "w") as f:
        json.dump({"process": pid, "n": nproc, "summary": summary}, f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
