#!/usr/bin/env python3
"""Pre-compile the bucket lattice into the persistent compilation cache.

Production complement to ``TPU.compile_cache``: the train step compiles
27-51 s per distinct (H, W) batch shape over a remote link (PERF_NOTES
"compile budget"), and those shapes are *predictable* — they come from the
dataset manifest replayed through TrainDataset's shape math. This tool
AOT-compiles (``jit(...).lower(...).compile()``, no data, no device steps)
every predicted shape once, populating the cache so real runs — including
multi-epoch restarts and resumes — deserialize instead of stalling
mid-epoch on late-first-seen shapes.

Usage:
    python tools/warmup_cache.py --cfg config/<cfg>.yaml \
        [--iters 5000] [--limit 0] [TRAIN.batch_size_per_gpu 8 ...]

Prints one line per shape with compile wall time.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def predicted_shapes(cfg, iters, local_batch):
    """Distinct train-batch (H, W) over a simulated epoch, most-used first.

    ``local_batch`` must be the PER-PROCESS record count the real loader
    maxes each canvas over (batch_size_per_gpu x n_devices / n_processes,
    cli/train.py:120-125) — simulating with batch_size_per_gpu alone
    predicts a different shape set than training compiles.
    """
    from tools.compile_budget import simulate

    with open(cfg.DATASET.list_train) as f:
        records = [json.loads(line) for line in f if line.strip()]
    shapes, _, _ = simulate(
        records,
        batch_per_gpu=local_batch,
        bucket_step=cfg.TPU.bucket_step,
        iters=iters,
        img_sizes=cfg.DATASET.imgSizes,
        img_max_size=cfg.DATASET.imgMaxSize,
        seed=cfg.TRAIN.seed,
    )
    return [s for s, _ in shapes.most_common()]


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", required=True)
    parser.add_argument("--iters", type=int, default=5000,
                        help="simulated epoch length (shape prediction)")
    parser.add_argument("--limit", type=int, default=0,
                        help="warm only the N most-used shapes (0 = all)")
    parser.add_argument("--devices", type=int, default=0,
                        help="data-parallel devices, as in train.py (0 = all)")
    parser.add_argument("opts", nargs=argparse.REMAINDER)
    args = parser.parse_args(argv)

    from semseg_tpu.config import cfg

    cfg.merge_from_file(args.cfg)
    if args.opts:
        cfg.merge_from_list(args.opts)

    from semseg_tpu.utils.compile_cache import enable_compile_cache

    cache_dir = enable_compile_cache(cfg.TPU.compile_cache)
    print(f"cache: {cache_dir or 'DISABLED'}")

    import functools

    import jax
    import jax.numpy as jnp

    from semseg_tpu.models import ModelBuilder, init_variables
    from semseg_tpu.parallel.mesh import (
        batch_sharding,
        replicate_state,
    )
    from semseg_tpu.parallel.train_step import (
        create_train_state,
        train_step,
    )

    model = ModelBuilder.build_model(cfg, dtype=jnp.dtype(cfg.TPU.compute_dtype))
    variables = init_variables(model, seed=0, image_size=(64, 64))
    state = create_train_state(cfg, model, variables)
    # Lower the SAME program the training run compiles: the training CLI's
    # OWN mesh builder (data-parallel or hybrid data x spatial — a pure-dp
    # lowering for a TPU.spatial config would produce different shardings,
    # hence different cache keys, and warm nothing), state replicated,
    # grad-accum microbatch axis included (a flat-batch lowering would
    # likewise miss). batch_sharding below picks the matching specs.
    from semseg_tpu.cli.train import build_train_mesh

    mesh = build_train_mesh(cfg, args.devices)
    state = replicate_state(mesh, state)
    accum = cfg.TPU.grad_accum
    # Per data-GROUP batch (== per chip only without spatial sharding) —
    # the same global-batch rule as cli/train.py.
    n = cfg.TRAIN.batch_size_per_gpu * mesh.shape["data"]
    local_batch = n // jax.process_count()
    step = jax.jit(
        functools.partial(train_step, grad_accum=accum), donate_argnums=(0,)
    )

    def spec(shape, dtype):
        """ShapeDtypeStruct with the training run's sharding; grad-accum
        batches carry the leading (replicated) microbatch axis."""
        if accum > 1:
            shape = (accum,) + shape
        return jax.ShapeDtypeStruct(
            shape, dtype, sharding=batch_sharding(mesh, len(shape), accum > 1)
        )

    # The loader maxes each canvas over local_batch * accum records
    # (cli/train.py batch_per_gpu) — predict with the same count.
    shapes = predicted_shapes(cfg, args.iters, local_batch * accum)
    if args.limit:
        shapes = shapes[: args.limit]
    ds = cfg.DATASET.segm_downsampling_rate
    raw = cfg.TPU.device_preproc
    key = jax.random.PRNGKey(0)
    total = 0.0
    for i, (h, w) in enumerate(shapes):
        batch = {
            "img_data": spec((n, h, w, 3), jnp.uint8 if raw else jnp.float32),
            "seg_label": spec((n, h // ds, w // ds), jnp.int32),
        }
        if raw:
            batch["img_valid_hw"] = spec((n, 2), jnp.int32)
        t0 = time.perf_counter()
        step.lower(state, batch, key).compile()
        dt = time.perf_counter() - t0
        total += dt
        print(f"[{i + 1}/{len(shapes)}] {h}x{w}: {dt:.1f} s")
    print(f"warmed {len(shapes)} shapes in {total / 60:.1f} min")


if __name__ == "__main__":
    main()
