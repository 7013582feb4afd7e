#!/usr/bin/env python
"""End-to-end training throughput over the real device: loader threads
(JPEG decode + resample) -> prefetch queue -> host->device transfer ->
jitted train step.

The resident-batch train bench (train_bench.py) hides the host pipeline and
the transfer; THIS bench is the number a user's epoch loop actually sees,
and the one the host-side work (native decode/resample, uint8 transport,
``TPU.train_fast_decode``) moves. Synthetic ADE-sized JPEGs (512x683,
quality 90) on local disk; single short-side 450 so the step compiles once;
bs8 (the measured per-chip sweet spot).

Variants:
  * f32:   host-normalized float32 transport (TPU.device_preproc off)
  * u8:    raw uint8 transport, on-device normalize (the default)
  * fast:  u8 + DCT-domain prescaled decode (TPU.train_fast_decode)

Prints one JSON line. Timing: steady-state wall over --steps consumed
batches with a final-loss fetch as the barrier (the dispatch chain runs
through the donated TrainState, so the fetch waits for every step).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def make_dataset(root, n=32, quality=90):
    """All-landscape 512x683 so one aspect bin -> one compiled step shape."""
    from PIL import Image

    rng = np.random.RandomState(0)
    os.makedirs(os.path.join(root, "img"), exist_ok=True)
    os.makedirs(os.path.join(root, "ann"), exist_ok=True)
    recs = []
    for i in range(n):
        h, w = 512, 683
        Image.fromarray(
            rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        ).save(os.path.join(root, "img", f"{i}.jpg"), quality=quality)
        Image.fromarray(
            rng.randint(0, 151, (h, w)).astype(np.uint8), "L"
        ).save(os.path.join(root, "ann", f"{i}.png"))
        recs.append(
            {"fpath_img": f"img/{i}.jpg", "fpath_segm": f"ann/{i}.png",
             "width": w, "height": h}
        )
    odgt = os.path.join(root, "train.odgt")
    with open(odgt, "w") as f:
        f.write("\n".join(json.dumps(r) for r in recs))
    return odgt


def run_variant(root, odgt, *, batch, steps, workers, raw, fast, state,
                step_fn):
    import jax

    from semseg_tpu.config import cfg
    from semseg_tpu.data.dataset import TrainDataset
    from semseg_tpu.data.loader import TrainLoader

    opt = cfg.clone().DATASET
    opt.imgSizes = (450,)  # single scale -> one jit shape

    loader = TrainLoader(
        lambda seed: TrainDataset(
            root, odgt, opt, batch_per_gpu=batch, seed=seed,
            bucket_step=64, raw_transport=raw, fast_decode=fast,
        ),
        num_workers=workers,
        prefetch=4,
    )
    try:
        it = iter(loader)
        key = jax.random.PRNGKey(0)
        # compile + warmup (also primes the loader queue)
        state, metrics = step_fn(state, jax.device_put(next(it)), key)
        float(metrics["loss"])
        t0 = time.perf_counter()
        for _ in range(steps):
            state, metrics = step_fn(state, jax.device_put(next(it)), key)
        float(metrics["loss"])  # chain barrier
        dt = time.perf_counter() - t0
    finally:
        loader.close()
    del state
    return batch * steps / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--workers", type=int, default=2)
    args = ap.parse_args()

    import tempfile

    import jax
    import jax.numpy as jnp

    from semseg_tpu.config import cfg
    from semseg_tpu.models import ModelBuilder, init_variables
    from semseg_tpu.parallel.train_step import (
        create_train_state,
        jitted_train_step,
    )
    from semseg_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    c = cfg.clone()
    c.MODEL.arch_encoder = "resnet50dilated"
    c.MODEL.arch_decoder = "ppm_deepsup"
    c.MODEL.fc_dim = 2048
    model = ModelBuilder.build_model(c, dtype=jnp.bfloat16)
    variables = init_variables(model, seed=0, image_size=(64, 64))
    step_fn = jitted_train_step()

    out = {"batch": args.batch, "steps": args.steps, "workers": args.workers}
    with tempfile.TemporaryDirectory() as root:
        odgt = make_dataset(root)
        for name, (raw, fast) in (
            ("f32", (False, False)),
            ("u8", (True, False)),
            ("u8_fast_decode", (True, True)),
        ):
            # Fresh state per variant: the step donates its input state.
            state = create_train_state(
                c, model, jax.tree.map(jnp.array, dict(variables))
            )
            out[name + "_img_per_s"] = round(
                run_variant(
                    root, odgt, batch=args.batch, steps=args.steps,
                    workers=args.workers, raw=raw, fast=fast,
                    state=state, step_fn=step_fn,
                ),
                1,
            )
    print(json.dumps(out), flush=True)
    os._exit(0)  # axon teardown hang insurance (see bench.py)


if __name__ == "__main__":
    main()
