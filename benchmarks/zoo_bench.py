#!/usr/bin/env python3
"""Whole-zoo TPU benchmark: inference fps per config + train-step throughput.

Usage: python benchmarks/zoo_bench.py [--iters 20]
Writes benchmarks/zoo_results.json and prints a markdown table comparing
against the reference's single-GPU fps column (BASELINE.md).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# (config name under config/, reference single-scale GPU fps — README.md
# "Performance" table; everything else is derived from the YAML itself)
ZOO = [
    ("ade20k-mobilenetv2dilated-c1_deepsup", 17.2),
    ("ade20k-resnet18dilated-ppm_deepsup", 11.7),
    ("ade20k-resnet50dilated-ppm_deepsup", 8.3),
    ("ade20k-resnet101dilated-ppm_deepsup", 6.8),
    ("ade20k-resnet50-upernet", 8.4),
    ("ade20k-resnet101-upernet", 7.8),
    ("ade20k-hrnetv2", 5.8),
]


def timed_fps(model, variables, h, w, iters, batch):
    # Batch 16 by default: the 256-wide stages are MXU-tiling bound and
    # need many output rows to fill the array (measured 230->262 img/s on
    # the flagship going 4->16; PERF_NOTES "Batch scaling, inference").
    @jax.jit
    def timed(variables, img):
        def body(carry, _):
            logits = model.apply(variables, carry, train=False)
            carry = carry + jnp.mean(logits).astype(carry.dtype) * 1e-6
            return carry, ()

        out, _ = jax.lax.scan(body, img, None, length=iters)
        return jnp.mean(out)

    img = jnp.asarray(
        np.random.RandomState(0).randn(batch, h, w, 3), jnp.float32
    )
    float(timed(variables, img))
    best = float("inf")
    for _ in range(3):  # best-of-3: tunnel link drifts between minutes
        t0 = time.perf_counter()
        float(timed(variables, img))
        best = min(best, time.perf_counter() - t0)
    return batch * iters / best


def main():
    from semseg_tpu.config import cfg
    from semseg_tpu.models import ModelBuilder, init_variables

    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--batch", type=int, default=16)
    args = parser.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results = []
    for name, ref_fps in ZOO:
        c = cfg.clone()
        c.merge_from_file(os.path.join(repo, "config", f"{name}.yaml"))
        model = ModelBuilder.build_model(c, dtype=jnp.bfloat16)
        variables = init_variables(
            model, image_size=(c.DATASET.padding_constant * 4,) * 2
        )
        pad = c.DATASET.padding_constant
        h = (448 // pad) * pad
        w = (608 // pad) * pad
        fps = timed_fps(model, variables, h, w, args.iters, args.batch)
        results.append(
            {
                "config": name,
                "resolution": f"{h}x{w}",
                "batch": args.batch,
                "fps": round(fps, 1),
                "ref_gpu_fps": ref_fps,
                # Throughput at the recorded batch vs the reference's
                # published batch-1 fps — a regime difference, not
                # like-for-like latency (see README "Performance").
                "speedup": round(fps / ref_fps, 1),
            }
        )
        print(f"{name:45s} {h}x{w}  {fps:8.1f} img/s  ({fps / ref_fps:6.1f}x ref)",
              flush=True)

    # Train-step throughput for the flagship config (global batch 2,
    # the reference's batch_size_per_gpu).
    from semseg_tpu.parallel import create_train_state, jitted_train_step

    c = cfg.clone()
    c.merge_from_file(
        os.path.join(repo, "config", "ade20k-resnet50dilated-ppm_deepsup.yaml")
    )
    model = ModelBuilder.build_model(c, dtype=jnp.bfloat16)
    variables = init_variables(model)
    state = create_train_state(c, model, variables)
    step = jitted_train_step()
    batch = {
        "img_data": jnp.asarray(
            np.random.RandomState(0).randn(2, 448, 608, 3), jnp.float32
        ),
        "seg_label": jnp.asarray(
            np.random.RandomState(1).randint(-1, 150, (2, 56, 76)), jnp.int32
        ),
    }
    rng = jax.random.PRNGKey(0)
    state, m = step(state, batch, rng)
    np.asarray(m["loss"])  # compile + settle
    # Best-of-3: the first dispatch after compile pays a one-time
    # executable-load on the tunneled device (~40 s measured), which a
    # single warmup step does not flush.
    n = 10
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            state, m = step(state, batch, rng)
        np.asarray(m["loss"])
        best = min(best, time.perf_counter() - t0)
    train_ips = 2 * n / best
    results.append(
        {"config": "TRAIN resnet50dilated-ppm_deepsup bs2@448x608",
         "fps": round(train_ips, 1)}
    )
    print(f"train step: {train_ips:.1f} img/s", flush=True)

    out = os.path.join(repo, "benchmarks", "zoo_results.json")
    with open(out, "w") as f:
        json.dump({"device": str(jax.devices()[0]), "results": results}, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
