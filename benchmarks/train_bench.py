#!/usr/bin/env python
"""Training-step throughput benchmark (single chip), with A/B knobs.

Measures steady-state images/sec and effective TFLOP/s of the full jitted
train step (forward + loss + backward + two-group SGD + BN stat update,
donated buffers) for the flagship resnet50dilated+ppm_deepsup at a
representative train-batch shape, across batch sizes and remat on/off.

Timing rule for the axon-tunneled TPU (PERF_NOTES.md): never trust
dispatch-loop wall time — ``block_until_ready`` returns early through this
link. Steps are chained through the donated TrainState (true data
dependency), and a scalar fetch from the FINAL state is the completion
barrier; best-of-3 guards against transient link degradation.

Usage: python benchmarks/train_bench.py [--shape 512 672] [--steps 12]
Prints one JSON line per (batch, remat) config.
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", type=int, nargs=2, default=(512, 672),
                    help="train batch H W (bucket-64 lattice)")
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--batches", type=int, nargs="+", default=[2, 4, 8, 16])
    ap.add_argument("--grad-accum", type=int, nargs="+", default=[1],
                    help="TPU.grad_accum values; --batches stays the TOTAL "
                         "images per optimizer step (microbatch = batch/K)")
    ap.add_argument("--no-remat", action="store_true",
                    help="skip the remat=True sweep")
    ap.add_argument("--arch", default="resnet50dilated")
    ap.add_argument("--decoder", default="ppm_deepsup")
    ap.add_argument("--fc-dim", type=int, default=2048)
    ap.add_argument("--segm-ds", type=int, default=0,
                    help="label downsampling rate (0 = infer: 8 for dilated "
                         "output-stride-8 encoders, 4 for stride-4 "
                         "hrnet/upernet configs — the reference yamls' "
                         "segm_downsampling_rate)")
    args = ap.parse_args()
    segm_ds = args.segm_ds or (8 if "dilated" in args.arch else 4)

    from semseg_tpu.config import cfg
    from semseg_tpu.models import ModelBuilder, init_variables
    from semseg_tpu.parallel.train_step import (
        create_train_state,
        jitted_train_step,
    )

    h, w = args.shape
    results = []
    for b in args.batches:
        for k in args.grad_accum:
            if b % k:
                print(json.dumps({
                    "batch": b, "grad_accum": k,
                    "skipped": "batch not divisible by grad_accum",
                }), flush=True)
    for remat in ((False,) if args.no_remat else (False, True)):
        for batch, accum in (
            (b, k) for b in args.batches for k in args.grad_accum
            if b % k == 0
        ):
            c = cfg.clone()
            c.MODEL.arch_encoder = args.arch
            c.MODEL.arch_decoder = args.decoder
            c.MODEL.fc_dim = args.fc_dim
            c.DATASET.segm_downsampling_rate = segm_ds
            c.TPU.remat = remat
            c.TPU.compute_dtype = "bfloat16"

            model = ModelBuilder.build_model(c, dtype=jnp.bfloat16)
            variables = init_variables(model, seed=0, image_size=(64, 64))
            state = create_train_state(c, model, variables)
            step_fn = jitted_train_step(accum)

            rng = np.random.RandomState(0)
            ds = c.DATASET.segm_downsampling_rate
            # Build on the HOST, reshape (stack_microbatches is host-side),
            # then upload ONCE — uploading first would bounce the whole
            # batch device->host->device over the slow tunneled link.
            batch_d = {
                "img_data": rng.randn(batch, h, w, 3).astype(np.float32),
                "seg_label": rng.randint(
                    -1, 150, (batch, h // ds, w // ds)
                ).astype(np.int32),
            }
            if accum > 1:
                from semseg_tpu.parallel.train_step import stack_microbatches

                batch_d = stack_microbatches(batch_d, accum)
            batch_d = jax.tree.map(jnp.asarray, batch_d)
            key = jax.random.PRNGKey(0)

            try:
                # AOT-compile once; cost_analysis gives the exact FLOPs of
                # the whole step on this backend.
                t0 = time.perf_counter()
                compiled = step_fn.lower(state, batch_d, key).compile()
                compile_s = time.perf_counter() - t0
                flops = None
                try:
                    cost = compiled.cost_analysis()
                    ca = cost[0] if isinstance(cost, (list, tuple)) else cost
                    if ca:
                        flops = ca.get("flops")
                        # cost_analysis counts a lax.scan body ONCE, not
                        # x trip-count (measured: reported flops halve at
                        # grad_accum=2). The non-scanned epilogue (optimizer
                        # update) is orders of magnitude below the conv
                        # flops, so scaling by K is accurate to ~1%.
                        if flops and accum > 1:
                            flops *= accum
                except Exception:
                    flops = None
                step_fn = compiled

                state, metrics = step_fn(state, batch_d, key)
                float(metrics["loss"])  # warmup barrier

                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    for _ in range(args.steps):
                        state, metrics = step_fn(state, batch_d, key)
                    float(metrics["loss"])  # chain barrier
                    best = min(best, time.perf_counter() - t0)
                img_s = batch * args.steps / best
                tflops = (
                    round(flops * args.steps / best / 1e12, 1)
                    if flops
                    else None
                )
                rec = {
                    "batch": batch,
                    "remat": remat,
                    "grad_accum": accum,
                    "shape": [h, w],
                    "img_per_s": round(img_s, 1),
                    "step_s": round(best / args.steps, 4),
                    "compile_s": round(compile_s, 1),
                    "tflop_per_s": tflops,
                }
            except Exception as e:  # OOM etc: record and continue
                rec = {
                    "batch": batch,
                    "remat": remat,
                    "grad_accum": accum,
                    "shape": [h, w],
                    "error": f"{type(e).__name__}: {str(e)[:200]}",
                }
            print(json.dumps(rec), flush=True)
            results.append(rec)


if __name__ == "__main__":
    main()
