#!/usr/bin/env python3
"""Whole-zoo TPU benchmark: MS-protocol fps + forward-level fps per config.

Two measurements per shipped config, honestly labeled (round-4 verdict —
the old single number was a fixed-shape batched forward presented as a
"speedup" against the reference's per-image protocol fps):

* **ms_protocol** — the reference's full 5-scale TTA eval protocol
  (pyramid per image over imgSizes, softmax-average, argmax, metrics)
  run through the deployment engine (device-derived pyramids, packed
  buckets, batch 8) over ORIGINAL shapes sampled from data/
  validation.odgt. Directly comparable to the README's per-arch "MS"
  fps rows (/root/reference/README.md:77-156).
* **forward_level** — chained jitted forwards at a fixed 448x608-class
  resolution, batch 16 (the measured throughput-optimal batch). This is
  a model-forward speed measurement, NOT the reference's per-image
  batch-1 protocol; its reference column (single-scale fps) is a
  different regime and the ratio is labeled accordingly.

Usage: python benchmarks/zoo_bench.py [--iters 20] [--skip-ms]
Writes benchmarks/zoo_results.json INCREMENTALLY (after every config, so
a timeout can't zero the run) and prints a markdown-ish table.
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

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (config name under config/, reference single-scale GPU fps, reference
# multi-scale GPU fps — README.md "Performance" table rows; everything
# else is derived from the YAML itself)
ZOO = [
    ("ade20k-mobilenetv2dilated-c1_deepsup", 17.2, 10.3),
    ("ade20k-resnet18dilated-ppm_deepsup", 11.7, 4.2),
    ("ade20k-resnet50dilated-ppm_deepsup", 8.3, 2.6),
    ("ade20k-resnet101dilated-ppm_deepsup", 6.8, 2.0),
    ("ade20k-resnet50-upernet", 8.4, 2.9),
    ("ade20k-resnet101-upernet", 7.8, 2.3),
    ("ade20k-hrnetv2", 5.8, 1.9),
]

N_IMAGES = 16


def sample_odgt_shapes(n=N_IMAGES, seed=0):
    from semseg_tpu.data.dataset import sample_odgt_shapes as _sample

    return _sample(os.path.join(REPO, "data", "validation.odgt"), n, seed)


def timed_forward_fps(model, variables, h, w, iters, batch):
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


def timed_ms_protocol_fps(c, model, variables, reps=3):
    """Deployment MS protocol: DevicePyramidEngine, packed, batch 8, over
    odgt-sampled original shapes. Returns (best_fps, median_fps)."""
    from semseg_tpu.data.dataset import _effective_lattice
    from semseg_tpu.engine import DevicePyramidEngine, output_stride_for

    rng = np.random.RandomState(0)
    shapes = sample_odgt_shapes()
    originals = [
        rng.randint(0, 255, (oh, ow, 3)).astype(np.uint8)
        for (oh, ow) in shapes
    ]
    labels = [
        rng.randint(-1, 150, (oh, ow)).astype(np.int32)
        for (oh, ow) in shapes
    ]
    engine = DevicePyramidEngine(
        model,
        variables,
        num_class=c.DATASET.num_class,
        output_stride=output_stride_for(c),
        # Throughput lattice (32), kept aligned to the arch's padding
        # constant; the parity-lattice (step 8) protocol number for the
        # flagship lives in bench.py / BENCH artifacts.
        bucket_step=_effective_lattice(32, c.DATASET.padding_constant),
        padding_constant=c.DATASET.padding_constant,
        batch_size=8,
        fetch_dtype="bfloat16",
        img_sizes=c.DATASET.imgSizes,
        img_max_size=c.DATASET.imgMaxSize,
        pack_buckets=True,
    )
    engine.batched_metrics_from_originals(originals, labels)  # compile+warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = engine.batched_metrics_from_originals(originals, labels)
        assert len(out) == N_IMAGES
        times.append(time.perf_counter() - t0)
    ts = np.asarray(times, np.float64)
    return N_IMAGES / float(ts.min()), N_IMAGES / float(np.median(ts))


def write_results(results, meta):
    out = os.path.join(REPO, "benchmarks", "zoo_results.json")
    with open(out, "w") as f:
        json.dump({**meta, "results": results}, f, indent=2)
    return out


def main():
    from semseg_tpu.config import cfg
    from semseg_tpu.models import ModelBuilder, init_variables
    from semseg_tpu.utils.compile_cache import enable_compile_cache

    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--skip-ms", action="store_true",
                        help="forward-level numbers only (fast)")
    parser.add_argument("--budget-s", type=float, default=3000,
                        help="skip remaining configs past this wall clock")
    args = parser.parse_args()

    if jax.default_backend() == "tpu":
        enable_compile_cache()

    t0 = time.monotonic()
    meta = {
        "device": str(jax.devices()[0]),
        "protocol_notes": {
            "ms_protocol": "5-scale TTA over odgt-sampled original shapes; "
                           "device-derived pyramids, packed buckets (step-32 "
                           "lattice), batch 8, on-device metrics. Comparable "
                           "to the reference README's per-arch MS fps.",
            "forward_level": "chained jitted forwards, fixed shape, batch "
                             f"{args.batch}. NOT the reference's per-image "
                             "batch-1 protocol; ratio is a model-forward "
                             "throughput comparison across regimes.",
        },
    }
    results = []
    for name, ref_ss_fps, ref_ms_fps in ZOO:
        if time.monotonic() - t0 > args.budget_s:
            # Skip the WHOLE config — model build + forward compile are
            # exactly the compile-dominated work an external timeout
            # would otherwise kill mid-flight.
            results.append(
                {"config": name, "skipped_over_budget": True}
            )
            print(f"{name:45s} skipped (budget)", flush=True)
            write_results(results, meta)
            continue
        c = cfg.clone()
        c.merge_from_file(os.path.join(REPO, "config", f"{name}.yaml"))
        model = ModelBuilder.build_model(c, dtype=jnp.bfloat16)
        variables = init_variables(
            model, image_size=(c.DATASET.padding_constant * 4,) * 2
        )
        pad = c.DATASET.padding_constant
        h, w = (448 // pad) * pad, (608 // pad) * pad
        fwd_fps = timed_forward_fps(
            model, variables, h, w, args.iters, args.batch
        )
        row = {
            "config": name,
            "forward_level": {
                "resolution": f"{h}x{w}",
                "batch": args.batch,
                "fps": round(fwd_fps, 1),
                "ref_gpu_singlescale_fps": ref_ss_fps,
                "forward_vs_ref_singlescale": round(fwd_fps / ref_ss_fps, 1),
            },
        }
        line = f"{name:45s} fwd {fwd_fps:8.1f} img/s"
        if not args.skip_ms and time.monotonic() - t0 < args.budget_s:
            try:
                ms_best, ms_median = timed_ms_protocol_fps(c, model, variables)
                row["ms_protocol"] = {
                    "fps": round(ms_best, 2),
                    "fps_median": round(ms_median, 2),
                    "ref_gpu_ms_fps": ref_ms_fps,
                    "speedup_vs_ref_ms": round(ms_best / ref_ms_fps, 2),
                }
                line += (f"  MS {ms_best:6.2f} img/s "
                         f"({ms_best / ref_ms_fps:5.2f}x ref MS {ref_ms_fps})")
            except Exception as e:  # keep the sweep alive; report loudly
                row["ms_protocol"] = {
                    "error": f"{type(e).__name__}: {e}"[:300]
                }
                line += f"  MS FAILED: {type(e).__name__}"
        elif not args.skip_ms:
            row["ms_protocol"] = {"skipped_over_budget": True}
            line += "  MS skipped (budget)"
        results.append(row)
        print(line, flush=True)
        write_results(results, meta)  # incremental: a timeout keeps the rest

    # Train-step throughput for the flagship config (global batch 2,
    # the reference's batch_size_per_gpu).
    from semseg_tpu.parallel import create_train_state, jitted_train_step

    c = cfg.clone()
    c.merge_from_file(
        os.path.join(REPO, "config", "ade20k-resnet50dilated-ppm_deepsup.yaml")
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
        t0b = time.perf_counter()
        for _ in range(n):
            state, m = step(state, batch, rng)
        np.asarray(m["loss"])
        best = min(best, time.perf_counter() - t0b)
    train_ips = 2 * n / best
    results.append(
        {"config": "TRAIN resnet50dilated-ppm_deepsup bs2@448x608",
         "fps": round(train_ips, 1)}
    )
    print(f"train step: {train_ips:.1f} img/s", flush=True)
    out = write_results(results, meta)
    print(f"wrote {out}", flush=True)
    # The engines' uploader threads can hang interpreter teardown on the
    # tunneled device; everything is already written.
    os._exit(0)


if __name__ == "__main__":
    main()
