#!/usr/bin/env python3
"""Benchmark: ADE20K-style inference throughput on the flagship model.

Measures single-chip images/sec for ResNet50-dilated + PPM-deepsup
single-scale inference at the reference's canonical eval resolution (short
side 450, the middle of imgSizes, rounded to the padding lattice), at the
throughput-optimal device batch (4 — batch-1 conv inference leaves the MXU
underfed; the eval engine batches same-bucket images, so this is the real
deployment shape). Baseline: the reference's single-GPU fps for the same
model/protocol: 8.3 fps on a Pascal Titan Xp (README.md:113-116,
BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_FPS = 8.3  # ResNet50dilated + PPM_deepsup, single-scale, Titan Xp


def main():
    from semseg_tpu.config import cfg
    from semseg_tpu.models import ModelBuilder, init_variables

    c = cfg.clone()
    c.MODEL.arch_encoder = "resnet50dilated"
    c.MODEL.arch_decoder = "ppm_deepsup"
    c.MODEL.fc_dim = 2048

    model = ModelBuilder.build_model(c, dtype=jnp.bfloat16)
    variables = init_variables(model, seed=0, image_size=(64, 64))

    # ADE20K val mean size is ~ 450x600 at the 450 short-side scale; use the
    # bucketed shape the eval engine would run (multiples of 32).
    h, w = 448, 608
    batch = 4

    iters = 20

    # The whole timing loop lives inside ONE jit (lax.scan with a data
    # dependency between iterations): per-dispatch RPC overhead is excluded
    # and XLA cannot elide any forward.
    @jax.jit
    def timed_forwards(variables, img):
        def body(carry, _):
            logits = model.apply(variables, carry, train=False)
            # feed a scalar of the output back into the next input so the
            # chain is sequential and un-removable
            carry = carry + jnp.mean(logits).astype(carry.dtype) * 1e-6
            return carry, jnp.mean(logits)

        _, means = jax.lax.scan(body, img, None, length=iters)
        return means

    img = jnp.asarray(
        np.random.RandomState(0).randn(batch, h, w, 3), jnp.float32
    )

    np.asarray(timed_forwards(variables, img))  # compile + warmup
    dt = float("inf")
    for _ in range(3):  # best-of-3: the tunneled device link is noisy
        t0 = time.perf_counter()
        np.asarray(timed_forwards(variables, img))  # host fetch forces completion
        dt = min(dt, time.perf_counter() - t0)

    fps = batch * iters / dt
    print(
        json.dumps(
            {
                "metric": "resnet50dilated+ppm_deepsup single-scale inference",
                "value": round(fps, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(fps / BASELINE_FPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
