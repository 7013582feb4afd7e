#!/usr/bin/env python3
"""A/B: XLA dilated conv vs an explicit space-to-batch rewrite on TPU.

PERF_NOTES attributes the flagship's remaining headroom (~89 of ~119
TFLOP/s) to the dilated-conv emitter mix in stages 3/4 of
resnet50dilated (dilation 2 and 4 at output-stride 8; reference
models/resnet.py + models.py `_nostride_dilate`). The classic TPU cure
is space-to-batch: a stride-1 conv with dilation d over (N,H,W,C)
equals a DENSE conv over the d*d phase-shifted subgrids stacked into
the batch axis, i.e. (N*d*d, H/d, W/d, C). If XLA's own emitter already
does this internally, the rewrite buys nothing; this script measures
both (plus the dense-d1 ceiling) at the flagship's true shapes so the
decision is evidence, not folklore.

Run on the real chip:  python benchmarks/dilated_conv_ab.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def timed(fn, x, w, iters=20):
    """Best-of-3 wall time of `iters` chained applications under one jit.

    `fn(x, w)` must close over any static config (dilation) itself.
    """

    @jax.jit
    def loop(x, w):
        def body(carry, _):
            y = fn(carry, w)
            # tiny scalar feedback keeps the chain sequential
            carry = carry + jnp.mean(y).astype(carry.dtype) * 1e-6
            return carry, ()

        out, _ = lax.scan(body, x, None, length=iters)
        # Fetch a SCALAR: fetching the full activation over the axon tunnel
        # (~35 MB/s) would swamp the compute being measured (first version
        # of this script read 1.3 TFLOP/s for a 68 TFLOP/s matmul that way).
        return jnp.mean(out)

    float(loop(x, w))  # compile + warmup
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(x, w))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def conv(x, w, dil):
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME", rhs_dilation=(dil, dil),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


def s2b_conv(x, w, d):
    """Space-to-batch dilated conv: exact for SAME padding when H,W % d == 0."""
    n, h, w_, c = x.shape
    # (N,H,W,C) -> (N, H/d, d, W/d, d, C) -> (N*d*d, H/d, W/d, C)
    xr = x.reshape(n, h // d, d, w_ // d, d, c)
    xr = xr.transpose(0, 2, 4, 1, 3, 5).reshape(n * d * d, h // d, w_ // d, c)
    yr = conv(xr, w, 1)
    yr = yr.reshape(n, d, d, h // d, w_ // d, -1).transpose(0, 3, 1, 4, 2, 5)
    return yr.reshape(n, h, w_, -1)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    rng = np.random.RandomState(0)
    # flagship stage shapes at train bucket 512x672, output stride 8 -> 64x84
    cases = [
        ("stage3 d2 256ch", 8, 64, 84, 256, 2),
        ("stage4 d4 512ch", 8, 64, 84, 512, 4),
    ]
    for name, n, h, w_, c, d in cases:
        x = jnp.asarray(rng.randn(n, h, w_, c), jnp.bfloat16)
        wgt = jnp.asarray(rng.randn(3, 3, c, c) * 0.05, jnp.bfloat16)
        flops = 2 * n * h * w_ * c * c * 9
        rows = []
        for label, f in [
            ("dense d1 (ceiling)", lambda x, w: conv(x, w, 1)),
            (f"XLA dilated d{d}", lambda x, w: conv(x, w, d)),
            (f"space-to-batch d{d}", lambda x, w: s2b_conv(x, w, d)),
        ]:
            dt = timed(f, x, wgt)
            rows.append((label, flops / dt / 1e12))
        # numerics: s2b must equal XLA dilated exactly (same conv algebra)
        ref = np.asarray(conv(x, wgt, d), np.float32)
        got = np.asarray(s2b_conv(x, wgt, d), np.float32)
        err = np.max(np.abs(ref - got)) / (np.max(np.abs(ref)) + 1e-9)
        print(f"\n{name}  ({flops/1e9:.1f} GFLOP/step, s2b rel err {err:.1e})")
        for label, tf in rows:
            print(f"  {label:24s} {tf:7.1f} TFLOP/s")


if __name__ == "__main__":
    main()
