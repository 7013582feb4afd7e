"""Accumulation-dtype policy for the ops layer.

TPU compute runs in bfloat16 with float32 accumulation (the standard MXU
recipe). The float64 parity oracles (tests/train_parity_driver.py) run the
same ops under ``jax_enable_x64`` — there the accumulators must NOT round
through float32, or cross-framework comparisons bottom out at ~1e-4 instead
of ~1e-12.
"""

from __future__ import annotations

import jax.numpy as jnp


def acc_dtype(dtype):
    """float64 stays float64; everything else accumulates in float32."""
    return jnp.float64 if dtype == jnp.float64 else jnp.float32
