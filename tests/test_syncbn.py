"""SyncBN equivalence oracle (SURVEY.md §4).

The reference validates its SynchronizedBatchNorm by checking that
multi-device BN on a split batch equals single-device BN on the full batch
(test_sync_batchnorm.py:44-107, needs 2 physical GPUs). Here the same oracle
runs on a virtual 8-device CPU mesh, for both TPU execution styles:

* explicit SPMD: ``shard_map`` + ``axis_name`` → fused psum of (sum,ssum,n);
* GSPMD: ``jit`` with a batch-sharded NamedSharding and *no* axis_name —
  the global-view reduction is already synchronized.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from semseg_tpu.ops.norm import batch_norm_train, batch_norm_inference


@pytest.fixture
def data(rng):
    x = rng.randn(8, 6, 5, 16).astype(np.float32)
    scale = rng.rand(16).astype(np.float32) + 0.5
    bias = rng.randn(16).astype(np.float32)
    return x, scale, bias


def reference_single_device(x, scale, bias):
    return batch_norm_train(
        jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias),
        jnp.zeros(16), jnp.ones(16), jnp.ones(()),
    )


def test_shard_map_psum_equals_single_device(data):
    x, scale, bias = data
    y_ref, m_ref, v_ref, i_ref = reference_single_device(x, scale, bias)

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))

    def per_device(x, scale, bias):
        return batch_norm_train(
            x, scale, bias, jnp.zeros(16), jnp.ones(16), jnp.ones(()),
            axis_name="data",
        )

    f = jax.jit(
        jax.shard_map(
            per_device,
            mesh=mesh,
            in_specs=(P("data"), P(), P()),
            out_specs=(P("data"), P(), P(), P()),
        )
    )
    y, m, v, i = f(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias))

    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(i), np.asarray(i_ref), atol=1e-6)


def test_gspmd_sharded_batch_equals_single_device(data):
    x, scale, bias = data
    y_ref, m_ref, v_ref, _ = reference_single_device(x, scale, bias)

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("data")))

    @jax.jit
    def run(x, scale, bias):
        return batch_norm_train(
            x, scale, bias, jnp.zeros(16), jnp.ones(16), jnp.ones(()),
        )

    y, m, v, _ = run(xs, jnp.asarray(scale), jnp.asarray(bias))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref), atol=1e-5)


def test_reference_stat_rules(rng):
    """Oracle test of the exact batchnorm.py:123-139 statistics rules."""
    x = rng.randn(4, 3, 3, 8).astype(np.float32)
    scale = np.ones(8, np.float32)
    bias = np.zeros(8, np.float32)
    rm, rv, ri = np.zeros(8, np.float32), np.ones(8, np.float32), np.float32(1.0)
    momentum, eps = 0.001, 1e-5

    y, m2, v2, i2 = batch_norm_train(
        jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias),
        jnp.asarray(rm), jnp.asarray(rv), jnp.asarray(ri),
        momentum=momentum, eps=eps,
    )

    flat = x.reshape(-1, 8).astype(np.float64)
    n = flat.shape[0]
    mean = flat.mean(0)
    bias_var = flat.var(0)
    unbias_var = flat.var(0, ddof=1)

    # Normalization uses sqrt(max(biased var, eps)) — NOT var + eps.
    inv_std = 1.0 / np.sqrt(np.maximum(bias_var, eps))
    expected_y = (flat - mean) * inv_std
    np.testing.assert_allclose(
        np.asarray(y).reshape(-1, 8), expected_y, atol=1e-4
    )

    # Bias-corrected EMA accumulators.
    keep = 1 - momentum
    tmp_mean = rm * 1.0 * keep + mean
    tmp_var = rv * 1.0 * keep + unbias_var
    new_iter = 1.0 * keep + 1
    np.testing.assert_allclose(np.asarray(i2), new_iter, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m2), tmp_mean / new_iter, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v2), tmp_var / new_iter, atol=1e-5)


def test_inference_matches_torch_semantics(rng):
    """Eval path: (x - rm) / sqrt(rv + eps) * w + b (F.batch_norm)."""
    import torch
    import torch.nn.functional as F

    x = rng.randn(2, 5, 5, 8).astype(np.float32)
    scale = rng.rand(8).astype(np.float32)
    bias = rng.randn(8).astype(np.float32)
    rm = rng.randn(8).astype(np.float32)
    rv = rng.rand(8).astype(np.float32) + 0.1

    ours = batch_norm_inference(
        jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias),
        jnp.asarray(rm), jnp.asarray(rv),
    )
    theirs = F.batch_norm(
        torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
        torch.from_numpy(rm), torch.from_numpy(rv),
        torch.from_numpy(scale), torch.from_numpy(bias),
        training=False, eps=1e-5,
    ).numpy()
    np.testing.assert_allclose(
        np.transpose(np.asarray(ours), (0, 3, 1, 2)), theirs, atol=1e-5
    )
