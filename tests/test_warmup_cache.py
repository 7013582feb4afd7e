"""Warmup-cache tool: a warmed shape must be a cache HIT for the real
sharded train step (tools/warmup_cache.py + utils/compile_cache.py) —
including the grad-accum program, whose microbatched layout changes the
cache key."""

import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = textwrap.dedent(
    """
    import functools, logging, os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from semseg_tpu.config import cfg
    from semseg_tpu.models import ModelBuilder, init_variables
    from semseg_tpu.parallel.mesh import (
        batch_sharding, make_mesh, replicate_state, shard_batch,
    )
    from semseg_tpu.parallel.train_step import (
        create_train_state, stack_microbatches, train_step,
    )
    from semseg_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache(sys.argv[1], min_compile_secs=0.0)
    accum = int(sys.argv[3])
    c = cfg.clone()
    c.MODEL.arch_encoder = "mobilenetv2dilated"
    c.MODEL.arch_decoder = "c1_deepsup"
    c.MODEL.fc_dim = 320
    c.TPU.compute_dtype = "float32"
    model = ModelBuilder.build_model(c, dtype=jnp.float32)
    variables = init_variables(model, seed=0, image_size=(64, 64))
    state = create_train_state(c, model, variables)
    mesh = make_mesh(2)
    state = replicate_state(mesh, state)
    step = jax.jit(
        functools.partial(train_step, grad_accum=accum), donate_argnums=(0,)
    )
    h = w = 64
    n = 2  # global (micro)batch
    if sys.argv[2] == "warm":
        # Exactly what tools/warmup_cache.py lowers: global batch with the
        # mesh sharding, uint8 raw transport (TPU.device_preproc default),
        # leading replicated microbatch axis when accum > 1.
        def spec(shape, dtype):
            if accum > 1:
                shape = (accum,) + shape
            return jax.ShapeDtypeStruct(
                shape, dtype,
                sharding=batch_sharding(mesh, len(shape), accum > 1),
            )
        batch = {
            "img_data": spec((n, h, w, 3), jnp.uint8),
            "seg_label": spec((n, h // 8, w // 8), jnp.int32),
            "img_valid_hw": spec((n, 2), jnp.int32),
        }
        step.lower(state, batch, jax.random.PRNGKey(0)).compile()
        print("warmed")
    else:
        logging.basicConfig(stream=sys.stderr, level=logging.DEBUG)
        logging.getLogger("jax._src.compiler").setLevel(logging.DEBUG)
        rng = np.random.RandomState(0)
        host = {
            "img_data": rng.randint(0, 256, (n * accum, h, w, 3)).astype(np.uint8),
            "seg_label": rng.randint(-1, 150, (n * accum, h // 8, w // 8)).astype(np.int32),
            "img_valid_hw": np.tile([[h, w]], (n * accum, 1)).astype(np.int32),
        }
        if accum > 1:
            host = stack_microbatches(host, accum)
        batch = shard_batch(mesh, host, microbatched=accum > 1)
        s, m = step(state, batch, jax.random.PRNGKey(0))
        print("loss", float(m["loss"]))
    """
)


def _run(cache_dir, mode, accum):
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD, cache_dir, mode, str(accum)],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    return proc


@pytest.mark.parametrize("accum", [1, 2])
def test_warmed_shape_is_cache_hit(tmp_path, accum):
    cache_dir = str(tmp_path / "xla")
    warm = _run(cache_dir, "warm", accum)
    assert "warmed" in warm.stdout
    assert os.listdir(cache_dir)
    run = _run(cache_dir, "run", accum)
    assert "loss" in run.stdout
    # The real sharded step must deserialize, not recompile. (Covers any
    # jit naming of the partial-wrapped step.)
    misses = [
        line for line in run.stderr.splitlines()
        if "CACHE MISS" in line and "train_step" in line
    ]
    assert not misses, misses
