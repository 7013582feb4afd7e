"""Warmup-cache tool: a warmed shape must be a cache HIT for the real
sharded train step (tools/warmup_cache.py + utils/compile_cache.py)."""

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = textwrap.dedent(
    """
    import logging, os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    from semseg_tpu.config import cfg
    from semseg_tpu.models import ModelBuilder, init_variables
    from semseg_tpu.parallel.mesh import make_mesh, replicate_state, shard_batch
    from semseg_tpu.parallel.train_step import create_train_state, train_step
    from semseg_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache(sys.argv[1], min_compile_secs=0.0)
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
    step = jax.jit(train_step, donate_argnums=(0,))
    h = w = 64
    if sys.argv[2] == "warm":
        # Exactly what tools/warmup_cache.py lowers: global batch with the
        # mesh sharding, uint8 raw transport (TPU.device_preproc default).
        sh = NamedSharding(mesh, P("data"))
        batch = {
            "img_data": jax.ShapeDtypeStruct((2, h, w, 3), jnp.uint8, sharding=sh),
            "seg_label": jax.ShapeDtypeStruct((2, h // 8, w // 8), jnp.int32, sharding=sh),
            "img_valid_hw": jax.ShapeDtypeStruct((2, 2), jnp.int32, sharding=sh),
        }
        step.lower(state, batch, jax.random.PRNGKey(0)).compile()
        print("warmed")
    else:
        logging.basicConfig(stream=sys.stderr, level=logging.DEBUG)
        logging.getLogger("jax._src.compiler").setLevel(logging.DEBUG)
        rng = np.random.RandomState(0)
        batch = shard_batch(mesh, {
            "img_data": rng.randint(0, 256, (2, h, w, 3)).astype(np.uint8),
            "seg_label": rng.randint(-1, 150, (2, h // 8, w // 8)).astype(np.int32),
            "img_valid_hw": np.array([[h, w], [h, w]], np.int32),
        })
        s, m = step(state, batch, jax.random.PRNGKey(0))
        print("loss", float(m["loss"]))
    """
)


def _run(cache_dir, mode):
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD, cache_dir, mode],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    return proc


def test_warmed_shape_is_cache_hit(tmp_path):
    cache_dir = str(tmp_path / "xla")
    warm = _run(cache_dir, "warm")
    assert "warmed" in warm.stdout
    assert os.listdir(cache_dir)
    run = _run(cache_dir, "run")
    assert "loss" in run.stdout
    # The real sharded step must deserialize, not recompile.
    assert "CACHE MISS for 'jit_train_step'" not in run.stderr, (
        run.stderr[-3000:]
    )
