"""Persistent XLA compilation cache (semseg_tpu/utils/compile_cache.py).

The compile-budget measurements (PERF_NOTES) put a 30-55 min one-time cost
on a fresh process compiling the train bucket lattice; the cache must
actually persist executables across processes for that cost to amortize.
"""

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = textwrap.dedent(
    """
    import logging, sys
    import jax, jax.numpy as jnp
    jax.config.update("jax_platforms", "cpu")
    from semseg_tpu.utils.compile_cache import enable_compile_cache

    # min_compile_secs=0: the toy program compiles in well under the
    # production 0.5 s gate on CPU (real model programs take 27-51 s).
    d = enable_compile_cache(sys.argv[1], min_compile_secs=0.0)
    assert d == sys.argv[1], d

    # jax logs 'PERSISTENT COMPILATION CACHE MISS'/'HIT' per program.
    logging.basicConfig(stream=sys.stderr, level=logging.DEBUG)
    logging.getLogger("jax._src.compiler").setLevel(logging.DEBUG)

    @jax.jit
    def f(x):
        for _ in range(6):
            x = jax.lax.conv_general_dilated(
                x, jnp.ones((3, 3, 8, 8), x.dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        return x.sum()

    f(jnp.ones((2, 64, 64, 8), jnp.float32)).block_until_ready()
    """
)


def _run_child(cache_dir):
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD, cache_dir],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr
    return proc.stderr


def test_cache_persists_across_processes(tmp_path):
    cache_dir = str(tmp_path / "xla")
    cold = _run_child(cache_dir)
    assert "CACHE MISS for 'jit_f'" in cold, cold[-2000:]
    assert os.listdir(cache_dir), "first process wrote no cache entries"
    warm = _run_child(cache_dir)
    # The warm process must deserialize 'jit_f' instead of recompiling.
    assert "CACHE MISS for 'jit_f'" not in warm, warm[-2000:]


def test_off_switch():
    from semseg_tpu.utils.compile_cache import enable_compile_cache

    assert enable_compile_cache("off") == ""


def test_default_dir_is_host_namespaced(tmp_path, monkeypatch):
    """The default cache dir embeds the CPU fingerprint (stable per host);
    explicit paths are used verbatim. Guards the cross-host SIGILL hazard
    documented on host_fingerprint()."""
    from semseg_tpu.utils import compile_cache as cc

    fp = cc.host_fingerprint()
    assert fp == cc.host_fingerprint() and len(fp) == 10
    monkeypatch.setattr(cc, "DEFAULT_DIR", str(tmp_path / "xla"))
    got = cc.enable_compile_cache("")
    assert got == str(tmp_path / "xla" / fp) and os.path.isdir(got)
    explicit = str(tmp_path / "explicit")
    assert cc.enable_compile_cache(explicit) == explicit
