"""Persistent XLA compilation cache across processes.

The train bucket lattice compiles ~69 distinct (H, W) shapes per epoch and
the parity eval lattice ~441 (PERF_NOTES.md "compile budget"); at 27-51 s
per train-step compile that is a 30-55 min one-time cost PER FRESH PROCESS.
The reference never pays this (torch is eager), so amortizing it is part of
matching its usability: with a persistent cache the lattice compiles once
per (model, shape) EVER on a given host, and every later process — resumes,
eval runs, multi-epoch restarts — deserializes executables in seconds.

This wraps jax's built-in persistent compilation cache
(``jax_compilation_cache_dir``). We lower the min-compile-time gate so even
small eval programs (embed/accumulate/metrics, ~1 s compiles that still pay
a tunnel round-trip) are cached.

Reference analogue: none (no compiled artifacts exist in
/root/reference — this subsystem is TPU-specific).
"""

import logging
import os

DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "semseg_tpu", "xla_cache"
)


def host_fingerprint() -> str:
    """CPU-capability namespace for the default cache dir.

    XLA's persistent-cache key does NOT include the target machine's CPU
    features: a CPU executable serialized on a host with, say, AMX/AVX-512
    extensions and deserialized on one without loads with an XLA warning
    ("could lead to execution errors such as SIGILL") and may crash. Jobs
    migrate across heterogeneous hosts between runs while ``~/.cache``
    persists, so the DEFAULT cache dir is namespaced by a hash of the
    host's CPU identity; explicit ``TPU.compile_cache`` paths are
    used verbatim. TPU executables are unaffected either way (their key
    covers the TPU platform/version) — a host change merely recompiles.

    The namespace key includes the CPU *model* (vendor/family/model/
    stepping/microcode), not just the feature flags: LLVM derives
    model-based tuning features (e.g. ``+prefer-no-gather`` on
    gather-slow Intel models) from CPUID, so two hosts with identical
    cpuinfo ``flags`` lines can still produce mutually-incompatible
    XLA:CPU AOT artifacts (observed as cpu_aot_loader "machine feature
    +prefer-no-gather is not supported" spam + forced recompiles when
    the flags-only namespace was shared across the fleet).
    """
    import hashlib
    import platform

    feats = ""
    ident = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                key_, _, val = line.partition(":")
                key_ = key_.strip()
                # x86 lists capabilities under "flags", aarch64 under
                # "Features"; either way the feature set varies between
                # hosts.
                if not feats and key_ in ("flags", "Features"):
                    feats = " ".join(sorted(val.split()))
                # Model identity: captures LLVM's CPUID-derived tuning
                # features that the flags line does not reflect.
                elif key_ in ("vendor_id", "cpu family", "model",
                              "model name", "stepping", "microcode",
                              "CPU implementer", "CPU part",
                              "CPU variant", "CPU revision"):
                    ident.append(f"{key_}={val.strip()}")
                elif key_ == "processor" and ident:
                    break  # one core is enough
    except OSError:
        pass
    if not feats and not ident:
        # Non-Linux / unreadable cpuinfo: fall back to the coarsest stable
        # host identity available rather than sharing one namespace.
        feats = platform.processor() or platform.platform()
    key = f"{platform.machine()}:{';'.join(ident)}:{feats}"
    return hashlib.sha1(key.encode()).hexdigest()[:10]


def enable_compile_cache(path: str = "", *, min_compile_secs: float = 0.5) -> str:
    """Turn on jax's persistent compilation cache; returns the cache dir.

    ``path`` semantics (mirrors ``cfg.TPU.compile_cache``):
      * ``""``      — default user cache dir
        (``~/.cache/semseg_tpu/xla_cache/<cpu-fingerprint>``, see
        ``host_fingerprint``)
      * ``"off"``   — disabled; returns ""
      * otherwise   — explicit directory

    ``min_compile_secs``: only programs whose compile took at least this
    long are persisted. The 0.5 s default (vs jax's 1 s) keeps the small
    eval epilogue programs too; every train-step/forward program is far
    above it (27-51 s measured).
    """
    if path == "off":
        return ""
    import jax

    cache_dir = path or os.path.join(DEFAULT_DIR, host_fingerprint())
    try:
        os.makedirs(cache_dir, exist_ok=True)
    except OSError as e:
        # Read-only HOME / batch sandbox: the cache is an optimization, not
        # a requirement — degrade to disabled rather than failing the run.
        logging.getLogger("Logger").warning(
            "compilation cache disabled (cannot create %s: %s)", cache_dir, e
        )
        return ""
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", min_compile_secs
    )
    logging.getLogger("Logger").debug(
        "persistent XLA compilation cache at %s", cache_dir
    )
    return cache_dir
