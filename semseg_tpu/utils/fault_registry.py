"""Persistent registry of compiled-program shapes a backend faults on.

The experimental axon TPU runtime kernel-faults on specific compiled
forward shapes (PERF_NOTES "Step-8 lattice worker fault"), and the
faulty family is irregular — probing found (304, 400/408/416),
(312, 400), (320, 400) and (336, 432) dead while (304, 432) and
(320, 416) are clean, so no closed-form rule covers it. The engines
route around the statically-known set (``engine.AXON_FAULT_BUCKETS``)
PLUS whatever this registry has learned on this host: when an eval run
crashes on a fresh faulty shape, the crash handler attributes it (via
subprocess probes, ``tools/fault_probe.py`` logic), records it here,
and the next run routes around it automatically — the "learn once,
never crash twice" contract a production inference service needs on a
platform with codegen faults.

The registry is per-backend-platform JSON under the user cache dir.
Writes are atomic (tempfile + rename) so concurrent engines can't tear
the file; merges are last-writer-wins per shape, which is safe because
entries are only ever added.

Reference analogue: none (the reference's CUDA stack has no equivalent
fault class; this subsystem is platform-hardening for TPU runtimes).
"""

from __future__ import annotations

import json
import os
import tempfile

DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "semseg_tpu", "fault_buckets"
)

# Exception texts that identify a dead/crashed device worker (vs an
# ordinary user error). Matched case-insensitively against str(exc).
_CRASH_MARKERS = (
    "worker process crashed",
    "kernel fault",
    "tpu backend error",
    "backend error (internal)",
)


def is_worker_crash(exc: BaseException) -> bool:
    """True if the exception looks like a device-worker crash/restart."""
    s = str(exc).lower()
    return any(m in s for m in _CRASH_MARKERS)


def registry_path(platform: str, base_dir: str = "") -> str:
    return os.path.join(base_dir or DEFAULT_DIR, f"{platform}.json")


def load(platform: str, base_dir: str = "") -> dict:
    """Full registry: {"HxW": {meta}}; empty dict if absent/corrupt."""
    try:
        with open(registry_path(platform, base_dir)) as f:
            data = json.load(f)
        return data if isinstance(data, dict) else {}
    except (OSError, ValueError):
        return {}


def known_buckets(platform: str, base_dir: str = "") -> frozenset:
    """Learned faulty (H, W) bucket shapes for ``platform``."""
    out = set()
    for key in load(platform, base_dir):
        try:
            h, w = (int(v) for v in key.split("x"))
            out.add((h, w))
        except ValueError:
            continue
    return frozenset(out)


def record(shapes, platform: str, meta: dict | None = None,
           base_dir: str = "") -> str:
    """Merge newly-learned faulty shapes into the registry (atomic)."""
    path = registry_path(platform, base_dir)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    data = load(platform, base_dir)
    for (h, w) in shapes:
        key = f"{int(h)}x{int(w)}"
        entry = dict(meta or {})
        entry.setdefault("source", "runtime-learned")
        data.setdefault(key, entry)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".json")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(data, f, indent=1, sort_keys=True)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    return path
