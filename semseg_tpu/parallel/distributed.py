"""Multi-host (multi-process) training support.

The reference is strictly single-node (SURVEY.md §2.3: the vendored
DistributedSampler is never imported; ``setup_logger``'s rank argument is a
TODO). This module supplies the TPU-native multi-host path: one Python
process per host, all chips in one global mesh, GSPMD collectives over
ICI/DCN. Nothing else in the framework changes — the train step is already
written against the global mesh.

Usage (one process per host, e.g. under a TPU pod slice):

    from semseg_tpu.parallel.distributed import initialize
    initialize()                      # jax.distributed handshake
    mesh = make_mesh()                # now spans every chip in the slice

Data: each process feeds only its addressable shard of the global batch —
``local_batch_slice`` gives the per-process slice, and
``process_seed`` de-correlates the per-host TrainDataset streams.
"""

from __future__ import annotations

import logging
import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger("Logger")


def _client():
    """The live jax.distributed client, or None.

    jax._src is unstable API; if the probe location moves in a future jax,
    treat the client as absent rather than crashing --multihost startup.
    """
    try:
        from jax._src import distributed as _jax_distributed

        return getattr(_jax_distributed.global_state, "client", None)
    except (ImportError, AttributeError):
        return None


def initialize(coordinator_address=None, num_processes=None, process_id=None,
               initialization_timeout=None):
    """jax.distributed handshake.

    Explicit coordinator arguments (or the SEMSEG_COORDINATOR /
    SEMSEG_NUM_PROCESSES / SEMSEG_PROCESS_ID environment variables) make the
    handshake MANDATORY — any failure raises. Without them, TPU-environment
    auto-detection is attempted; if it fails the single-process fallback is
    logged loudly (a pod job silently training N disjoint 1/N-sized models
    is the failure mode this guards against).
    """
    # NOTE: must not touch backend-initializing APIs (jax.process_count,
    # jax.devices, ...) before the handshake — the distributed client has to
    # come up first. Detect an existing client via the runtime state object,
    # which lives at jax._src.distributed.global_state on current jax (it is
    # not re-exported under jax.distributed; probe defensively since
    # jax._src is unstable API — on a miss we just attempt initialization).
    if _client() is not None:
        return  # already initialized

    coordinator_address = coordinator_address or os.environ.get(
        "SEMSEG_COORDINATOR"
    )
    if num_processes is None and "SEMSEG_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["SEMSEG_NUM_PROCESSES"])
    if process_id is None and "SEMSEG_PROCESS_ID" in os.environ:
        process_id = int(os.environ["SEMSEG_PROCESS_ID"])

    if coordinator_address is None and num_processes is None:
        # Rely on TPU environment auto-detection.
        try:
            jax.distributed.initialize()
        except Exception as e:
            logger.warning(
                "jax.distributed auto-initialization failed (%s); continuing "
                "SINGLE-PROCESS. If this is a pod job, pass explicit "
                "coordinator_address/num_processes (or SEMSEG_COORDINATOR/"
                "SEMSEG_NUM_PROCESSES/SEMSEG_PROCESS_ID).",
                e,
            )
            return
    else:
        # Explicit request: failures propagate.
        kw = {}
        if initialization_timeout is not None:
            kw["initialization_timeout"] = initialization_timeout
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kw,
        )
    if num_processes is not None and jax.process_count() != num_processes:
        raise RuntimeError(
            f"jax.distributed came up with {jax.process_count()} processes, "
            f"expected {num_processes}"
        )
    logger.info(
        "jax.distributed initialized: process %d/%d, %d local / %d global "
        "devices",
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )


def is_primary() -> bool:
    """True on the process that should log / checkpoint."""
    return jax.process_index() == 0


def process_seed(base_seed: int, worker: int = 0) -> int:
    """De-correlated per-host, per-worker data seed."""
    return base_seed * 100_003 + jax.process_index() * 1_009 + worker


def global_batch_size(per_device: int) -> int:
    return per_device * jax.device_count()


def local_batch_slice(per_device: int) -> slice:
    """The slice of the global batch this process must materialize."""
    local = per_device * jax.local_device_count()
    start = jax.process_index() * local
    return slice(start, start + local)


# Pad value per train-batch key: image padding is zeros, label padding is
# ignore (-1) — identical to the within-batch aspect padding TrainDataset
# already applies, so the loss/metrics mask it out.
_PAD_VALUE = {"img_data": 0.0, "seg_label": -1}


_canvas_sync_seq = 0


def _exchange_dims(dims: np.ndarray) -> np.ndarray:
    """Cross-process elementwise max of ``dims``, WITHOUT a device
    collective.

    Runs through the coordination-service KV store (host-side RPCs), so it
    is safe to call from the prefetch thread: device collectives must
    launch in the same order on every process (interleaving one from a
    background thread against the step stream deadlocks a pod), but KV
    traffic has no such constraint. Every process must call this in the
    same sequence — guaranteed here because each consumes its batch stream
    in lockstep. Keys are tiny strings; one epoch leaves ~epoch_iters of
    them on the coordinator, which is negligible.
    """
    global _canvas_sync_seq
    client = _client()
    seq = _canvas_sync_seq
    _canvas_sync_seq += 1
    if client is None:
        # No KV client in a multi-process run (jax moved global_state?).
        # Do NOT fall back to multihost_utils.process_allgather here: that
        # is a DEVICE collective, and this function runs on the prefetch
        # thread — interleaving it with the step stream's collectives is
        # exactly the launch-order deadlock this KV path exists to avoid.
        raise RuntimeError(
            "multi-process canvas exchange needs the coordination-service "
            "KV client, which could not be reached on this jax version; "
            "see _client() in semseg_tpu/parallel/distributed.py"
        )

    base = f"semseg/canvas_dims/{seq}"
    client.key_value_set(
        f"{base}/{jax.process_index()}", ",".join(map(str, dims.tolist()))
    )
    rows = []
    for p in range(jax.process_count()):
        rows.append(
            np.fromiter(
                (int(v) for v in _kv_get_patient(client, f"{base}/{p}").split(",")),
                np.int32,
            )
        )
    return np.stack(rows).max(axis=0)


# A peer may be stalled in a cold-cache train-step compile (measured 20-240 s
# per shape, tools/compile_budget.py) for SEVERAL consecutive shapes before
# its prefetch thread reaches the exchange, so the canvas handshake must
# out-wait any plausible compile stretch. 30 min total, with a log line per
# expired slice so a genuinely hung peer is visible long before the raise.
_KV_SLICE_MS = 120_000
_KV_TOTAL_MS = 1_800_000


def _kv_get_patient(client, key: str) -> str:
    waited = 0
    while True:
        try:
            return client.blocking_key_value_get(key, _KV_SLICE_MS)
        except Exception as e:  # jaxlib XlaRuntimeError(DEADLINE_EXCEEDED)
            if "DEADLINE" not in str(e).upper():
                raise
            waited += _KV_SLICE_MS
            if waited >= _KV_TOTAL_MS:
                raise TimeoutError(
                    f"peer never posted {key!r} within {waited // 1000} s — "
                    "a process is down or wedged (not just compiling)"
                ) from e
            logging.getLogger("Logger").warning(
                "canvas exchange: still waiting on %s after %d s "
                "(peer likely in a cold-cache compile; will wait up to %d s)",
                key, waited // 1000, _KV_TOTAL_MS // 1000,
            )


def _sync_batch_canvas(local_batch: dict, microbatched: bool = False) -> dict:
    """Pad each process's batch to the cross-process maximum (H, W).

    The per-host TrainDataset streams are independent (different records,
    different per-batch scale — exactly like the reference's per-GPU batches
    under UserScatteredDataParallel), so their padded canvases differ; but a
    global jax.Array needs every process to contribute the SAME shape. One
    tiny KV-store exchange of the dims resolves the global canvas (see
    ``_exchange_dims`` — deliberately NOT a device collective, so the whole
    assembly may run on the prefetch thread); everything stays on the
    shared bucket lattice, so the jit shape set does not grow beyond it.
    """
    # Only spatial arrays (N, H, W, ...) need a canvas; per-image metadata
    # like img_valid_hw (N, 2) already has a process-invariant shape. With
    # a leading grad-accum axis (K, N, H, W, ...) the spatial dims shift
    # right by one.
    lead = 2 if microbatched else 1
    keys = sorted(k for k, v in local_batch.items() if v.ndim >= lead + 2)
    dims = np.asarray(
        [d for k in keys for d in local_batch[k].shape[lead : lead + 2]],
        np.int32,
    )
    global_dims = _exchange_dims(dims)

    out = dict(local_batch)  # non-spatial keys pass through untouched
    for i, k in enumerate(keys):
        x = np.asarray(local_batch[k])
        gh, gw = int(global_dims[2 * i]), int(global_dims[2 * i + 1])
        if (gh, gw) != x.shape[lead : lead + 2]:
            pad = [(0, 0)] * lead
            pad += [(0, gh - x.shape[lead]), (0, gw - x.shape[lead + 1])]
            pad += [(0, 0)] * (x.ndim - lead - 2)
            x = np.pad(x, pad, constant_values=_PAD_VALUE.get(k, 0))
        out[k] = x
    return out


def shard_local_batch(mesh: Mesh, local_batch: dict, microbatched: bool = False) -> dict:
    """Assemble a global sharded array from per-process local batches.

    Each process passes only its local slice; the result is a global
    jax.Array sharded over the mesh's ``data`` axis. Per-process batches may
    differ in (H, W): they are first padded to the cross-process canvas
    (see ``_sync_batch_canvas``). ``microbatched``: arrays carry a leading
    grad-accum axis (K, N, ...) — K replicated, N sharded (the batch dim
    moves to 1).
    """
    if jax.process_count() > 1:
        local_batch = _sync_batch_canvas(local_batch, microbatched)
    spec = P(None, "data") if microbatched else P("data")
    sharding = NamedSharding(mesh, spec)
    bdim = 1 if microbatched else 0

    def put(x):
        global_shape = list(x.shape)
        global_shape[bdim] *= jax.process_count()
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x), tuple(global_shape)
        )

    return jax.tree.map(put, local_batch)
