#!/usr/bin/env python3
"""Benchmark: ADE20K inference throughput on the flagship model.

Two measurements, one JSON line:

* **MS-protocol** (primary metric): the reference's full multi-scale TTA
  eval protocol — 5-scale pyramid per image (imgSizes 300..600, capped long
  side), batched bucketed forwards, softmax-average + argmax + mIoU metrics
  fully on device (the deployment eval path, cli/eval.py --batch). Baseline:
  2.6 fps for ResNet50dilated+PPM_deepsup multi-scale on a Pascal Titan Xp
  (reference README.md:117-120). Timing EXCLUDES host pyramid construction,
  exactly like the reference's meter (eval.py:56-78 brackets H2D + forwards
  + scoring only, with pyramids built in dataloader workers).
* **single-scale** (extra key): chained model forwards at 448x608 (the
  canonical 450-short-side bucket), batch 16 — the measured
  throughput-optimal batch (PERF_NOTES "Batch scaling, inference"), NOT
  the reference's per-image batch-1 protocol. Baseline: 8.3 fps
  (README.md:113-116); the ratio is a model-forward speedup, the MS
  number above is the protocol-level comparison.

Distribution honesty: MS original shapes are SAMPLED FROM data/
validation.odgt (not one synthetic shape), so bucket-batch fill matches
the real val distribution; the headline runs the throughput lattice
(bucket 32) with the parity lattice (bucket 8 + packed buckets — the
cli/eval.py default protocol, ≤1e-4 measured mIoU drift with packing
below the --exact noise floor, PARITY.md) reported alongside as
ms_parity_lattice_fps.

Timing rule for the axon-tunneled TPU: dispatch-loop wall time lies
(block_until_ready returns early). Single-scale chains forwards inside one
jit via lax.scan; the MS path is timed end-to-end across its device calls
with a host fetch as the barrier. Best-of-N is reported (the tunnel link
drifts between minutes) with median-of-N alongside, so best-of can't
silently select the lucky run.
"""

import json
import os
import sys
import threading
import time

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_MS_FPS = 2.6  # r50dilated+ppm_deepsup, 5-scale TTA, Titan Xp
BASELINE_SS_FPS = 8.3  # same model, single-scale

N_IMAGES = 16
MS_BUCKET = 32          # throughput lattice (headline)
MS_PARITY_BUCKET = 8    # parity lattice (cli/eval.py default, PARITY.md)

# Internal wall-clock budget: sub-benches that have not STARTED when the
# budget is exhausted are skipped (and named in the JSON), so the run
# always ends with a complete result line well before any external
# timeout. The hard-exit watchdog is the backstop for a sub-bench that
# hangs mid-flight (engine worker wedge, tunnel stall): it prints the
# cumulative JSON with whatever is banked and force-exits. BENCH_r04
# lost the whole round to exactly this failure mode (rc=124,
# parsed=null, with the single-scale number measured 10 minutes before
# the timeout but never printed).
BUDGET_S = float(os.environ.get("SEMSEG_BENCH_BUDGET_S", "1200"))
HARD_EXIT_S = float(
    os.environ.get("SEMSEG_BENCH_HARD_EXIT_S", str(BUDGET_S + 480))
)


def sample_odgt_shapes(n=N_IMAGES, seed=0):
    """Original (H, W) shapes from the REAL val distribution (shared
    helper — zoo_bench samples the same distribution)."""
    from semseg_tpu.data.dataset import sample_odgt_shapes as _sample

    odgt = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "data", "validation.odgt")
    return _sample(odgt, n, seed)


def build_model():
    from semseg_tpu.config import cfg
    from semseg_tpu.models import ModelBuilder, init_variables
    from semseg_tpu.utils.compile_cache import enable_compile_cache

    # Same persistent XLA cache the CLIs use: repeat bench runs deserialize
    # the compiled programs (compile time is excluded from every timing loop
    # anyway — each bench warms up before its timed passes). TPU backend
    # only: CPU executables in a home-dir cache shared across heterogeneous
    # fleet hosts deserialize into cpu_aot_loader feature-mismatch spam +
    # recompile storms (the BENCH_r04 timeout), and a CPU bench run is a
    # degraded diagnostic anyway.
    if jax.default_backend() == "tpu":
        enable_compile_cache()

    c = cfg.clone()
    c.MODEL.arch_encoder = "resnet50dilated"
    c.MODEL.arch_decoder = "ppm_deepsup"
    c.MODEL.fc_dim = 2048
    model = ModelBuilder.build_model(c, dtype=jnp.bfloat16)
    variables = init_variables(model, seed=0, image_size=(64, 64))
    return c, model, variables


def bench_single_scale(model, variables):
    # Batch 16: measured forward scaling 230.6 / 251.3 / 261.8 img/s at
    # batch 4/8/16 (PERF_NOTES "Batch scaling, inference") — the 256-ch
    # stage-3 convs tile the MXU ~1.8x better with more rows. Deployment
    # picks its own batch; this reports the throughput-optimal point.
    h, w, batch, iters = 448, 608, 16, 20

    @jax.jit
    def timed_forwards(variables, img):
        def body(carry, _):
            logits = model.apply(variables, carry, train=False)
            # scalar feedback makes the chain sequential and un-removable
            carry = carry + jnp.mean(logits).astype(carry.dtype) * 1e-6
            return carry, jnp.mean(logits)

        _, means = jax.lax.scan(body, img, None, length=iters)
        return means

    img = jnp.asarray(
        np.random.RandomState(0).randn(batch, h, w, 3), jnp.float32
    )
    np.asarray(timed_forwards(variables, img))  # compile + warmup
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(timed_forwards(variables, img))
        dt = min(dt, time.perf_counter() - t0)
    return batch * iters / dt


def _best_and_median(times, n_images):
    ts = np.asarray(times, np.float64)
    return n_images / float(ts.min()), n_images / float(np.median(ts))


_LAST_ENGINE = [None]  # engine of the currently-running sub-bench


def bench_ms_protocol(cfg_node, model, variables, *, bucket_step=MS_BUCKET,
                      reps=5, pack_buckets=False, upload_pipeline=True):
    """5-scale TTA + on-device metrics via the real BatchedInferenceEngine,
    over ORIGINAL shapes sampled from data/validation.odgt (so bucket-batch
    fill matches the real distribution). Returns (best_fps, median_fps)."""
    from semseg_tpu.data.transforms import round2nearest_multiple, scale_for
    from semseg_tpu.engine import BatchedInferenceEngine

    rng = np.random.RandomState(0)
    sizes = cfg_node.DATASET.imgSizes
    pyramids = []
    labels = []
    for (oh, ow) in sample_odgt_shapes(N_IMAGES):
        levels = []
        for s in sizes:
            sc = scale_for(oh, ow, s, cfg_node.DATASET.imgMaxSize)
            th = round2nearest_multiple(int(oh * sc), bucket_step)
            tw = round2nearest_multiple(int(ow * sc), bucket_step)
            levels.append(rng.randint(0, 255, (1, th, tw, 3)).astype(np.uint8))
        pyramids.append(levels)
        labels.append(rng.randint(-1, 150, (oh, ow)).astype(np.int32))

    engine = BatchedInferenceEngine(
        model,
        variables,
        num_class=150,
        output_stride=cfg_node.DATASET.segm_downsampling_rate,
        bucket_step=bucket_step,
        batch_size=4,
        fetch_dtype="bfloat16",
        pack_buckets=pack_buckets,
        upload_pipeline=upload_pipeline,
    )
    _LAST_ENGINE[0] = engine  # crash-suspect attribution (see guarded())
    engine.batched_metrics(pyramids, labels)  # compile all buckets + warmup
    times = []
    for _ in range(reps):  # the tunnel link drifts between minutes
        t0 = time.perf_counter()
        out = engine.batched_metrics(pyramids, labels)
        assert len(out) == N_IMAGES
        times.append(time.perf_counter() - t0)
    return _best_and_median(times, N_IMAGES)


def bench_ms_device_pyramid(cfg_node, model, variables, *,
                            bucket_step=MS_BUCKET, reps=5,
                            pack_buckets=False, batch_size=4):
    """5-scale TTA with DEVICE-derived pyramids: one original upload per
    image (~5.7x less H2D than host pyramids). odgt-sampled shapes."""
    from semseg_tpu.engine import DevicePyramidEngine

    rng = np.random.RandomState(0)
    shapes = sample_odgt_shapes(N_IMAGES)
    originals = [
        rng.randint(0, 255, (oh, ow, 3)).astype(np.uint8)
        for (oh, ow) in shapes
    ]
    labels = [
        rng.randint(-1, 150, (oh, ow)).astype(np.int32)
        for (oh, ow) in shapes
    ]
    engine = DevicePyramidEngine(
        model,
        variables,
        num_class=150,
        output_stride=cfg_node.DATASET.segm_downsampling_rate,
        bucket_step=bucket_step,
        batch_size=batch_size,
        fetch_dtype="bfloat16",
        img_sizes=cfg_node.DATASET.imgSizes,
        img_max_size=cfg_node.DATASET.imgMaxSize,
        pack_buckets=pack_buckets,
    )
    _LAST_ENGINE[0] = engine
    engine.batched_metrics_from_originals(originals, labels)  # warmup
    times = []
    for _ in range(reps):  # the tunnel link drifts between minutes
        t0 = time.perf_counter()
        out = engine.batched_metrics_from_originals(originals, labels)
        assert len(out) == N_IMAGES
        times.append(time.perf_counter() - t0)
    return _best_and_median(times, N_IMAGES)


def bench_train(cfg_node, model, variables):
    """Train-step throughput at the recommended per-chip batch (8)."""
    from semseg_tpu.parallel.train_step import (
        create_train_state,
        jitted_train_step,
    )

    c = cfg_node.clone()
    # The jitted step DONATES the state, whose arrays alias `variables` —
    # train on a copy so later sub-benches can still use the originals
    # (exposed when the parity bench moved after this one: "Array has
    # been deleted").
    state = create_train_state(
        c, model, jax.tree.map(jnp.array, dict(variables))
    )
    step_fn = jitted_train_step()
    rng = np.random.RandomState(0)
    batch, h, w = 8, 448, 608
    ds = c.DATASET.segm_downsampling_rate
    batch_d = {
        "img_data": jnp.asarray(rng.randn(batch, h, w, 3), jnp.float32),
        "seg_label": jnp.asarray(
            rng.randint(-1, 150, (batch, h // ds, w // ds)), jnp.int32
        ),
    }
    key = jax.random.PRNGKey(0)
    state, metrics = step_fn(state, batch_d, key)
    float(metrics["loss"])  # compile + warmup barrier
    steps = 10
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, metrics = step_fn(state, batch_d, key)
        float(metrics["loss"])  # chain barrier
        best = min(best, time.perf_counter() - t0)
    return batch * steps / best


_T0 = time.monotonic()
_STATE = {
    "ss": None, "train": None, "errors": {}, "skipped": [],
    "platform": None, "hard_exit": False,
    # MS-protocol variants: key -> (best_fps, median_fps)
    "ms": None, "ms_packed": None, "dp": None, "dp_packed": None,
    "ms_parity": None, "ms_parity_dp": None,
}
_EMIT_LOCK = threading.Lock()


def _compose():
    """Build the cumulative result JSON from whatever has completed."""
    s = _STATE
    candidates = {
        "ms_host_pyramid": (s["ms"], ""),
        "ms_host_pyramid_packed": (s["ms_packed"], " (packed buckets)"),
        "ms_device_pyramid": (s["dp"], " (device-derived pyramids)"),
        "ms_device_pyramid_packed": (
            s["dp_packed"], " (device-derived pyramids, packed buckets)"
        ),
        # The parity-lattice run is headline-eligible too: same 5-scale
        # TTA protocol, and measured FASTER than step-32 (the finer
        # lattice pads less and packing keeps batches filled) — so the
        # headline and the parity-grade number coincide.
        "ms_parity_device_pyramid": (
            s["ms_parity_dp"],
            " (device-derived pyramids, packed, parity step-8 lattice)",
        ),
    }
    avail = {k: v for k, (v, _) in candidates.items() if v is not None}
    if avail:
        best_key = max(avail, key=lambda k: avail[k][0])
        best_fps, best_median = avail[best_key]
        out = {
            "metric": "resnet50dilated+ppm_deepsup 5-scale TTA eval protocol"
                      + candidates[best_key][1],
            "value": round(best_fps, 2),
            "unit": "images/sec/chip",
            "vs_baseline": round(best_fps / BASELINE_MS_FPS, 2),
            # Honesty keys (round-2 verdict): shapes are sampled from the
            # real val odgt, and best-of-N is reported next to median-of-N.
            "ms_shape_distribution": "odgt",
            "ms_fps_median": round(best_median, 2),
        }
        for key, (res, _) in candidates.items():
            # ms_parity_device_pyramid is emitted unconditionally below
            # (the parity artifact must be findable under its own name
            # even when it is also the headline).
            if (res is not None and key != best_key
                    and key != "ms_parity_device_pyramid"):
                out[key + "_fps"] = round(res[0], 2)
                out[key + "_fps_median"] = round(res[1], 2)
    elif s["ss"] is not None:
        out = {
            "metric": "resnet50dilated+ppm_deepsup single-scale inference",
            "value": round(s["ss"], 2),
            "unit": "images/sec/chip",
            "vs_baseline": round(s["ss"] / BASELINE_SS_FPS, 2),
        }
    else:
        out = {
            "metric": "resnet50dilated+ppm_deepsup 5-scale TTA eval protocol",
            "value": None, "unit": "images/sec/chip", "vs_baseline": None,
        }
    if s["ss"] is not None and avail:
        out["single_scale_fps"] = round(s["ss"], 2)
        out["single_scale_vs_baseline"] = round(s["ss"] / BASELINE_SS_FPS, 2)
    if s["ms_parity"] is not None:
        out["ms_parity_lattice_fps"] = round(s["ms_parity"][0], 2)
        out["ms_parity_lattice_fps_median"] = round(s["ms_parity"][1], 2)
    if s["ms_parity_dp"] is not None:
        out["ms_parity_device_pyramid_fps"] = round(s["ms_parity_dp"][0], 2)
        out["ms_parity_device_pyramid_fps_median"] = round(
            s["ms_parity_dp"][1], 2
        )
    if s["train"] is not None:
        out["train_img_per_s_bs8"] = round(s["train"], 1)
    if s["errors"]:
        out["sub_bench_errors"] = s["errors"]
    if s["skipped"]:
        out["skipped_over_budget"] = s["skipped"]
    if s["platform"]:
        out["platform"] = s["platform"]
    if s["hard_exit"]:
        out["hard_exit"] = True
    out["elapsed_s"] = round(time.monotonic() - _T0, 1)
    return out


def _emit():
    """Print the CUMULATIVE result line; called after every completed
    sub-bench so an external timeout can never zero the run (the driver
    parses the tail — last line wins)."""
    with _EMIT_LOCK:
        print(json.dumps(_compose()), flush=True)


def _watchdog():
    """Hard backstop for a sub-bench that hangs mid-flight: bank whatever
    completed and force-exit before any external timeout fires."""
    time.sleep(HARD_EXIT_S)
    with _EMIT_LOCK:
        _STATE["hard_exit"] = True
    _emit()
    os._exit(0)


def _check_backend_alive(timeout_s: int = 300):
    """Fail FAST (with a diagnostic JSON line) if the device backend cannot
    initialize — the tunneled axon plugin blocks indefinitely when its link
    is down, which would otherwise hang this benchmark forever. The probe
    runs in a subprocess so the hang cannot leak into this process."""
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=timeout_s,
        )
        if proc.returncode == 0:
            return
        detail = (proc.stderr or "").strip()[-500:]
    except subprocess.TimeoutExpired:
        detail = f"backend init did not finish within {timeout_s}s"
    print(json.dumps({
        "metric": "resnet50dilated+ppm_deepsup 5-scale TTA eval protocol",
        "value": None,
        "unit": "images/sec/chip",
        "vs_baseline": None,
        "error": f"device backend unavailable: {detail}",
    }))
    sys.exit(1)


def main():
    threading.Thread(target=_watchdog, daemon=True).start()
    _check_backend_alive()
    _STATE["platform"] = jax.default_backend()
    cfg_node, model, variables = build_model()

    import traceback

    # A broken sub-bench must not kill the run (everything banked so far
    # is re-printed after every completion), but it must be LOUD: the
    # JSON carries each failed sub-bench's exception line and stderr the
    # traceback (silently-missing keys read as "ran clean").
    def guarded(name, slot, fn):
        # _STATE mutations happen under _EMIT_LOCK: the watchdog thread
        # json-serializes _STATE concurrently, and a dict growing during
        # iteration would kill the watchdog before its os._exit backstop.
        if time.monotonic() - _T0 > BUDGET_S:
            with _EMIT_LOCK:
                _STATE["skipped"].append(name)
            _emit()
            return
        result = None
        err = suspects = None
        try:
            result = fn()
        except Exception as e:
            err = f"{type(e).__name__}: {e}"[:300]
            # Worker-crash attribution: name the suspect bucket shapes
            # (dispatched since the engine's last verified fetch) so
            # the next session can probe + registry them
            # (tools/fault_probe.py --record) instead of re-bisecting.
            from semseg_tpu.utils.fault_registry import is_worker_crash

            eng = _LAST_ENGINE[0]
            if eng is not None and is_worker_crash(e):
                suspects = [f"{h}x{w}" for (h, w) in eng.suspect_buckets()]
            traceback.print_exc(file=sys.stderr)
        with _EMIT_LOCK:
            if err is None:
                _STATE[slot] = result
            else:
                _STATE["errors"][name] = err
                if suspects is not None:
                    _STATE["errors"][name + "_crash_suspect_buckets"] = (
                        suspects
                    )
        _emit()

    guarded("single_scale", "ss",
            lambda: bench_single_scale(model, variables))
    if os.environ.get("SEMSEG_BENCH_FAST"):
        os._exit(0)

    # Ordered by evidential value (the budget skips from the tail):
    # 1. Deployment headline: device-derived pyramids + packed buckets +
    #    batch 8 — packing keeps larger batches filled and the measured
    #    forward scaling (228 -> 251 img/s at bs4 -> bs8) carries into
    #    the protocol (round-4 A/B: 22.1 vs 19.9 img/s serial).
    guarded(
        "device_pyramid_packed", "dp_packed",
        lambda: bench_ms_device_pyramid(
            cfg_node, model, variables, pack_buckets=True, batch_size=8
        ),
    )
    # 2. THE parity-grade number (round-4 verdict's missing artifact):
    #    device-derived pyramids at the PARITY lattice (step 8, packed —
    #    the cli/eval.py default protocol). Oracle drift 8e-5 mIoU
    #    (PARITY.md), i.e. parity-grade accuracy at the deployment
    #    execution strategy. The engine's 'auto' bucket denylist routes
    #    around the probed faulty step-8 shape family (PERF_NOTES); if an
    #    UNKNOWN faulty shape kills the worker, the numbers above are
    #    already banked and guarded() reports the suspect shapes.
    guarded(
        "ms_parity_device_pyramid", "ms_parity_dp",
        lambda: bench_ms_device_pyramid(
            cfg_node, model, variables,
            bucket_step=MS_PARITY_BUCKET, reps=3, pack_buckets=True,
            batch_size=8,
        ),
    )
    # 3. Train throughput (independent of the engines).
    guarded("train", "train",
            lambda: bench_train(cfg_node, model, variables))
    # 4. Host-pyramid protocol-verbatim variants: same 5-scale TTA over
    #    the same odgt-sampled shapes, pyramids built host-side like the
    #    reference's dataloader workers. Packing folds under-filled
    #    bucket batches into covering buckets (drift lattice-equal,
    #    PARITY.md packed rows).
    guarded("ms_protocol", "ms",
            lambda: bench_ms_protocol(cfg_node, model, variables))
    guarded(
        "ms_packed", "ms_packed",
        lambda: bench_ms_protocol(
            cfg_node, model, variables, pack_buckets=True
        ),
    )
    guarded("device_pyramid", "dp",
            lambda: bench_ms_device_pyramid(cfg_node, model, variables))
    # 5. Host-pyramid parity lattice (protocol-verbatim at step 8).
    guarded(
        "ms_parity_lattice", "ms_parity",
        lambda: bench_ms_protocol(
            cfg_node, model, variables,
            bucket_step=MS_PARITY_BUCKET, reps=3, pack_buckets=True,
        ),
    )
    _emit()
    # Hard-exit: the axon tunnel / engine worker threads can hang interpreter
    # teardown after the result is already printed (BENCH_r03 recorded
    # rc=124 from exactly this), and nothing after this line matters.
    os._exit(0)


if __name__ == "__main__":
    main()
