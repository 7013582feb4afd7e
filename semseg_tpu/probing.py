"""Subprocess-isolated probes that attribute device-worker crashes to
compiled forward shapes.

Why subprocesses: a faulted TPU worker poisons every later dispatch in
the owning process, so the only safe way to ask "does shape S crash?"
is to run S in a child and look at its exit status. Why sequential with
canaries: after a crash the restarting worker rejects NEW connections
for a while — an immediate next probe would read as a false CRASH, so
between probes a known-good canary program must pass first.

Used by:
  * ``tools/fault_probe.py`` — manual fault-family mapping CLI;
  * ``cli/eval.py`` self-healing — on a worker crash, the suspect
    buckets (fresh shapes dispatched since the last verified fetch) are
    probed here, confirmed faults are persisted to the fault registry
    (utils/fault_registry.py), and the run restarts routing around them.

The probe child rebuilds the SAME model geometry (arch/decoder/fc_dim)
and dtype/batch as the crashed engine — the axon faults are specific to
the compiled program, not the shape alone (PERF_NOTES "Step-8 lattice
worker fault": bf16 bs4 at (304, 400) crashes while f32 bs4 and bf16
bs1 run clean).
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

_CANARY_SHAPE = (448, 608)  # probed clean on the axon stack (bf16 bs4)


def _child_cmd(shape, spec, stage):
    h, w = shape
    return [
        sys.executable, "-m", "semseg_tpu.probing", f"{h}x{w}",
        "--stage", stage,
        "--arch", spec.get("arch_encoder", "resnet50dilated"),
        "--decoder", spec.get("arch_decoder", "ppm_deepsup"),
        "--fc-dim", str(spec.get("fc_dim", 2048)),
        "--dtype", spec.get("dtype", "bfloat16"),
        "--batch", str(spec.get("batch", 4)),
    ]


def _run_child(shape, spec, stage="forward", timeout=420):
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = (
        repo + os.pathsep + env["PYTHONPATH"]
        if env.get("PYTHONPATH") else repo
    )
    try:
        p = subprocess.run(
            _child_cmd(shape, spec, stage), capture_output=True, text=True,
            timeout=timeout, env=env,
        )
        ok = p.returncode == 0 and "PROBE_OK" in p.stdout
        detail = "" if ok else "\n".join((p.stderr or "").splitlines()[-2:])
    except subprocess.TimeoutExpired:
        ok, detail = False, f"probe timeout ({timeout}s)"
    return ok, detail


def wait_worker_recovery(spec, *, canaries=10, sleep_s=30, log=print):
    """Block until a known-good program passes (worker restarted)."""
    for i in range(canaries):
        time.sleep(sleep_s)
        ok, _ = _run_child(_CANARY_SHAPE, spec)
        if ok:
            return True
        log(f"  (device worker still down, canary {i + 1}/{canaries})")
    return False


def probe_shapes(shapes, spec, *, stage="forward", log=print,
                 assume_crashed=True, timeout=420):
    """Classify ``shapes`` into (faulty, clean) for the given program spec.

    ``assume_crashed``: the caller just observed a crash — wait for the
    worker to come back before the first probe. After every CRASH
    verdict, wait again so the next probe isn't poisoned. Raise
    ``timeout`` on heavily-loaded hosts: a fresh-shape compile starved
    of CPU can overrun it and be misread as a fault.
    """
    faulty, clean = [], []
    if assume_crashed and shapes:
        wait_worker_recovery(spec, log=log)
    for shape in shapes:
        ok, detail = _run_child(shape, spec, stage=stage, timeout=timeout)
        log(f"  probe {shape[0]}x{shape[1]}: {'OK' if ok else 'CRASH'}"
            + (f" ({detail})" if not ok and detail else ""))
        (clean if ok else faulty).append(tuple(shape))
        if not ok:
            if not wait_worker_recovery(spec, log=log):
                log("  worker did not recover; remaining shapes not probed")
                break
    return faulty, clean


def probe_one(shape, stage, spec):
    """Run ONE probe in THIS process (child entry point — may crash the
    process's device worker; never call from a process you care about)."""
    import numpy as np
    import jax.numpy as jnp

    from semseg_tpu.config import cfg
    from semseg_tpu.engine import BatchedInferenceEngine
    from semseg_tpu.models import ModelBuilder, init_variables
    from semseg_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    h, w = shape
    batch = int(spec.get("batch", 4))
    c = cfg.clone()
    c.MODEL.arch_encoder = spec.get("arch_encoder", "resnet50dilated")
    c.MODEL.arch_decoder = spec.get("arch_decoder", "ppm_deepsup")
    c.MODEL.fc_dim = int(spec.get("fc_dim", 2048))
    model = ModelBuilder.build_model(
        c, dtype=jnp.dtype(spec.get("dtype", "bfloat16"))
    )
    variables = init_variables(model, seed=0, image_size=(64, 64))
    eng = BatchedInferenceEngine(
        model, variables, num_class=150, output_stride=8, bucket_step=8,
        batch_size=batch, fetch_dtype="bfloat16", bucket_denylist=(),
    )
    if stage == "forward":
        img = np.random.RandomState(0).randint(
            0, 255, (batch, h, w, 3)
        ).astype(np.uint8)
        hs = np.full(batch, h, np.int32)
        ws = np.full(batch, w, np.int32)
        out = eng._batched_raw_fn(
            eng.variables, eng._put(img), eng._put(hs), eng._put(ws), False
        )
        np.asarray(out[:, :2, :2, :2])  # force execution past async dispatch
    elif stage == "epilogue":
        os_ = eng.output_stride
        acc = eng._zeros((h, w, 150), jnp.float32)
        logits = eng._put(
            np.random.RandomState(0).randn(-(-h // os_), -(-w // os_), 150),
            jnp.float32,
        )
        acc = eng._accum_fn(acc, logits, -(-h // os_), -(-w // os_), h, w)
        lab = np.random.RandomState(1).randint(0, 150, (h, w)).astype(np.uint8)
        np.asarray(eng._metrics_fn(acc, eng._put(lab)))
    else:
        raise SystemExit(f"unknown stage {stage}")
    print("PROBE_OK")


def _main():
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("shape", help="HxW bucket shape")
    ap.add_argument("--stage", default="forward",
                    choices=["forward", "epilogue"])
    ap.add_argument("--arch", default="resnet50dilated")
    ap.add_argument("--decoder", default="ppm_deepsup")
    ap.add_argument("--fc-dim", type=int, default=2048)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()
    h, w = (int(v) for v in args.shape.split("x"))
    probe_one(
        (h, w), args.stage,
        {
            "arch_encoder": args.arch, "arch_decoder": args.decoder,
            "fc_dim": args.fc_dim, "dtype": args.dtype, "batch": args.batch,
        },
    )


if __name__ == "__main__":
    _main()
