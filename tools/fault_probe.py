#!/usr/bin/env python3
"""Subprocess-isolated TPU program probes for runtime kernel faults.

The experimental axon TPU stack kernel-faults on specific compiled
programs (PERF_NOTES "Step-8 lattice worker fault"): a dead worker
poisons every later dispatch in the owning process, so each probe runs
in its OWN subprocess and reports pass/fail via exit status. Use this to
map the faulty-shape family before extending
``semseg_tpu.engine.AXON_FAULT_BUCKETS``.

Usage:
  python tools/fault_probe.py 304x400 304x408 --stage forward
  python tools/fault_probe.py 304x408 --stage epilogue   # accum+metrics
Stages:
  forward  — flagship forward at the bucket shape (--dtype, --batch)
  epilogue — the engine's accum + metrics programs at that canvas shape
             (random logits; no model forward involved)
"""

import argparse
import os
import subprocess
import sys

# `python tools/fault_probe.py` puts tools/ (not the repo root) on
# sys.path; make the package importable in parent and --one children.
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def probe_one(shape, stage, dtype, batch):
    import numpy as np
    import jax.numpy as jnp

    from semseg_tpu.config import cfg
    from semseg_tpu.engine import BatchedInferenceEngine
    from semseg_tpu.models import ModelBuilder, init_variables
    from semseg_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    h, w = shape
    c = cfg.clone()
    c.MODEL.arch_encoder = "resnet50dilated"
    c.MODEL.arch_decoder = "ppm_deepsup"
    c.MODEL.fc_dim = 2048
    model = ModelBuilder.build_model(c, dtype=jnp.dtype(dtype))
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
        # fetch forces execution past the async dispatch
        np.asarray(out[:, :2, :2, :2])
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("shapes", nargs="+", help="HxW bucket shapes")
    ap.add_argument("--stage", default="forward",
                    choices=["forward", "epilogue"])
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--one", action="store_true",
                    help="internal: run the probe in THIS process")
    ap.add_argument("--timeout", type=int, default=420)
    args = ap.parse_args()

    if args.one:
        (s,) = args.shapes
        h, w = (int(v) for v in s.split("x"))
        probe_one((h, w), args.stage, args.dtype, args.batch)
        return

    def run_child(shape_s, stage, dtype, batch):
        cmd = [
            sys.executable, __file__, shape_s, "--one", "--stage", stage,
            "--dtype", dtype, "--batch", str(batch),
        ]
        env = dict(os.environ)
        env["PYTHONPATH"] = (
            _REPO + os.pathsep + env["PYTHONPATH"]
            if env.get("PYTHONPATH") else _REPO
        )
        try:
            p = subprocess.run(
                cmd, capture_output=True, text=True, timeout=args.timeout,
                env=env,
            )
            ok = p.returncode == 0 and "PROBE_OK" in p.stdout
            detail = "" if ok else (p.stderr or "").strip().splitlines()[-1:]
        except subprocess.TimeoutExpired:
            ok, detail = False, ["timeout"]
        return ok, detail

    def wait_recovery():
        """After a crash the dead worker poisons NEW connections until it
        restarts — a 'CRASH' on the next shape would be pollution, not a
        genuine fault. Canary-probe a known-good program until it passes."""
        import time

        for i in range(10):
            time.sleep(30)
            ok, _ = run_child("448x608", "forward", args.dtype, args.batch)
            if ok:
                return
            print(f"  (worker still down, canary {i + 1}/10)", flush=True)
        raise SystemExit("TPU worker did not recover after 10 canaries")

    results = {}
    for s in args.shapes:
        ok, detail = run_child(s, args.stage, args.dtype, args.batch)
        results[s] = ok
        print(f"{args.stage} {args.dtype} bs{args.batch} {s}: "
              f"{'OK' if ok else 'CRASH'} {detail if not ok else ''}",
              flush=True)
        if not ok:
            wait_recovery()
    bad = [s for s, ok in results.items() if not ok]
    print("faulty:", ",".join(bad) if bad else "none")


if __name__ == "__main__":
    main()
