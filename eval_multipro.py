#!/usr/bin/env python3
"""Multi-device evaluation entry point (reference eval_multipro.py parity).

On TPU the per-GPU-process sharding collapses into round-robin dispatch to
per-device inference engines; this is the same code path as eval.py with
--devices defaulting to every visible device. The reference's ``--gpus
0-3`` device-list form is accepted and mapped to a device COUNT
(reference eval_multipro.py:185-189 — the list only sized the worker
pool there too).
"""
import sys

from semseg_tpu.cli.eval import main

if __name__ == "__main__":
    argv = sys.argv[1:]
    if "--gpus" in argv:
        from semseg_tpu.utils import parse_devices

        i = argv.index("--gpus")
        gpus = parse_devices(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
        if "--devices" not in argv:
            argv = ["--devices", str(len(gpus))] + argv
    if "--devices" not in argv:
        import jax

        argv = ["--devices", str(len(jax.devices()))] + argv
    main(argv)
