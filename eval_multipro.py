#!/usr/bin/env python3
"""Multi-device evaluation entry point (reference eval_multipro.py parity).

On TPU the per-GPU-process sharding collapses into round-robin dispatch to
per-device inference engines; this is the same code path as eval.py with
--devices defaulting to every visible device.
"""
import sys

import jax

from semseg_tpu.cli.eval import main

if __name__ == "__main__":
    argv = sys.argv[1:]
    if "--devices" not in argv:
        argv = ["--devices", str(len(jax.devices()))] + argv
    main(argv)
