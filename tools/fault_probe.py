#!/usr/bin/env python3
"""Subprocess-isolated TPU program probes for runtime kernel faults.

Thin CLI over ``semseg_tpu.probing`` (the same machinery cli/eval.py's
self-healing uses): each probe runs in its own subprocess — a faulted
worker poisons the owning process — and after every CRASH verdict a
known-good canary must pass before the next probe, so a restarting
worker can't pollute later verdicts.

Usage:
  python tools/fault_probe.py 304x400 304x408 --stage forward
  python tools/fault_probe.py 304x408 --stage epilogue [--record]

``--record`` persists confirmed faults to the per-backend registry
(semseg_tpu/utils/fault_registry.py), which engines with
``bucket_denylist='auto'`` route around automatically.
"""

import argparse
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from semseg_tpu import probing  # noqa: E402


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("shapes", nargs="+", help="HxW bucket shapes")
    ap.add_argument("--stage", default="forward",
                    choices=["forward", "epilogue"])
    ap.add_argument("--arch", default="resnet50dilated")
    ap.add_argument("--decoder", default="ppm_deepsup")
    ap.add_argument("--fc-dim", type=int, default=2048)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--record", action="store_true",
                    help="persist confirmed faults to the fault registry")
    ap.add_argument("--timeout", type=int, default=420,
                    help="per-probe subprocess timeout (raise on loaded "
                         "hosts: a starved fresh-shape compile can overrun "
                         "it and be misread as a fault)")
    args = ap.parse_args()

    spec = {
        "arch_encoder": args.arch, "arch_decoder": args.decoder,
        "fc_dim": args.fc_dim, "dtype": args.dtype, "batch": args.batch,
    }
    shapes = [tuple(int(v) for v in s.split("x")) for s in args.shapes]
    faulty, clean = probing.probe_shapes(
        shapes, spec, stage=args.stage, assume_crashed=False,
        timeout=args.timeout,
    )
    print("faulty:", ",".join(f"{h}x{w}" for h, w in faulty) or "none")
    print("clean:", ",".join(f"{h}x{w}" for h, w in clean) or "none")
    if args.record and faulty:
        import jax

        from semseg_tpu.utils import fault_registry

        platform = jax.devices()[0].platform
        path = fault_registry.record(
            faulty, platform,
            {"source": "tools/fault_probe.py", "stage": args.stage, **spec},
        )
        print(f"recorded to {path}")


if __name__ == "__main__":
    main()
