#!/usr/bin/env python
"""A/B: host-pyramid MS protocol with chunk-upload pipelining on vs off.

The host-pyramid BatchedInferenceEngine is the protocol-verbatim eval path
(and the parity-lattice number's engine); its chunk uploads were serial on
the dispatch thread. Interleaved best/median-of-N at both the throughput
(32) and parity (8) lattices. Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    import numpy as np

    from bench import bench_ms_protocol, build_model

    reps = int(os.environ.get("AB_REPS", "4"))
    cfg_node, model, variables = build_model()
    out = {}
    for step in (32, 8):
        for pipe in (False, True):
            best, med = bench_ms_protocol(
                cfg_node, model, variables, bucket_step=step,
                reps=reps, upload_pipeline=pipe,
            )
            out[f"step{step}_{'pipe' if pipe else 'serial'}"] = (
                round(best, 2), round(med, 2)
            )
    print(json.dumps(out), flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
