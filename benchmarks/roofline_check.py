#!/usr/bin/env python
"""Per-arch roofline evidence for the PERF_NOTES zoo train table.

The round-2 zoo table explained mobilenet's 16.7 TFLOP/s ("bandwidth-bound
by design") and hrnet's 50.6 ("thin branches under-fill the MXU") by
assertion. This tool substantiates (or falsifies) those readings from the
compiled program itself:

* ``cost_analysis`` FLOPs + bytes accessed → arithmetic intensity, and the
  HBM-bandwidth-implied TFLOP/s ceiling (AI × BW) to compare against the
  measured rate;
* the optimized HLO's convolutions, parsed op by op → the FLOP-weighted
  MXU channel-padding waste (contraction = Cin/groups × kh × kw and the
  output-feature dim each pad to the 128-lane tile) and the share of
  FLOPs in depthwise convs (feature_group_count == Cin), which XLA lowers
  to the VPU, not the MXU at all.

Interpretation keys printed with the numbers:
* measured ≈ AI × BW  → the step is HBM-bound (mobilenet's claim);
* 1/waste × matmul-probe ceiling ≈ measured → the gap is channel
  under-fill, not framework overhead (hrnet's claim).

Usage:
    python benchmarks/roofline_check.py --arch mobilenetv2dilated \
        --decoder c1_deepsup --fc-dim 320 [--batch 8] [--shape 512 672]

Hardware constants default to the v5e values PERF_NOTES measures against
(117.5 TFLOP/s bf16 matmul-probe ceiling, 819 GB/s HBM).
"""

import argparse
import json
import math
import os
import re
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# StableHLO (pre-optimization, logical) convolution:
#   %9 = stablehlo.convolution(%7, %8) dim_numbers = [b,0,1,f]x[0,1,i,o]->
#     [b,0,1,f], window = {...} {... feature_group_count = 512 : i64 ...}
#     : (tensor<8x64x84x512xbf16>, tensor<3x3x1x512xbf16>)
#     -> tensor<8x64x84x512xbf16>
# The compiled TPU HLO is useless for this (operands hide inside fusions
# and space-to-batch transforms rewrite the shapes), so the parser runs on
# ``lowered.as_text()``; FLOPs here are logical — forward AND backward
# convs both appear after AD.
_CONV_RE = re.compile(
    r"stablehlo\.convolution\(.*?"
    r"dim_numbers\s*=\s*\[([^\]]*)\]x\[([^\]]*)\]->"
    r".*?feature_group_count\s*=\s*(\d+)"
    r".*?:\s*\(tensor<([^>]+)>,\s*tensor<([^>]+)>\)\s*->\s*tensor<([^>]+)>",
    re.DOTALL,
)

LANE = 128  # MXU lane tile (bf16 output-feature / contraction padding)


def _dims(s):
    return [int(x) for x in s.split("x")[:-1]]  # drop dtype suffix


def parse_conv_ops(stablehlo_text):
    """Extract (flops, waste_factor, is_depthwise) per logical convolution.

    dim_numbers' kernel spec locates contraction (``i``, per-group) and
    output features (``o``). Waste = lane padding of (Cin/groups × kh×kw)
    × lane padding of Cout — an upper bound on MXU fill, ignoring the
    (minor) 8-row sublane pad and XLA's space-to-batch rewrites.
    """
    ops = []
    # stablehlo.convolution ops span lines; match op-by-op.
    for m in _CONV_RE.finditer(stablehlo_text):
        rhs_l = [t.strip() for t in m.group(2).split(",")]
        groups = int(m.group(3))
        rhs_shape = _dims(m.group(5))
        out_shape = _dims(m.group(6))
        kernel_spatial = [
            rhs_shape[i] for i, ch in enumerate(rhs_l) if ch.isdigit()
        ]
        cin = rhs_shape[rhs_l.index("i")]  # per-group input features
        cout = rhs_shape[rhs_l.index("o")]
        out_elems = int(np.prod(out_shape))
        k = int(np.prod(kernel_spatial))
        flops = 2 * out_elems * cin * k
        depthwise = groups > 1 and cin == 1
        contraction = cin * k
        waste = (
            (math.ceil(contraction / LANE) * LANE / contraction)
            * (math.ceil(cout / LANE) * LANE / cout)
        )
        ops.append({"flops": flops, "waste": waste, "depthwise": depthwise,
                    "cout": cout, "contraction": contraction})
    return ops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="mobilenetv2dilated")
    ap.add_argument("--decoder", default="c1_deepsup")
    ap.add_argument("--fc-dim", type=int, default=320)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--shape", type=int, nargs=2, default=(512, 672))
    ap.add_argument("--segm-ds", type=int, default=0)
    ap.add_argument("--measured-tflops", type=float, default=0.0,
                    help="measured eff. TFLOP/s from train_bench.py "
                         "(printed next to the bounds when given)")
    ap.add_argument("--peak-tflops", type=float, default=117.5,
                    help="matmul-probe ceiling (PERF_NOTES 'Device ceiling')")
    ap.add_argument("--hbm-gbps", type=float, default=819.0)
    args = ap.parse_args()
    segm_ds = args.segm_ds or (8 if "dilated" in args.arch else 4)

    from semseg_tpu.config import cfg
    from semseg_tpu.models import ModelBuilder, init_variables
    from semseg_tpu.parallel.train_step import (
        create_train_state,
        jitted_train_step,
    )

    c = cfg.clone()
    c.MODEL.arch_encoder = args.arch
    c.MODEL.arch_decoder = args.decoder
    c.MODEL.fc_dim = args.fc_dim
    c.DATASET.segm_downsampling_rate = segm_ds
    c.TPU.compute_dtype = "bfloat16"

    model = ModelBuilder.build_model(c, dtype=jnp.bfloat16)
    variables = init_variables(model, seed=0, image_size=(64, 64))
    state = create_train_state(c, model, variables)
    h, w = args.shape
    rng = np.random.RandomState(0)
    batch_d = {
        "img_data": jnp.asarray(
            rng.randn(args.batch, h, w, 3), jnp.float32
        ),
        "seg_label": jnp.asarray(
            rng.randint(-1, 150, (args.batch, h // segm_ds, w // segm_ds)),
            jnp.int32,
        ),
    }
    lowered = jitted_train_step().lower(state, batch_d, jax.random.PRNGKey(0))
    compiled = lowered.compile()

    cost = compiled.cost_analysis()
    ca = cost[0] if isinstance(cost, (list, tuple)) else cost
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))
    ai = flops / byts if byts else None

    try:
        mem = compiled.memory_analysis()
        temp_gib = getattr(mem, "temp_size_in_bytes", 0) / 2**30
    except Exception:
        temp_gib = None

    ops = parse_conv_ops(lowered.as_text())
    conv_flops = sum(o["flops"] for o in ops)
    dw_flops = sum(o["flops"] for o in ops if o["depthwise"])
    mxu_ops = [o for o in ops if not o["depthwise"]]
    mxu_flops = sum(o["flops"] for o in mxu_ops)
    waste = (
        sum(o["flops"] * o["waste"] for o in mxu_ops) / mxu_flops
        if mxu_flops else None
    )

    out = {
        "arch": f"{args.arch}+{args.decoder}",
        "batch": args.batch,
        "shape": [h, w],
        "cost_flops_T": round(flops / 1e12, 3),
        "cost_bytes_GiB": round(byts / 2**30, 3),
        "temp_GiB": round(temp_gib, 2) if temp_gib is not None else None,
        "arithmetic_intensity": round(ai, 1) if ai else None,
        "ridge_intensity": round(args.peak_tflops * 1e12 / (args.hbm_gbps * 1e9), 1),
        "bandwidth_bound_tflops": (
            round(ai * args.hbm_gbps / 1e3, 1) if ai else None
        ),
        "n_conv_ops": len(ops),
        "conv_flops_share": round(conv_flops / flops, 3) if flops else None,
        "depthwise_flops_share": (
            round(dw_flops / conv_flops, 3) if conv_flops else None
        ),
        "mxu_channel_pad_waste": round(waste, 2) if waste else None,
        "underfill_bound_tflops": (
            round(args.peak_tflops / waste, 1) if waste else None
        ),
    }
    if args.measured_tflops:
        out["measured_tflops"] = args.measured_tflops
    print(json.dumps(out))


if __name__ == "__main__":
    main()
