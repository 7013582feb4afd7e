#!/usr/bin/env python3
"""Convert a reference PyTorch checkpoint pair into a native checkpoint.

Example (after downloading the published zoo files):

    python tools/convert_zoo.py \
        --cfg config/ade20k-resnet50dilated-ppm_deepsup.yaml \
        --encoder ckpt/.../encoder_epoch_20.pth \
        --decoder ckpt/.../decoder_epoch_20.pth \
        --out ckpt/ade20k-resnet50dilated-ppm_deepsup/converted

The output directory loads through ``MODEL.weights_encoder`` (or the
``VAL.checkpoint`` convention) without torch in the serving path.
"""

import argparse

import jax.numpy as jnp

from semseg_tpu.checkpoint import load_weights, save_variables
from semseg_tpu.config import cfg
from semseg_tpu.models import ModelBuilder, init_variables


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", required=True)
    parser.add_argument("--encoder", required=True, help="encoder .pth path")
    parser.add_argument("--decoder", required=True, help="decoder .pth path")
    parser.add_argument("--out", required=True, help="output checkpoint dir")
    args = parser.parse_args(argv)

    cfg.merge_from_file(args.cfg)
    model = ModelBuilder.build_model(cfg, dtype=jnp.float32)
    variables = init_variables(model)
    variables = load_weights(
        dict(variables),
        arch_encoder=cfg.MODEL.arch_encoder,
        arch_decoder=cfg.MODEL.arch_decoder,
        weights_encoder=args.encoder,
        weights_decoder=args.decoder,
    )
    save_variables(args.out, variables)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
