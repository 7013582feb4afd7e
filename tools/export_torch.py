#!/usr/bin/env python3
"""Export a TPU-trained checkpoint back to reference-format .pth files.

The inverse of ``tools/convert_zoo.py``: takes a native orbax checkpoint
(a train-state ``epoch_N/`` directory or a standalone variables dir) — or
even a .pth pair, for format round-trips — and writes the
``encoder_epoch_N.pth`` / ``decoder_epoch_N.pth`` state_dict pair that the
reference's eval.py/test.py consume (and its train.py produces,
/root/reference/train.py:74-89). A model fine-tuned on TPU can be handed
back to reference users as drop-in files.

Example:

    python tools/export_torch.py \
        --cfg config/ade20k-resnet50dilated-ppm_deepsup.yaml \
        --checkpoint epoch_20 \
        --out ckpt/exported

Runs entirely on host (no accelerator needed).
"""

import argparse
import os
import re
import sys

# Weight transforms only — never wait on (or wake) a TPU backend.
os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

from semseg_tpu.checkpoint import (  # noqa: E402
    load_weights,
    resolve_reference_checkpoint,
)
from semseg_tpu.config import cfg  # noqa: E402
from semseg_tpu.models import ModelBuilder, init_variables  # noqa: E402
from semseg_tpu.models.export import save_reference_checkpoints  # noqa: E402


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Export a native checkpoint to reference .pth files"
    )
    parser.add_argument("--cfg", required=True, help="config YAML")
    parser.add_argument(
        "--checkpoint",
        default="epoch_20",
        help="checkpoint name under cfg.DIR (orbax dir or .pth pair); "
        "ignored when MODEL.weights_* are set via opts",
    )
    parser.add_argument("--out", default="", help="output dir (default cfg.DIR)")
    parser.add_argument(
        "--epoch",
        type=int,
        default=None,
        help="epoch number for the output filenames "
        "(default: parsed from --checkpoint, else 20)",
    )
    parser.add_argument(
        "opts", nargs=argparse.REMAINDER, help="config overrides"
    )
    args = parser.parse_args(argv)

    cfg.merge_from_file(args.cfg)
    cfg.merge_from_list(args.opts)
    resolve_reference_checkpoint(cfg, args.checkpoint)

    model = ModelBuilder.build_model(cfg, dtype=jnp.float32)
    variables = init_variables(model)
    variables = load_weights(
        dict(variables),
        arch_encoder=cfg.MODEL.arch_encoder,
        arch_decoder=cfg.MODEL.arch_decoder,
        weights_encoder=cfg.MODEL.weights_encoder,
        weights_decoder=cfg.MODEL.weights_decoder,
    )

    epoch = args.epoch
    if epoch is None:
        # Anchor to the epoch token: '--checkpoint ckpt_v2/epoch_30' must
        # yield 30, not the first digit run in the path ('2').
        m = re.search(r"epoch[_-]?(\d+)", args.checkpoint or "")
        if m is None:
            m = re.search(r"(\d+)(?!.*\d)", args.checkpoint or "")
        epoch = int(m.group(1)) if m else 20
    out_dir = args.out or cfg.DIR
    enc_path, dec_path = save_reference_checkpoints(
        variables,
        out_dir,
        arch_encoder=cfg.MODEL.arch_encoder,
        arch_decoder=cfg.MODEL.arch_decoder,
        epoch=epoch,
    )
    print(f"wrote {enc_path}\nwrote {dec_path}")


if __name__ == "__main__":
    main()
