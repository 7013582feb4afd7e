"""semseg_tpu — TPU-native semantic segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
CSAILVision/semantic-segmentation-pytorch: the ADE20K encoder/decoder model
zoo, synchronized batch norm (as sharded global batch stats), dynamic-shape
multi-scale training/eval, and the train/eval/test CLIs.

Public API mirrors the reference package (``/root/reference/setup.py:5-29``,
README.md:239-244):

    from semseg_tpu.config import cfg
    from semseg_tpu.data import TestDataset
    from semseg_tpu.models import ModelBuilder, SegmentationModule
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("SEMSEG_PLATFORM"):
    # The axon TPU plugin force-sets jax_platforms at interpreter start, so a
    # plain JAX_PLATFORMS env var is ignored; this gives CLI users (and CI) a
    # working override, e.g. SEMSEG_PLATFORM=cpu python train.py ...
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["SEMSEG_PLATFORM"])
