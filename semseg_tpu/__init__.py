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
