from .builder import ModelBuilder, init_variables, ENCODER_CHANNELS
from .segmentation import SegmentationModel, SegmentationModule
from . import decoders, hrnet, layers, mobilenet, resnet

__all__ = [
    "ModelBuilder",
    "SegmentationModel",
    "SegmentationModule",
    "init_variables",
    "ENCODER_CHANNELS",
    "decoders",
    "hrnet",
    "layers",
    "mobilenet",
    "resnet",
]
