from .dataset import BaseDataset, TestDataset, TrainDataset, ValDataset, parse_odgt
from .loader import EvalLoader, TrainLoader
from .transforms import (
    img_transform,
    imresize,
    round2nearest_multiple,
    scale_for,
    segm_transform,
)

__all__ = [
    "BaseDataset",
    "TrainDataset",
    "ValDataset",
    "TestDataset",
    "parse_odgt",
    "TrainLoader",
    "EvalLoader",
    "img_transform",
    "imresize",
    "segm_transform",
    "round2nearest_multiple",
    "scale_for",
]
