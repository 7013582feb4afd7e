from .conv import conv2d
from .pool import max_pool2d, adaptive_avg_pool2d, avg_pool2d
from .resize import resize_bilinear
from .resize_dynamic import (
    adaptive_avg_pool2d_valid,
    adaptive_pool_matrix,
    resize_matrix,
    upsample_grid_valid,
)
from .norm import batch_norm_train, batch_norm_inference
from .losses import nll_loss, pixel_accuracy, softmax_cross_entropy_with_ignore

__all__ = [
    "conv2d",
    "max_pool2d",
    "adaptive_avg_pool2d",
    "adaptive_avg_pool2d_valid",
    "adaptive_pool_matrix",
    "avg_pool2d",
    "resize_bilinear",
    "resize_matrix",
    "upsample_grid_valid",
    "batch_norm_train",
    "batch_norm_inference",
    "nll_loss",
    "pixel_accuracy",
    "softmax_cross_entropy_with_ignore",
]
