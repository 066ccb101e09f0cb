from .resize import (
    resize_bicubic,
    resize_bilinear,
    resize_nearest,
    upsample2x_bilinear,
    upsample2x_bilinear_nhwc,
    resize_matrix,
)
from .attention import dot_product_attention
from .segment_pool import segment_mean_pool, nucleus_pool

__all__ = [
    "resize_bicubic",
    "resize_bilinear",
    "resize_nearest",
    "upsample2x_bilinear",
    "resize_matrix",
    "dot_product_attention",
    "segment_mean_pool",
    "nucleus_pool",
]
