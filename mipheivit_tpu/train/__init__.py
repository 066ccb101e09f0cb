from .losses import (
    focal_l1_cubed_loss,
    weighted_mse_loss,
    focal_bce_loss,
    mae_loss,
    mse_loss,
    weighted_mae_loss,
    shrinkage_loss,
    l1_l2_loss,
    total_variation_loss,
    adversarial_loss,
    get_foreground_weight,
    build_reconstruction_loss,
)
from .schedule import pix2pix_schedule, vit_layer_decay_rate, scaled_lr

__all__ = [
    "focal_l1_cubed_loss",
    "weighted_mse_loss",
    "focal_bce_loss",
    "mae_loss",
    "mse_loss",
    "weighted_mae_loss",
    "shrinkage_loss",
    "l1_l2_loss",
    "total_variation_loss",
    "adversarial_loss",
    "get_foreground_weight",
    "build_reconstruction_loss",
    "pix2pix_schedule",
    "vit_layer_decay_rate",
    "scaled_lr",
]
