from .pixel import psnr, ssim, PixelMetrics

__all__ = ["psnr", "ssim", "PixelMetrics"]
