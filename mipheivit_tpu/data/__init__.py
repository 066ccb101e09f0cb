from .stats import (
    ChannelStats,
    Normalizer,
    HOPTIMUS_MEAN,
    HOPTIMUS_STD,
    IMAGENET_MEAN,
    IMAGENET_STD,
    get_input_mean_std,
    get_effective_width_height,
    load_channel_stats,
)

__all__ = [
    "ChannelStats",
    "Normalizer",
    "HOPTIMUS_MEAN",
    "HOPTIMUS_STD",
    "IMAGENET_MEAN",
    "IMAGENET_STD",
    "get_input_mean_std",
    "get_effective_width_height",
    "load_channel_stats",
]
