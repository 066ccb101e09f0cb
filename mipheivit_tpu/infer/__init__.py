from .loading import load_generator
from .serve import MicroBatcher, TileServer
from .tiles import inference_model
from .wsi import wsi_inference

__all__ = ["load_generator", "inference_model", "wsi_inference",
           "MicroBatcher", "TileServer"]
