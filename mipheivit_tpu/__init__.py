"""MIPHEI-ViT-TPU: a TPU-native (JAX / XLA / Pallas / pjit) framework for
H&E -> multiplex-immunofluorescence image-to-image translation.

Re-designed from scratch for TPU hardware with the capabilities of the
Sanofi-Public/MIPHEI-ViT reference (see SURVEY.md). The compute path is
JAX/XLA with Pallas kernels for the hot ops; whole-slide IO is a native
C++ tile engine ("slidetiff") on libtiff/libjpeg; training is pjit/shard_map
data-parallel over a device mesh.

Public surface mirrors the reference's data contract: slide/tile dataframes,
channel_stats.json, and the config.yaml schema (reference: configs/config.yaml,
src/train.py:34-210), so datasets and released checkpoints drop in.
"""

__version__ = "0.1.0"
