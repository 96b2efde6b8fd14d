"""detectorch_tpu — TPU-native (JAX/XLA/Pallas) Detectron inference & training.

A ground-up rebuild of the capabilities of ignacio-rocco/detectorch
(Fast/Faster/Mask R-CNN with ResNet-50/101 C4 & FPN backbones, caffe2
checkpoint import, COCO evaluation) as a single fixed-shape XLA program per
model config: proposal decoding, top-k, NMS, FPN level routing, RoIAlign and
mask heads all run on device with padded static shapes; batches shard across a
TPU mesh with jax.sharding.

Reference parity is documented per-module with file:line citations into the
reference repo (see docstrings).
"""

__version__ = "0.1.0"

from detectorch_tpu.config import ModelConfig, TestConfig, PRESETS  # noqa: F401
