"""spike2former_tpu — a TPU-native JAX rebuild of Spike2Former.

A spiking (normalized-integer quantized activation) MaskFormer for semantic
segmentation: Meta-SpikeFormer backbones (SDTv2/SDTv3), a spiking DCNv3
pixel decoder, a spiking DETR transformer decoder over 100 queries, and
Hungarian-matched mask-classification training — re-designed for TPU
(jax / XLA / pallas / pjit) rather than ported from the CUDA/torch reference.
"""

__version__ = "0.1.0"
