"""trackformer_tpu — a TPU-native multi-object-tracking framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
timmeinhardt/trackformer (reference: /root/reference): end-to-end
multi-object tracking with DETR / Deformable-DETR detectors extended by
autoregressive track queries.

Design stance (TPU-first):
  * functional core — models are flax.linen modules, the train step and the
    per-frame tracker step are single jitted functions;
  * static shapes everywhere — padded image buckets, padded target slots,
    fixed-capacity track slots with validity masks (the reference's ragged
    per-image tensors and Python list-of-Track control flow are replaced by
    masked fixed-shape ops);
  * NHWC layout and bf16 matmuls for the MXU; multi-scale deformable
    attention runs as a Pallas kernel (pure-XLA gather reference included);
  * scaling via jax.sharding Mesh + jit shardings over ICI (data-parallel by
    default), not translated NCCL calls.
"""

__version__ = "0.1.0"
