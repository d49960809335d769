"""mdvit_tpu — a TPU-native (JAX/XLA/Pallas/pjit) multi-domain medical image
segmentation framework with the capabilities of siyi-wind/MDViT (MICCAI 2023).

Layout conventions
------------------
* Images and feature grids are NHWC ``(B, H, W, C)`` (TPU-friendly), tokens are
  ``(B, N, C)``.
* Binary segmentation logits are ``(B, H, W, 1)``.
* All domains are stacked into one device batch; the domain is carried as a
  per-sample integer / one-hot tensor, never as Python control flow, so the
  whole multi-domain training step is a single compiled XLA program
  (contrast: reference runs four sequential per-domain forwards,
  ``multi_train_MDViT.py:129-213``).
"""

__version__ = "0.1.0"
