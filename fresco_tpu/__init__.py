"""FRESCO-TPU: TPU-native zero-shot video-to-video translation framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of FRESCO
(CVPR 2024, reference: williamyang1991/FRESCO): Stable Diffusion 1.5 +
ControlNet video translation with four temporal-consistency mechanisms
(FRESCO-guided attention, FRESCO feature optimization, background
smoothing, keyframe propagation), built TPU-first:

  * NHWC layouts, bf16 MXU compute, static shapes, `lax.scan` samplers.
  * The full denoise loop (VAE encode -> scanned DDPM steps w/ ControlNet,
    CFG, FRESCO attention + inner-Adam feature optimization -> VAE decode)
    is one jitted program.
  * Multi-chip scaling via `jax.sharding.Mesh` (frame/data axis + model
    axis), XLA collectives only.
  * Hot attention variants as Pallas flash-attention kernels.

Layout conventions (differ from the torch reference on purpose):
  * images / features: NHWC, float, [-1, 1] for RGB.
  * optical flow:      [B, H, W, 2] with channels (dx, dy) == (x, y).
  * occlusion masks:   [B, H, W] float in {0, 1} (1 == occluded).
"""

__version__ = "0.1.0"
