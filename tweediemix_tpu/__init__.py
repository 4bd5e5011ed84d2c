"""TweedieMix-TPU: a TPU-native multi-concept diffusion fusion framework.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of
KwonGihyun/TweedieMix (arXiv 2410.05591): single-concept personalization
training of SDXL (Custom-Diffusion K/V finetune or LoRA), multi-concept
Tweedie-space fusion sampling, text-guided segmentation in the loop, and
image-to-video generation with first-frame feature injection.

Design stance (vs. the reference, which monkey-patches torch modules and
communicates between stages via the filesystem):

* concept deltas are *data*: stacked param pytrees with a leading concept
  axis, selected per batch row inside one batched UNet call;
* the fusion DDIM loop is a pair of jitted ``lax.scan``s split at the
  segmentation boundary;
* attention runs through a Pallas flash-attention kernel on TPU;
* multi-chip scaling uses ``jax.sharding.Mesh`` + collectives, not NCCL.
"""

__version__ = "0.1.0"

from tweediemix_tpu.schedulers.ddim import DDIMTable  # noqa: F401
