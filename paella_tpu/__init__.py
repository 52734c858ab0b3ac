"""paella-tpu: TPU-native (JAX/XLA/Pallas/pjit) framework for discrete token-space
text-to-image generation, capability-equivalent to the reference dome272/Paella.

Layout conventions (TPU-first, differs from the NCHW reference):
- images:  (B, H, W, 3) float in [0, 1]
- latents: (B, h, w, c_latent) continuous / (B, h, w) int32 token grids
- logits:  (B, h, w, codebook_size)
"""

from .config import PaellaConfig, SampleConfig, TrainConfig, VQConfig

__version__ = "0.1.0"

__all__ = ["PaellaConfig", "SampleConfig", "TrainConfig", "VQConfig", "__version__"]
