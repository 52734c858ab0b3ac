from .quantize import VectorQuantize, codebook_lookup
from .vqgan import Discriminator, VQModel, VQResBlock

__all__ = ["VectorQuantize", "codebook_lookup", "Discriminator", "VQModel", "VQResBlock"]
