from .quantize import VectorQuantize, codebook_lookup
from .trainer import CodecTrainConfig, create_codec_train_state, make_codec_train_step
from .vqgan import Discriminator, VQModel, VQResBlock

__all__ = [
    "VectorQuantize",
    "codebook_lookup",
    "CodecTrainConfig",
    "create_codec_train_state",
    "make_codec_train_step",
    "Discriminator",
    "VQModel",
    "VQResBlock",
]
