from .clip import (
    CLIPTextConfig,
    CLIPTextEncoder,
    CLIPVisionConfig,
    CLIPVisionEncoder,
    clip_preprocess,
    convert_hf_clip_text,
    convert_open_clip_text,
    convert_open_clip_vision,
)
from .t5 import T5Config, T5Encoder, convert_t5_encoder
from .tokenizers import (
    CLIPTokenizer,
    byt5_batch_encode,
    byt5_decode,
    byt5_encode,
    pad_bucket,
)

__all__ = [
    "CLIPTextConfig",
    "CLIPTextEncoder",
    "CLIPVisionConfig",
    "CLIPVisionEncoder",
    "clip_preprocess",
    "convert_hf_clip_text",
    "convert_open_clip_text",
    "convert_open_clip_vision",
    "T5Config",
    "T5Encoder",
    "convert_t5_encoder",
    "CLIPTokenizer",
    "byt5_batch_encode",
    "byt5_decode",
    "byt5_encode",
    "pad_bucket",
]
