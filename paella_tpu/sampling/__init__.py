from .editing import build_cond_reweight, phrase_byte_span, reweight_for_phrase
from .sampler import (
    Conditioning,
    fast_key,
    interpolate_latents,
    merge_cfg_pair,
    outpaint_canvas,
    sample,
)

__all__ = [
    "Conditioning",
    "build_cond_reweight",
    "fast_key",
    "interpolate_latents",
    "merge_cfg_pair",
    "outpaint_canvas",
    "phrase_byte_span",
    "reweight_for_phrase",
    "sample",
]
