from .sampler import (
    Conditioning,
    interpolate_latents,
    merge_cfg_pair,
    outpaint_canvas,
    sample,
)

__all__ = [
    "Conditioning",
    "interpolate_latents",
    "merge_cfg_pair",
    "outpaint_canvas",
    "sample",
]
