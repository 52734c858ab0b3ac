from .attention import fused_attention, fused_attention_interpret
from .quantize import fused_codebook_lookup

__all__ = ["fused_attention", "fused_attention_interpret", "fused_codebook_lookup"]
