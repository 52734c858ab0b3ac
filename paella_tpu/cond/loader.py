"""Frozen conditioning-model loader — the reference's load_conditional_models
(reference: src_distributed/utils.py:65-82) rebuilt for JAX.

Loads the converted VQGAN + ByT5 encoder + CLIP towers and returns jit'd encode
callables ready for PaellaPipeline. All weights come from local files (torch
checkpoints are converted on the fly); nothing is downloaded.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..codec.vqgan import VQModel
from ..config import VQConfig
from .clip import (
    CLIPTextConfig,
    CLIPTextEncoder,
    CLIPVisionConfig,
    CLIPVisionEncoder,
    clip_preprocess,
    convert_open_clip_text,
    convert_open_clip_vision,
)
from .t5 import T5Config, T5Encoder, convert_t5_encoder
from .tokenizers import CLIPTokenizer


Array = jax.Array


@dataclasses.dataclass
class ConditionalModels:
    """Bundle returned by load_conditional_models: the codec plus jit'd frozen
    encoder callables (mirrors the reference's (vqgan, clip triple, byt5 pair))."""

    vq: VQModel
    vq_vars: dict
    byt5_encode: Callable[[Array, Array], Array]  # (ids, mask) -> states
    clip_text_encode: Optional[Callable[[Sequence[str]], Array]] = None
    clip_image_encode: Optional[Callable[[Array], Array]] = None


def load_vqgan(path: str, cfg: VQConfig = VQConfig()) -> Tuple[VQModel, dict]:
    """Converted reference VQGAN checkpoint -> (model, variables)."""
    from ..convert import convert_vqgan, load_torch_state_dict

    sd = load_torch_state_dict(path)
    variables = jax.tree_util.tree_map(jnp.asarray, convert_vqgan(sd, cfg))
    return VQModel(cfg), variables


def load_byt5(
    path: str, cfg: T5Config, int8_weights: bool = False
) -> Callable[[Array, Array], Array]:
    """Converted HF ByT5 torch checkpoint -> jit'd (ids, mask) -> states.

    int8_weights=True stores the block linears as per-channel int8
    (quant.quantize_t5_int8), halving the encoder's HBM residency
    (5.2 -> 2.6 GB) at <=0.5% relative output error. Weight-only (the
    default cfg) is primarily a MEMORY lever (latency vs bf16 is a
    session-dependent wash; the XLA-path dequant is VPU-bound). Combine
    with cfg.act_quant=True for true W8A8, which consumes the s8 kernels
    directly on the double-rate MXU path (quant.w8a8_dot) — measured
    faster than bf16 at every prompt bucket (scripts/bench_byt5.py A/B/C;
    docs/quantization.md).
    """
    from ..convert.torch_import import load_torch_state_dict

    if cfg.act_quant and not int8_weights:
        raise ValueError("cfg.act_quant=True requires int8_weights=True")
    sd = load_torch_state_dict(path, key=None)
    params = jax.tree_util.tree_map(jnp.asarray, convert_t5_encoder(sd, cfg))
    if int8_weights:
        from ..quant import quantize_t5_int8

        params = jax.jit(quantize_t5_int8)(params)
    model = T5Encoder(cfg)

    # Closure over params, deliberately: it dispatches ~7 ms/call faster than
    # passing the 519-leaf tree as jit arguments (measured on the tunneled
    # backend; serving loads once and encodes per-request). The tradeoff is a
    # slow FIRST compile on remote backends (captured 5.2 GB constants); use
    # the params-as-argument form for throwaway weights (scripts/bench_byt5.py).
    @jax.jit
    def encode(ids: Array, mask: Array) -> Array:
        return model.apply({"params": params}, ids, mask)

    return encode


def load_open_clip(
    path: str,
    text_cfg: CLIPTextConfig = CLIPTextConfig.vit_h_14(),
    vision_cfg: CLIPVisionConfig = CLIPVisionConfig.vit_h_14(),
    tokenizer: Optional[Callable[[Sequence[str]], np.ndarray]] = None,
    bpe_path: Optional[str] = None,
) -> Tuple[Callable, Callable]:
    """Converted open_clip checkpoint -> (text_encode(prompts), image_encode(imgs)).

    Tokenization is native (cond/tokenizers.py::CLIPTokenizer): pass `bpe_path`
    pointing at the standard `bpe_simple_vocab_16e6.txt.gz` merge table (data,
    shipped with every CLIP distribution — this environment has zero egress so
    it cannot be bundled). Alternatively pass `tokenizer` (prompts -> (B,77)
    ids) to override, e.g. open_clip's own tokenizer for A/B checks.
    """
    from ..convert.torch_import import load_torch_state_dict

    sd = load_torch_state_dict(path, key=None)
    text_params = jax.tree_util.tree_map(jnp.asarray, convert_open_clip_text(sd, text_cfg))
    vision_params = jax.tree_util.tree_map(jnp.asarray, convert_open_clip_vision(sd, vision_cfg))
    text_model = CLIPTextEncoder(text_cfg)
    vision_model = CLIPVisionEncoder(vision_cfg)

    if tokenizer is None:
        if bpe_path is None:
            raise ValueError(
                "no CLIP tokenizer: pass bpe_path= (the bpe_simple_vocab_16e6"
                ".txt.gz merge table) for the native BPE, or tokenizer= "
                "(prompts -> (B,77) ids)"
            )
        tokenizer = CLIPTokenizer(bpe_path)

    # Closures over params (see load_byt5: faster per-request dispatch; slow
    # first compile on remote backends is paid once at load)
    @jax.jit
    def _encode_text_ids(ids: Array) -> Array:
        return text_model.apply({"params": text_params}, ids)

    def text_encode(prompts: Sequence[str]) -> Array:
        return _encode_text_ids(jnp.asarray(tokenizer(prompts)))

    @jax.jit
    def image_encode(images: Array) -> Array:
        return vision_model.apply(
            {"params": vision_params}, clip_preprocess(images, vision_cfg.image_size)
        )

    return text_encode, image_encode


def load_conditional_models(
    vqgan_path: str,
    byt5_path: Optional[str] = None,
    byt5_cfg: Optional[T5Config] = None,
    clip_path: Optional[str] = None,
    clip_bpe_path: Optional[str] = None,
    clip_tokenizer: Optional[Callable[[Sequence[str]], np.ndarray]] = None,
    clip_text_cfg: Optional[CLIPTextConfig] = None,
    clip_vision_cfg: Optional[CLIPVisionConfig] = None,
    vq_cfg: VQConfig = VQConfig(),
    byt5_int8: bool = False,
) -> ConditionalModels:
    """One-call loader mirroring reference load_conditional_models
    (src_distributed/utils.py:65-82): frozen VQGAN (+ optionally ByT5 + CLIP).

    CLIP needs a tokenizer: pass `clip_bpe_path` (the standard
    bpe_simple_vocab_16e6.txt.gz merge table) for the native BPE, or
    `clip_tokenizer` (prompts -> (B,77) ids) to override.
    """
    vq, vq_vars = load_vqgan(vqgan_path, vq_cfg)
    byt5_encode = None
    if byt5_path is not None:
        byt5_encode = load_byt5(
            byt5_path, byt5_cfg or T5Config.byt5_xl(), int8_weights=byt5_int8
        )
    clip_text = clip_image = None
    if clip_path is not None:
        clip_text, clip_image = load_open_clip(
            clip_path,
            text_cfg=clip_text_cfg or CLIPTextConfig.vit_h_14(),
            vision_cfg=clip_vision_cfg or CLIPVisionConfig.vit_h_14(),
            tokenizer=clip_tokenizer,
            bpe_path=clip_bpe_path,
        )
    return ConditionalModels(
        vq=vq,
        vq_vars=vq_vars,
        byt5_encode=byt5_encode,
        clip_text_encode=clip_text,
        clip_image_encode=clip_image,
    )
