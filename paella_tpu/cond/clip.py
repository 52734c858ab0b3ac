"""Native CLIP text + vision towers — the frozen image/text-embedding encoders.

The reference loads open_clip ViT-H-14 (laion2b_s32b_b79k) and calls
encode_text / encode_image eagerly per batch (reference:
src_distributed/utils.py:73-75, src_distributed/train.py:91-97). Here both towers
are flax modules (jit-able, bf16, shardable); weights convert from either the HF
CLIPModel or the open_clip checkpoint layouts.

encode_text returns the UN-normalized projected feature at the EOT token and
encode_image the un-normalized projected class-token feature, matching what the
reference feeds the denoiser (it never L2-normalizes, src_distributed/train.py:92,97).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    width: int = 1024  # ViT-H text tower
    heads: int = 16
    layers: int = 24
    context_length: int = 77
    embed_dim: int = 1024  # projected output dim (clip_embd in the denoiser)
    layer_norm_eps: float = 1e-5
    dtype: str = "float32"

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    @classmethod
    def vit_h_14(cls, dtype: str = "bfloat16"):
        return cls(dtype=dtype)

    @classmethod
    def tiny(cls):
        return cls(vocab_size=64, width=32, heads=4, layers=2, context_length=16, embed_dim=24)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    width: int = 1280  # ViT-H vision tower
    heads: int = 16
    layers: int = 32
    embed_dim: int = 1024
    layer_norm_eps: float = 1e-5
    dtype: str = "float32"

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    @classmethod
    def vit_h_14(cls, dtype: str = "bfloat16"):
        return cls(dtype=dtype)

    @classmethod
    def tiny(cls):
        return cls(image_size=32, patch_size=8, width=32, heads=4, layers=2, embed_dim=24)


def _layer_norm(x: Array, scale: Array, bias: Array, eps: float) -> Array:
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return (((x32 - mean) * jax.lax.rsqrt(var + eps)) * scale + bias).astype(dtype)


class _LN(nn.Module):
    dim: int
    eps: float

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return _layer_norm(x, scale, bias, self.eps)


class _CLIPAttention(nn.Module):
    width: int
    heads: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x: Array, causal: bool, mask: Optional[Array] = None) -> Array:
        d = self.width // self.heads
        b, s, _ = x.shape
        dense = lambda name: nn.Dense(self.width, dtype=self.dtype, name=name)
        q = dense("q")(x).reshape(b, s, self.heads, d)
        k = dense("k")(x).reshape(b, s, self.heads, d)
        v = dense("v")(x).reshape(b, s, self.heads, d)
        scores = jnp.einsum("bnhd,bshd->bhns", q, k, preferred_element_type=jnp.float32) * (
            d**-0.5
        )
        if causal:
            causal_mask = jnp.tril(jnp.ones((s, s), bool))
            scores = jnp.where(causal_mask[None, None], scores, -1e9)
        if mask is not None:
            scores = jnp.where(mask[:, None, None, :], scores, -1e9)
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhns,bshd->bnhd", probs, v).reshape(b, s, self.width)
        return dense("o")(out)


class _CLIPBlock(nn.Module):
    width: int
    heads: int
    eps: float
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x: Array, causal: bool, mask: Optional[Array] = None) -> Array:
        h = _LN(self.width, self.eps, name="ln1")(x)
        x = x + _CLIPAttention(self.width, self.heads, self.dtype, name="attn")(h, causal, mask)
        h = _LN(self.width, self.eps, name="ln2")(x)
        h = nn.Dense(self.width * 4, dtype=self.dtype, name="fc1")(h)
        h = jax.nn.gelu(h, approximate=False)  # ViT-H-14 laion2b uses exact GELU
        x = x + nn.Dense(self.width, dtype=self.dtype, name="fc2")(h)
        return x


class CLIPTextEncoder(nn.Module):
    """encode_text: causal transformer over BPE tokens; feature = projected
    hidden state at the EOT position (the max token id in CLIP's vocab)."""

    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, input_ids: Array) -> Array:
        cfg = self.cfg
        tok = self.param(
            "token_embedding", nn.initializers.normal(0.02), (cfg.vocab_size, cfg.width)
        )
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.01), (cfg.context_length, cfg.width)
        )
        s = input_ids.shape[1]
        x = (jnp.take(tok, input_ids, axis=0) + pos[:s]).astype(cfg.compute_dtype)
        for i in range(cfg.layers):
            x = _CLIPBlock(cfg.width, cfg.heads, cfg.layer_norm_eps, cfg.compute_dtype, name=f"block_{i}")(
                x, causal=True
            )
        x = _LN(cfg.width, cfg.layer_norm_eps, name="ln_final")(x)
        # EOT token = highest id in each sequence (open_clip convention)
        eot = jnp.argmax(input_ids, axis=-1)
        feats = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
        proj = self.param(
            "text_projection", nn.initializers.normal(0.02), (cfg.width, cfg.embed_dim)
        )
        return feats @ proj.astype(feats.dtype)


class CLIPVisionEncoder(nn.Module):
    """encode_image: ViT over patch embeddings + class token; feature = projected
    post-LN class token."""

    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, images: Array) -> Array:
        cfg = self.cfg
        p = cfg.patch_size
        x = nn.Conv(
            cfg.width,
            (p, p),
            strides=(p, p),
            padding="VALID",
            use_bias=False,
            dtype=cfg.compute_dtype,
            name="patch_embed",
        )(images.astype(cfg.compute_dtype))
        b, gh, gw, w = x.shape
        x = x.reshape(b, gh * gw, w)
        cls = self.param("class_embedding", nn.initializers.normal(0.02), (cfg.width,))
        n_pos = (cfg.image_size // p) ** 2 + 1
        pos = self.param("position_embedding", nn.initializers.normal(0.01), (n_pos, cfg.width))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, cfg.width)).astype(x.dtype), x], axis=1)
        x = x + pos[: x.shape[1]].astype(x.dtype)
        x = _LN(cfg.width, cfg.layer_norm_eps, name="ln_pre")(x)
        for i in range(cfg.layers):
            x = _CLIPBlock(cfg.width, cfg.heads, cfg.layer_norm_eps, cfg.compute_dtype, name=f"block_{i}")(
                x, causal=False
            )
        cls_out = _LN(cfg.width, cfg.layer_norm_eps, name="ln_post")(x[:, 0])
        proj = self.param(
            "visual_projection", nn.initializers.normal(0.02), (cfg.width, cfg.embed_dim)
        )
        return cls_out @ proj.astype(cls_out.dtype)


def clip_preprocess(images: Array, size: int = 224) -> Array:
    """Resize (bicubic) + CLIP-normalize, NHWC in [0,1]
    (reference: src_distributed/utils.py:77-80)."""
    mean = jnp.array([0.48145466, 0.4578275, 0.40821073])
    std = jnp.array([0.26862954, 0.26130258, 0.27577711])
    b, h, w, c = images.shape
    if (h, w) != (size, size):
        images = jax.image.resize(images, (b, size, size, c), method="bicubic")
    return (images - mean) / std


# ---------------------------------------------------------------------------
# weight converters
# ---------------------------------------------------------------------------


def _split_packed_qkv(w, b, width):
    wq, wk, wv = w[:width], w[width : 2 * width], w[2 * width :]
    bq, bk, bv = b[:width], b[width : 2 * width], b[2 * width :]
    return wq, wk, wv, bq, bk, bv


def convert_open_clip_text(sd, cfg: CLIPTextConfig) -> dict:
    """open_clip text tower state_dict (numpy) -> CLIPTextEncoder params.
    Keys: token_embedding.weight, positional_embedding, text_projection,
    transformer.resblocks.{i}.{ln_1,attn,ln_2,mlp}."""
    params = {
        "token_embedding": sd["token_embedding.weight"],
        "position_embedding": sd["positional_embedding"],
        "text_projection": sd["text_projection"],  # already (width, embed_dim)
        "ln_final": {"scale": sd["ln_final.weight"], "bias": sd["ln_final.bias"]},
    }
    for i in range(cfg.layers):
        p = f"transformer.resblocks.{i}"
        wq, wk, wv, bq, bk, bv = _split_packed_qkv(
            sd[f"{p}.attn.in_proj_weight"], sd[f"{p}.attn.in_proj_bias"], cfg.width
        )
        params[f"block_{i}"] = {
            "ln1": {"scale": sd[f"{p}.ln_1.weight"], "bias": sd[f"{p}.ln_1.bias"]},
            "ln2": {"scale": sd[f"{p}.ln_2.weight"], "bias": sd[f"{p}.ln_2.bias"]},
            "attn": {
                "q": {"kernel": np.ascontiguousarray(wq.T), "bias": bq},
                "k": {"kernel": np.ascontiguousarray(wk.T), "bias": bk},
                "v": {"kernel": np.ascontiguousarray(wv.T), "bias": bv},
                "o": {
                    "kernel": np.ascontiguousarray(sd[f"{p}.attn.out_proj.weight"].T),
                    "bias": sd[f"{p}.attn.out_proj.bias"],
                },
            },
            "fc1": {
                "kernel": np.ascontiguousarray(sd[f"{p}.mlp.c_fc.weight"].T),
                "bias": sd[f"{p}.mlp.c_fc.bias"],
            },
            "fc2": {
                "kernel": np.ascontiguousarray(sd[f"{p}.mlp.c_proj.weight"].T),
                "bias": sd[f"{p}.mlp.c_proj.bias"],
            },
        }
    return params


def convert_open_clip_vision(sd, cfg: CLIPVisionConfig) -> dict:
    """open_clip visual tower state_dict (numpy, keys under 'visual.') ->
    CLIPVisionEncoder params."""
    params = {
        "patch_embed": {
            # torch conv (width, 3, p, p) -> HWIO
            "kernel": np.ascontiguousarray(sd["visual.conv1.weight"].transpose(2, 3, 1, 0))
        },
        "class_embedding": sd["visual.class_embedding"],
        "position_embedding": sd["visual.positional_embedding"],
        "visual_projection": sd["visual.proj"],  # (width, embed_dim)
        "ln_pre": {"scale": sd["visual.ln_pre.weight"], "bias": sd["visual.ln_pre.bias"]},
        "ln_post": {"scale": sd["visual.ln_post.weight"], "bias": sd["visual.ln_post.bias"]},
    }
    for i in range(cfg.layers):
        p = f"visual.transformer.resblocks.{i}"
        wq, wk, wv, bq, bk, bv = _split_packed_qkv(
            sd[f"{p}.attn.in_proj_weight"], sd[f"{p}.attn.in_proj_bias"], cfg.width
        )
        params[f"block_{i}"] = {
            "ln1": {"scale": sd[f"{p}.ln_1.weight"], "bias": sd[f"{p}.ln_1.bias"]},
            "ln2": {"scale": sd[f"{p}.ln_2.weight"], "bias": sd[f"{p}.ln_2.bias"]},
            "attn": {
                "q": {"kernel": np.ascontiguousarray(wq.T), "bias": bq},
                "k": {"kernel": np.ascontiguousarray(wk.T), "bias": bk},
                "v": {"kernel": np.ascontiguousarray(wv.T), "bias": bv},
                "o": {
                    "kernel": np.ascontiguousarray(sd[f"{p}.attn.out_proj.weight"].T),
                    "bias": sd[f"{p}.attn.out_proj.bias"],
                },
            },
            "fc1": {
                "kernel": np.ascontiguousarray(sd[f"{p}.mlp.c_fc.weight"].T),
                "bias": sd[f"{p}.mlp.c_fc.bias"],
            },
            "fc2": {
                "kernel": np.ascontiguousarray(sd[f"{p}.mlp.c_proj.weight"].T),
                "bias": sd[f"{p}.mlp.c_proj.bias"],
            },
        }
    return params


def convert_hf_clip_vision(sd, cfg: CLIPVisionConfig) -> dict:
    """HF transformers CLIPVisionModelWithProjection state_dict -> params."""
    prefix = "vision_model."
    params = {
        "patch_embed": {
            "kernel": np.ascontiguousarray(
                sd[f"{prefix}embeddings.patch_embedding.weight"].transpose(2, 3, 1, 0)
            )
        },
        "class_embedding": sd[f"{prefix}embeddings.class_embedding"],
        "position_embedding": sd[f"{prefix}embeddings.position_embedding.weight"],
        "visual_projection": np.ascontiguousarray(sd["visual_projection.weight"].T),
        "ln_pre": {
            "scale": sd[f"{prefix}pre_layrnorm.weight"],
            "bias": sd[f"{prefix}pre_layrnorm.bias"],
        },
        "ln_post": {
            "scale": sd[f"{prefix}post_layernorm.weight"],
            "bias": sd[f"{prefix}post_layernorm.bias"],
        },
    }
    for i in range(cfg.layers):
        p = f"{prefix}encoder.layers.{i}"
        params[f"block_{i}"] = {
            "ln1": {"scale": sd[f"{p}.layer_norm1.weight"], "bias": sd[f"{p}.layer_norm1.bias"]},
            "ln2": {"scale": sd[f"{p}.layer_norm2.weight"], "bias": sd[f"{p}.layer_norm2.bias"]},
            "attn": {
                name: {
                    "kernel": np.ascontiguousarray(sd[f"{p}.self_attn.{t}_proj.weight"].T),
                    "bias": sd[f"{p}.self_attn.{t}_proj.bias"],
                }
                for name, t in (("q", "q"), ("k", "k"), ("v", "v"), ("o", "out"))
            },
            "fc1": {
                "kernel": np.ascontiguousarray(sd[f"{p}.mlp.fc1.weight"].T),
                "bias": sd[f"{p}.mlp.fc1.bias"],
            },
            "fc2": {
                "kernel": np.ascontiguousarray(sd[f"{p}.mlp.fc2.weight"].T),
                "bias": sd[f"{p}.mlp.fc2.bias"],
            },
        }
    return params


def convert_hf_clip_text(sd, cfg: CLIPTextConfig) -> dict:
    """HF transformers CLIPTextModelWithProjection state_dict -> params."""
    prefix = "text_model."
    params = {
        "token_embedding": sd[f"{prefix}embeddings.token_embedding.weight"],
        "position_embedding": sd[f"{prefix}embeddings.position_embedding.weight"],
        "text_projection": np.ascontiguousarray(sd["text_projection.weight"].T),
        "ln_final": {
            "scale": sd[f"{prefix}final_layer_norm.weight"],
            "bias": sd[f"{prefix}final_layer_norm.bias"],
        },
    }
    for i in range(cfg.layers):
        p = f"{prefix}encoder.layers.{i}"
        params[f"block_{i}"] = {
            "ln1": {"scale": sd[f"{p}.layer_norm1.weight"], "bias": sd[f"{p}.layer_norm1.bias"]},
            "ln2": {"scale": sd[f"{p}.layer_norm2.weight"], "bias": sd[f"{p}.layer_norm2.bias"]},
            "attn": {
                name: {
                    "kernel": np.ascontiguousarray(sd[f"{p}.self_attn.{t}_proj.weight"].T),
                    "bias": sd[f"{p}.self_attn.{t}_proj.bias"],
                }
                for name, t in (("q", "q"), ("k", "k"), ("v", "v"), ("o", "out"))
            },
            "fc1": {
                "kernel": np.ascontiguousarray(sd[f"{p}.mlp.fc1.weight"].T),
                "bias": sd[f"{p}.mlp.fc1.bias"],
            },
            "fc2": {
                "kernel": np.ascontiguousarray(sd[f"{p}.mlp.fc2.weight"].T),
                "bias": sd[f"{p}.mlp.fc2.bias"],
            },
        }
    return params
