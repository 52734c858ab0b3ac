"""Native T5 encoder stack (ByT5 flavor) — the frozen text encoder.

The reference loads HF's torch T5EncoderModel for google/byt5-xl and runs it
eagerly under no_grad per batch (reference: src_distributed/utils.py:70-71,
src_distributed/train.py:83-84). Here the encoder is a jit-able flax module so the
text path fuses into the same XLA program as everything else, runs in bf16, and
can be sharded over the mesh. Weights convert from the HF torch checkpoint via
`convert_t5_encoder`.

Architecture (T5 v1.1 / ByT5): RMSNorm pre-norm blocks, relative position bias
(bucketed, computed once in block 0 and shared), no attention scaling (folded
into init per T5 convention), gated-GELU feed-forward.
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
class T5Config:
    vocab_size: int = 384  # ByT5: 256 bytes + 3 special + 125 extra ids
    d_model: int = 2560  # byt5-xl (hence byt5_embd=2560, src_distributed/train.py:48)
    d_kv: int = 64
    num_heads: int = 32
    d_ff: int = 6720
    num_layers: int = 36
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    dtype: str = "float32"
    # True W8A8 for the block linears: requires a quantize_t5_int8-transformed
    # param tree; activations are dynamically quantized per row and the dot
    # runs s8xs8->s32 on the double-rate MXU path (quant.w8a8_dot). Unlike
    # int8_weights alone (a memory lever, measured SLOWER), this converts the
    # halved weight traffic into encode speed. Opt-in, quality-gated like the
    # denoiser's act_quant.
    act_quant: bool = False

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    @classmethod
    def byt5_xl(cls, dtype: str = "bfloat16") -> "T5Config":
        return cls(dtype=dtype)

    @classmethod
    def byt5_small_like(cls) -> "T5Config":
        return cls(d_model=1472, d_ff=3584, num_layers=12, num_heads=6, dtype="float32")

    @classmethod
    def tiny(cls) -> "T5Config":
        return cls(vocab_size=384, d_model=32, d_kv=8, num_heads=4, d_ff=64, num_layers=2)


def rms_norm(x: Array, weight: Array, eps: float) -> Array:
    """T5LayerNorm: scale-only RMS norm, variance in f32."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    return (weight * (x32 * jax.lax.rsqrt(var + eps))).astype(dtype)


def relative_position_bucket(
    relative_position: Array, num_buckets: int = 32, max_distance: int = 128
) -> Array:
    """T5's bidirectional relative-position bucketing (log-spaced beyond half)."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class _T5Dense(nn.Module):
    """nn.Dense(use_bias=False) with optional int8 weight-only quantization.

    Param tree is identical to nn.Dense ({'kernel'}); if the supplied tree was
    transformed by `quant.quantize_t5_int8` (int8 kernel + a 'kernel_scale'
    sibling, never created at init), the kernel is either dequantized per
    output channel before a float matmul (weight-only; halves the encoder's
    HBM residency, 5.2 -> 2.6 GB for XL, latency a session-dependent wash —
    the dequant is VPU-bound) or, with act_quant=True, consumed directly by
    an s8xs8->s32 dot on the double-rate MXU (quant.w8a8_dot; measured
    faster at every prompt bucket). Both opt-in; see docs/quantization.md.
    """

    features: int
    dtype: jnp.dtype
    act_quant: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (x.shape[-1], self.features)
        )
        if self.has_variable("params", "kernel_scale"):
            from ..quant import dequantize_dense_int8, w8a8_dot

            scale = self.get_variable("params", "kernel_scale")
            if self.act_quant:
                return w8a8_dot(x, kernel, scale, self.dtype)
            kernel = dequantize_dense_int8(kernel, scale, self.dtype)
        else:
            kernel = kernel.astype(self.dtype)
        return jnp.dot(x.astype(self.dtype), kernel)


class T5Attention(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array], position_bias: Array) -> Array:
        cfg = self.cfg
        inner = cfg.num_heads * cfg.d_kv
        dense = lambda name: _T5Dense(inner, cfg.compute_dtype, cfg.act_quant, name=name)
        b, s, _ = x.shape
        q = dense("q")(x).reshape(b, s, cfg.num_heads, cfg.d_kv)
        k = dense("k")(x).reshape(b, s, cfg.num_heads, cfg.d_kv)
        v = dense("v")(x).reshape(b, s, cfg.num_heads, cfg.d_kv)
        # T5 omits the 1/sqrt(d) scale (folded into initialization)
        scores = jnp.einsum("bnhd,bshd->bhns", q, k, preferred_element_type=jnp.float32)
        scores = scores + position_bias.astype(jnp.float32)
        if mask is not None:
            scores = jnp.where(mask[:, None, None, :], scores, -1e9)
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhns,bshd->bnhd", probs, v).reshape(b, s, inner)
        return _T5Dense(cfg.d_model, cfg.compute_dtype, cfg.act_quant, name="o")(out)


class T5Block(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array], position_bias: Array) -> Array:
        cfg = self.cfg
        ln_a = self.param("attn_norm", nn.initializers.ones, (cfg.d_model,))
        h = rms_norm(x, ln_a, cfg.layer_norm_epsilon)
        x = x + T5Attention(cfg, name="attention")(h, mask, position_bias)

        ln_f = self.param("ff_norm", nn.initializers.ones, (cfg.d_model,))
        h = rms_norm(x, ln_f, cfg.layer_norm_epsilon)
        wi0 = _T5Dense(cfg.d_ff, cfg.compute_dtype, cfg.act_quant, name="wi_0")(h)
        wi1 = _T5Dense(cfg.d_ff, cfg.compute_dtype, cfg.act_quant, name="wi_1")(h)
        # T5 v1.1 'gelu_new' = tanh-approximated GELU
        h = jax.nn.gelu(wi0, approximate=True) * wi1
        x = x + _T5Dense(cfg.d_model, cfg.compute_dtype, cfg.act_quant, name="wo")(h)
        return x


class T5Encoder(nn.Module):
    """Returns last_hidden_state (B, S, d_model), matching HF T5EncoderModel."""

    cfg: T5Config

    @nn.compact
    def __call__(self, input_ids: Array, attention_mask: Optional[Array] = None) -> Array:
        cfg = self.cfg
        emb = self.param(
            "token_embedding",
            nn.initializers.normal(1.0),
            (cfg.vocab_size, cfg.d_model),
        )
        x = jnp.take(emb, input_ids, axis=0).astype(cfg.compute_dtype)

        s = input_ids.shape[1]
        rel_emb = self.param(
            "relative_attention_bias",
            nn.initializers.normal(1.0),
            (cfg.relative_attention_num_buckets, cfg.num_heads),
        )
        pos = jnp.arange(s)
        rel = pos[None, :] - pos[:, None]  # memory_pos - query_pos
        buckets = relative_position_bucket(
            rel, cfg.relative_attention_num_buckets, cfg.relative_attention_max_distance
        )
        position_bias = jnp.take(rel_emb, buckets, axis=0).transpose(2, 0, 1)[None]

        for i in range(cfg.num_layers):
            x = T5Block(cfg, name=f"block_{i}")(x, attention_mask, position_bias)

        ln = self.param("final_norm", nn.initializers.ones, (cfg.d_model,))
        return rms_norm(x, ln, cfg.layer_norm_epsilon)


def convert_t5_encoder(sd, cfg: T5Config) -> dict:
    """HF torch T5EncoderModel state_dict (numpy values) -> T5Encoder params."""

    def w(key):
        return np.ascontiguousarray(sd[key].T)

    params = {
        "token_embedding": sd["shared.weight"],
        "relative_attention_bias": sd[
            "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"
        ],
        "final_norm": sd["encoder.final_layer_norm.weight"],
    }
    for i in range(cfg.num_layers):
        p = f"encoder.block.{i}"
        params[f"block_{i}"] = {
            "attn_norm": sd[f"{p}.layer.0.layer_norm.weight"],
            "ff_norm": sd[f"{p}.layer.1.layer_norm.weight"],
            "attention": {
                "q": {"kernel": w(f"{p}.layer.0.SelfAttention.q.weight")},
                "k": {"kernel": w(f"{p}.layer.0.SelfAttention.k.weight")},
                "v": {"kernel": w(f"{p}.layer.0.SelfAttention.v.weight")},
                "o": {"kernel": w(f"{p}.layer.0.SelfAttention.o.weight")},
            },
            "wi_0": {"kernel": w(f"{p}.layer.1.DenseReluDense.wi_0.weight")},
            "wi_1": {"kernel": w(f"{p}.layer.1.DenseReluDense.wi_1.weight")},
            "wo": {"kernel": w(f"{p}.layer.1.DenseReluDense.wo.weight")},
        }
    return params
