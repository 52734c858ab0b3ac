"""Multi-head attention for the denoiser.

The reference wraps torch.nn.MultiheadAttention (reference: src/modules.py:7-19) and,
for structural editing, swaps in an eager reimplementation that multiplicatively
reweights the post-softmax attention matrix (reference: utils/alter_attention.py:4-43).
Here both capabilities live in one module: `MultiheadAttention` accepts an optional
`kv_mask` (so classifier-free-guidance batches with heterogeneous conditioning can be
run as ONE forward) and an optional `reweight` matrix (the structural-editing hook).

The attention core is a plain einsum pipeline — at Paella's sizes (<=1024 query
tokens, <=1800 kv tokens, head_dim 80) XLA fuses this competitively on the MXU; a
Pallas flash-attention kernel can be slotted in via `attention_fn`.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from . import init as tinit

Array = jax.Array

NEG_INF = -1e9  # mask fill value; fine for f32 and bf16 softmax inputs


def dot_product_attention(
    q: Array,
    k: Array,
    v: Array,
    kv_mask: Optional[Array] = None,
    reweight: Optional[Array] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[Array] = None,
    deterministic: bool = True,
) -> Array:
    """Attention over (B, N, H, D) queries and (B, S, H, D) keys/values.

    kv_mask: (B, S) bool, True = attend. Masked keys are excluded, which makes a
        zero-padded conditioning token exactly equivalent to an absent one.
    reweight: broadcastable to (B, H, N, S); multiplies post-softmax probabilities
        (reference: utils/alter_attention.py:34 `attention = attention * attn_weights`).
    """
    depth = q.shape[-1]
    scale = depth**-0.5
    logits = jnp.einsum("bnhd,bshd->bhns", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if kv_mask is not None:
        logits = jnp.where(kv_mask[:, None, None, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    if reweight is not None:
        probs = probs * reweight
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = probs * keep / (1.0 - dropout_rate)
    probs = probs.astype(v.dtype)
    return jnp.einsum("bhns,bshd->bnhd", probs, v)


class MultiheadAttention(nn.Module):
    """Equivalent of torch.nn.MultiheadAttention(c, nhead, bias=True, batch_first=True).

    Parameters are stored as separate q/k/v/o projections; the converter splits
    torch's packed in_proj_weight into thirds (the same split documented at
    reference: utils/alter_attention.py:9-10). Initialization replicates the packed
    xavier bound (see paella_tpu.nn.init.packed_qkv_xavier_uniform); out_proj is
    xavier-initialized because the reference's Paella._init_weights re-initializes
    it (reference: src/modules.py:206-210 applies to out_proj, an nn.Linear).
    """

    c: int
    nhead: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    attention_fn: Callable = staticmethod(dot_product_attention)

    @nn.compact
    def __call__(
        self,
        q: Array,
        kv: Array,
        kv_mask: Optional[Array] = None,
        reweight: Optional[Array] = None,
        deterministic: bool = True,
    ) -> Array:
        head_dim = self.c // self.nhead
        qkv_init = tinit.packed_qkv_xavier_uniform()
        dense = lambda name, init: nn.Dense(
            self.c, dtype=self.dtype, kernel_init=init, bias_init=tinit.zeros, name=name
        )
        xq = dense("q", qkv_init)(q)
        xk = dense("k", qkv_init)(kv)
        xv = dense("v", qkv_init)(kv)

        b, n, _ = xq.shape
        s = xk.shape[1]
        xq = xq.reshape(b, n, self.nhead, head_dim)
        xk = xk.reshape(b, s, self.nhead, head_dim)
        xv = xv.reshape(b, s, self.nhead, head_dim)

        dropout_rng = None
        if self.dropout > 0.0 and not deterministic:
            dropout_rng = self.make_rng("dropout")
        out = self.attention_fn(
            xq,
            xk,
            xv,
            kv_mask=kv_mask,
            reweight=reweight,
            dropout_rate=self.dropout,
            dropout_rng=dropout_rng,
            deterministic=deterministic,
        )
        out = out.reshape(b, n, self.c)
        return dense("o", tinit.xavier_uniform())(out)
