"""Pallas TPU kernel: fused joint self+cross attention.

The denoiser's hot attention shapes (1B config, 256x256 images) are
N in {256, 64} query tokens, S = N + ~72-780 conditioning tokens, 16 heads of
dim 80. Per (batch, head) the whole problem fits VMEM, so the kernel computes
QK^T -> mask -> softmax -> PV in one VMEM-resident pass — the (N, S) score
matrix never touches HBM (XLA's unfused fallback materializes it).

Head dim 80 is lane-padded to 128; query/key lengths are padded to sublane/lane
multiples and padding keys are masked. Drop-in replacement for
paella_tpu.nn.attention.dot_product_attention (pass it as
MultiheadAttention.attention_fn); falls back to the XLA path when the structural
-editing `reweight` hook or dropout is active (training uses XLA attention).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..nn.attention import dot_product_attention

Array = jax.Array


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float):
    q = q_ref[0]  # (Np, Dp)
    k = k_ref[0]  # (Sp, Dp)
    v = v_ref[0]
    scores = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    scores = scores * scale
    mask = mask_ref[0]  # (1, Sp) int32 (1 = attend)
    scores = jnp.where(mask > 0, scores, -1e9)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o_ref[0] = jax.lax.dot_general(
        p.astype(v.dtype),
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def fused_attention(
    q: Array,
    k: Array,
    v: Array,
    kv_mask: Optional[Array] = None,
    reweight: Optional[Array] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[Array] = None,
    deterministic: bool = True,
    interpret: bool = False,
) -> Array:
    """Same contract as dot_product_attention: q (B,N,H,D), k/v (B,S,H,D),
    kv_mask (B,S) bool -> (B,N,H,D)."""
    if reweight is not None or (dropout_rate > 0.0 and not deterministic):
        # editing / training paths keep the XLA implementation
        return dot_product_attention(
            q, k, v, kv_mask=kv_mask, reweight=reweight,
            dropout_rate=dropout_rate, dropout_rng=dropout_rng, deterministic=deterministic,
        )

    from jax.experimental import pallas as pl

    b, n, h, d = q.shape
    s = k.shape[1]
    dp = _round_up(d, 128)
    np_ = _round_up(n, 8)
    sp = _round_up(s, 128)
    scale = d**-0.5  # scale uses the TRUE head dim, not the padded one

    qt = jnp.pad(q.transpose(0, 2, 1, 3), ((0, 0), (0, 0), (0, np_ - n), (0, dp - d)))
    kt = jnp.pad(k.transpose(0, 2, 1, 3), ((0, 0), (0, 0), (0, sp - s), (0, dp - d)))
    vt = jnp.pad(v.transpose(0, 2, 1, 3), ((0, 0), (0, 0), (0, sp - s), (0, dp - d)))
    qt = qt.reshape(b * h, np_, dp)
    kt = kt.reshape(b * h, sp, dp)
    vt = vt.reshape(b * h, sp, dp)

    if kv_mask is None:
        kv_mask = jnp.ones((b, s), bool)
    mask = jnp.pad(kv_mask.astype(jnp.int32), ((0, 0), (0, sp - s)))[:, None, :]  # (B,1,Sp)

    grid = (b * h,)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, np_, dp), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, sp, dp), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, sp, dp), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, sp), lambda i: (i // h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, np_, dp), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, np_, dp), q.dtype),
        interpret=interpret,
    )(qt, kt, vt, mask)

    out = out.reshape(b, h, np_, dp)[:, :, :n, :d].transpose(0, 2, 1, 3)
    return out


def fused_attention_interpret(*args, **kwargs):
    """Interpreter-mode variant for CPU tests."""
    return fused_attention(*args, **kwargs, interpret=True)
