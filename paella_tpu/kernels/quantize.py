"""Pallas TPU kernel: fused codebook nearest-neighbor search.

The codec's quantizer needs argmin_k |z - e_k|^2 over 8192 codes for every token
(reference geometry: 64x64 tokens, codebook 8192x4, src/vqgan.py:46). Unfused,
XLA materializes the (tokens, 8192) distance matrix in HBM (134 MB at batch-1
f32) before reducing. This kernel streams codebook tiles through VMEM and keeps a
running (min, argmin) per token, so HBM sees only inputs and the final indices.

Lane-padding: code dim (4) pads to 128; codebook rows pad to the tile size with
+inf squared-norms so padding never wins the argmin.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _nn_kernel(z_ref, cb_ref, cbn_ref, idx_ref, *, k_tiles: int, tk: int):
    from jax.experimental import pallas as pl

    z = z_ref[...]  # (TM, Cp)
    tm = z.shape[0]

    def body(t, carry):
        best_d, best_i = carry
        cb = cb_ref[pl.ds(t * tk, tk), :]  # (TK, Cp)
        cbn = cbn_ref[0, pl.ds(t * tk, tk)]  # (TK,)
        dots = jax.lax.dot_general(
            z, cb, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (TM, TK)
        dist = cbn[None, :] - 2.0 * dots  # |z|^2 constant over codes -> dropped
        local_i = jnp.argmin(dist, axis=1)  # (TM,)
        local_d = jnp.min(dist, axis=1)
        take = local_d < best_d[:, 0]
        best_d = jnp.where(take[:, None], local_d[:, None], best_d)
        best_i = jnp.where(take[:, None], (local_i + t * tk).astype(jnp.int32)[:, None], best_i)
        return best_d, best_i

    init = (jnp.full((tm, 1), jnp.inf, jnp.float32), jnp.zeros((tm, 1), jnp.int32))
    _, best_i = jax.lax.fori_loop(0, k_tiles, body, init)
    idx_ref[...] = best_i


def fused_codebook_lookup(
    z: Array, codebook: Array, tile_m: int = 512, tile_k: int = 1024, interpret: bool = False
) -> Array:
    """Nearest-neighbor indices of z (..., c) in codebook (K, c) — fused on TPU.

    Drop-in replacement for paella_tpu.codec.quantize.codebook_lookup.
    """
    from jax.experimental import pallas as pl

    orig_shape = z.shape[:-1]
    c = z.shape[-1]
    k = codebook.shape[0]
    flat = z.reshape(-1, c).astype(jnp.float32)
    m = flat.shape[0]

    cp = _round_up(c, 128)
    mp = _round_up(max(m, 8), tile_m) if m > tile_m else _round_up(m, 8)
    tm = min(tile_m, mp)
    mp = _round_up(mp, tm)
    kp = _round_up(k, tile_k)
    tk = min(tile_k, kp)
    k_tiles = kp // tk

    zp = jnp.pad(flat, ((0, mp - m), (0, cp - c)))
    cbp = jnp.pad(codebook.astype(jnp.float32), ((0, kp - k), (0, cp - c)))
    cbn = jnp.sum(cbp * cbp, axis=-1)
    # padded codes must never win
    cbn = jnp.where(jnp.arange(kp) < k, cbn, jnp.inf)[None, :]  # (1, Kp)

    idx = pl.pallas_call(
        functools.partial(_nn_kernel, k_tiles=k_tiles, tk=tk),
        grid=(mp // tm,),
        in_specs=[
            pl.BlockSpec((tm, cp), lambda i: (i, 0)),
            pl.BlockSpec((kp, cp), lambda i: (0, 0)),
            pl.BlockSpec((1, kp), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tm, 1), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((mp, 1), jnp.int32),
        interpret=interpret,
    )(zp, cbp, cbn)

    return idx[:m, 0].reshape(orig_shape)
