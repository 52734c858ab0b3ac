"""Pallas TPU kernel: fused joint self+cross attention BLOCK.

The denoiser's AttnBlock (nn/blocks.py, reference src/modules.py:65-79) as one
pallas_call: LN(x) -> packed QKV projection of [pixel tokens ; cond kv] ->
batched per-head scores/softmax/PV in VMEM -> output projection -> +x
residual. The XLA version is ~8 dispatches per repetition whose per-op
overhead dominates at the deeper UNet levels (traced ~150 us/rep for 64-token
level-2 repetitions vs a ~65 us floor).

Head padding: Mosaic cannot shape-cast a lane dimension into (heads, 80), so
each head is zero-padded to 128 lanes IN THE WEIGHTS (done once in the
wrapper, hoisted out of the sampling scan). Padded q/k lanes contribute zero
to the scores and padded v lanes produce zeros that the o-projection's zeroed
rows ignore — the math is exact, the cost is extra projection FLOPs
(128/head_dim x), which is why the call site gates this kernel to the small
deep levels where dispatch overhead, not FLOPs, dominates.

Same scalar-prefetch scan-stacked weight scheme as kernels/resblock.py.
Falls back at the call site for attention reweighting (editing); cond masks
are handled in-kernel.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

NEG_INF = -1e9  # matches nn/attention.py mask fill
HD_PAD = 128


def _kernel(
    idx_ref,       # scalar prefetch: (1,) repetition index
    x_ref,         # (B, H, W, C) input & residual
    kv_ref,        # (1, B, Sc, C) per-rep precomputed cond kv
    wqkv_ref,      # (1, C, TQKV) packed head-padded q|k|v tile
    bqkv_ref,      # (1, 1, TQKV)
    wo_ref,        # (1, Cp, TO) output-projection tile (zero rows at head pads)
    bo_ref,        # (1, 1, TO)
    mask_ref,      # (B, Sc) int32 (1 = attend)
    o_ref,         # (B, H, W, TO) output block
    rows_ref,      # scratch (B*(Np+Sc), C): per batch [LN(x) pixels ; cond kv]
    qkv_ref,       # scratch (B*(Np+Sc), 3*Cp), Cp = nhead*HD_PAD
    att_ref,       # scratch (B*Np, Cp): attention output (pre-o-projection)
    *,
    n_qkv: int,
    n_o: int,
    t_qkv: int,
    t_o: int,
    b: int,
    n_pix: int,
    s_c: int,
    c: int,
    c_pad: int,
    nhead: int,
    hd: int,
    head_chunk: int,
    eps_ln: float = 1e-6,
):
    step = pl.program_id(0)
    dtype = x_ref.dtype
    s_full = n_pix + s_c

    # ---- phase 0: LN(x) -> pixel rows; cond kv -> cond rows ----
    @pl.when(step == 0)
    def _phase0():
        x = x_ref[...].astype(jnp.float32).reshape(b, n_pix, c)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        tok = ((x - mean) * jax.lax.rsqrt(var + eps_ln)).astype(dtype)
        for bi in range(b):
            rows_ref[pl.ds(bi * s_full, n_pix), :] = tok[bi]
            rows_ref[pl.ds(bi * s_full + n_pix, s_c), :] = kv_ref[0, bi]

    # ---- phase 1 (steps 0..n_qkv-1): packed q|k|v projection tiles ----
    @pl.when(step < n_qkv)
    def _phase1():
        rows = rows_ref[...]
        t = jax.lax.dot_general(
            rows, wqkv_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        t = t + bqkv_ref[0, 0, :].astype(jnp.float32)
        qkv_ref[:, pl.ds(step * t_qkv, t_qkv)] = t.astype(dtype)

    # ---- phase 2 (step n_qkv): attention core, head chunks, aligned heads ----
    @pl.when(step == n_qkv)
    def _phase2():
        scale = hd**-0.5  # TRUE head dim, not the padded one
        hc_d = HD_PAD * head_chunk
        for bi in range(b):
            row0 = bi * s_full
            cond_m = mask_ref[bi, :][None, :]  # (1, Sc)
            pix_m = jnp.ones((1, n_pix), jnp.int32)
            m = jnp.concatenate([pix_m, cond_m], axis=1) > 0  # (1, S)
            for hc in range(nhead // head_chunk):
                qs = qkv_ref[pl.ds(row0, n_pix), pl.ds(hc * hc_d, hc_d)]
                ks = qkv_ref[pl.ds(row0, s_full), pl.ds(c_pad + hc * hc_d, hc_d)]
                vs = qkv_ref[pl.ds(row0, s_full), pl.ds(2 * c_pad + hc * hc_d, hc_d)]
                q3 = qs.reshape(n_pix, head_chunk, HD_PAD).transpose(1, 0, 2)
                k3 = ks.reshape(s_full, head_chunk, HD_PAD).transpose(1, 0, 2)
                v3 = vs.reshape(s_full, head_chunk, HD_PAD).transpose(1, 0, 2)
                scores = jax.lax.dot_general(
                    q3, k3,
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ) * scale  # (chunk, Np, S)
                scores = jnp.where(m[None, :, :], scores, NEG_INF)
                mx = jnp.max(scores, axis=-1, keepdims=True)
                e = jnp.exp(scores - mx)
                p = e / jnp.sum(e, axis=-1, keepdims=True)
                oc = jax.lax.dot_general(
                    p.astype(v3.dtype), v3,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )  # (chunk, Np, HD_PAD)
                oc = oc.transpose(1, 0, 2).reshape(n_pix, hc_d)
                att_ref[pl.ds(bi * n_pix, n_pix), pl.ds(hc * hc_d, hc_d)] = (
                    oc.astype(dtype)
                )

    # ---- phase 3 (steps n_qkv+1..): output projection + residual ----
    @pl.when(step > n_qkv)
    def _phase3():
        t3 = step - n_qkv - 1
        att = att_ref[...]
        y = jax.lax.dot_general(
            att, wo_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y = y + bo_ref[0, 0, :].astype(jnp.float32)
        col = t3 * t_o
        res = x_ref[:, :, :, pl.ds(col, t_o)].reshape(b * n_pix, t_o)
        y = y + res.astype(jnp.float32)
        o_ref[...] = y.reshape(o_ref.shape).astype(o_ref.dtype)


def _pad_heads_cols(w: Array, nhead: int, hd: int) -> Array:
    """(..., n*hd) -> (..., n*HD_PAD): zero-pad each head's column block."""
    n = w.shape[-1] // hd
    w = w.reshape(w.shape[:-1] + (n, hd))
    w = jnp.pad(w, [(0, 0)] * (w.ndim - 1) + [(0, HD_PAD - hd)])
    return w.reshape(w.shape[:-2] + (n * HD_PAD,))


def _pad_heads_rows(w: Array, nhead: int, hd: int) -> Array:
    """(..., nhead*hd, C) -> (..., nhead*HD_PAD, C): zero rows at head pads."""
    lead = w.shape[:-2]
    w = w.reshape(lead + (nhead, hd, w.shape[-1]))
    w = jnp.pad(w, [(0, 0)] * len(lead) + [(0, 0), (0, HD_PAD - hd), (0, 0)])
    return w.reshape(lead + (nhead * HD_PAD, w.shape[-1]))


def pad_attn_weights(wqkv: Array, bqkv: Array, wo: Array, nhead: int):
    """Zero-pad each head to HD_PAD lanes: q|k|v column blocks and the
    o-projection's input rows. Call ONCE outside any scan — lax.scan does not
    hoist loop-invariant body computations, and re-padding per repetition was
    traced at 120 us/rep."""
    c = wqkv.shape[-2]
    hd = c // nhead
    wq, wk, wv = jnp.split(wqkv, 3, axis=-1)
    bq, bk, bv = jnp.split(bqkv, 3, axis=-1)
    pad_c = functools.partial(_pad_heads_cols, nhead=nhead, hd=hd)
    wqkv_p = jnp.concatenate([pad_c(wq), pad_c(wk), pad_c(wv)], axis=-1)
    bqkv_p = jnp.concatenate([pad_c(bq), pad_c(bk), pad_c(bv)], axis=-1)
    wo_p = _pad_heads_rows(wo, nhead, hd)
    return wqkv_p, bqkv_p, wo_p


def fused_attn_block_stacked(
    x: Array,          # (B, H, W, C)
    kv_all: Array,     # (R, B, Sc, C) precomputed cond kv per repetition
    wqkv_p: Array,     # (R, C, 3*nhead*HD_PAD) head-PADDED packed kernels
    bqkv_p: Array,     # (R, 3*nhead*HD_PAD)
    wo_p: Array,       # (R, nhead*HD_PAD, C) row-padded o-projection
    bo: Array,         # (R, C)
    rep_idx,
    nhead: int,
    cond_mask: Optional[Array] = None,  # (B, Sc) bool
    head_chunk: int = 4,
    tile_qkv: int = 512,
    tile_o: int = 256,
    interpret: bool = False,
) -> Array:
    """x + o_proj(attention(LN(x), [LN(x); kv])) — see module docstring.
    Weights must come from pad_attn_weights (hoisted by the caller)."""
    b, hh, ww, c = x.shape
    n_pix = hh * ww
    s_c = kv_all.shape[2]
    hd = c // nhead
    c_pad = nhead * HD_PAD
    dtype = x.dtype
    s_full = n_pix + s_c

    c3p = 3 * c_pad
    assert wqkv_p.shape[-1] == c3p and wo_p.shape[-2] == c_pad
    assert c3p % tile_qkv == 0 and c % tile_o == 0, (c3p, tile_qkv, c, tile_o)
    assert nhead % head_chunk == 0
    n_qkv = c3p // tile_qkv
    n_o = c // tile_o

    mask = (
        cond_mask.astype(jnp.int32)
        if cond_mask is not None
        else jnp.ones((b, s_c), jnp.int32)
    )

    kern = functools.partial(
        _kernel,
        n_qkv=n_qkv, n_o=n_o, t_qkv=tile_qkv, t_o=tile_o,
        b=b, n_pix=n_pix, s_c=s_c, c=c, c_pad=c_pad,
        nhead=nhead, hd=hd, head_chunk=head_chunk,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_qkv + 1 + n_o,),
        in_specs=[
            pl.BlockSpec((b, hh, ww, c), lambda i, s: (0, 0, 0, 0)),          # x
            pl.BlockSpec((1, b, s_c, c), lambda i, s: (s[0], 0, 0, 0)),       # kv
            pl.BlockSpec(                                                      # wqkv tile
                (1, c, tile_qkv),
                lambda i, s, n1=n_qkv: (s[0], 0, jnp.minimum(i, n1 - 1)),
            ),
            pl.BlockSpec(
                (1, 1, tile_qkv),
                lambda i, s, n1=n_qkv: (s[0], 0, jnp.minimum(i, n1 - 1)),
            ),
            pl.BlockSpec(                                                      # wo tile
                (1, c_pad, tile_o),
                lambda i, s, n1=n_qkv, n3=n_o: (s[0], 0, jnp.clip(i - n1 - 1, 0, n3 - 1)),
            ),
            pl.BlockSpec(
                (1, 1, tile_o),
                lambda i, s, n1=n_qkv, n3=n_o: (s[0], 0, jnp.clip(i - n1 - 1, 0, n3 - 1)),
            ),
            pl.BlockSpec((b, s_c), lambda i, s: (0, 0)),                      # mask
        ],
        out_specs=pl.BlockSpec(
            (b, hh, ww, tile_o),
            lambda i, s, n1=n_qkv, n3=n_o: (0, 0, 0, jnp.clip(i - n1 - 1, 0, n3 - 1)),
        ),
        scratch_shapes=[
            pltpu.VMEM((b * s_full, c), dtype),        # rows
            pltpu.VMEM((b * s_full, c3p), dtype),      # qkv (head-padded)
            pltpu.VMEM((b * n_pix, c_pad), dtype),     # attention output
        ],
    )

    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hh, ww, c), dtype),
        interpret=interpret,
    )(
        jnp.asarray(rep_idx, jnp.int32).reshape(1),
        x,
        kv_all.astype(dtype),
        wqkv_p.astype(dtype),
        bqkv_p.astype(dtype)[:, None, :],
        wo_p.astype(dtype),
        bo.astype(dtype)[:, None, :],
        mask,
    )
