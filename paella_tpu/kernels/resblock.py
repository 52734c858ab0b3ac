"""Pallas TPU kernel: fused ResBlock (+ optional FiLM timestep modulation).

The denoiser's hot loop is `CTA` repetitions (reference blocks:
src/modules.py:43-62, 99-106). Traced on a v5e at the 1B geometry, the XLA
version of one ResBlock+Timestep pair costs ~130 us/rep, dominated by the fc1
matmul fusion running at ~54% MFU (its GRN-stat epilogue and a transposed
input layout stall the MXU) plus separate depthwise/LN/FiLM fusions. This
kernel runs the whole block in ONE pallas_call (measured 95 us/rep at the
level-1 geometry) with activations resident in VMEM:

    x_res = x
    x  = depthwise3x3(x)            # 9 shifted MACs on the VPU
    x  = layer_norm(x)              # affine-free, f32 stats
    h  = gelu(x @ W1 + b1)          # fc1 streamed in N-tiles (MXU)
    h  = GRN(h)                     # folded: h * (gamma*nx + 1), beta via W2
    y  = h @ W2 + b2 + beta @ W2    # fc2 streamed in N-tiles (MXU)
    y  = y + x_res
    y  = y * (1 + film_a) + film_b  # TimestepBlock, optional

Weights stream through VMEM in double-buffered tiles via the grid: steps
0..T1-1 compute fc1 output tiles, steps T1..T1+T2-1 fc2 output tiles. The
(tokens, 4c) hidden activation lives in a VMEM scratch between phases and
never touches HBM.

Scan-stacked weights: inside the denoiser's per-repetition loop the weights
live stacked on a leading axis. Slicing them per step materializes 26 MB/rep
of HBM copies (measured 36 us/rep), so `fused_resblock_stacked` takes the
FULL stacked arrays plus the repetition index as a scalar-prefetch argument —
the BlockSpec index maps select the repetition and Pallas DMAs only the tiles
it needs.

Inference-only (no custom VJP): training keeps the flax/XLA path, which is
what autodiff differentiates.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def fuse_mode(
    x_shape,
    dtype,
    c: int,
    kernel_size: int,
    with_skip: bool = False,
    vmem_budget: int = 14 * 2**20,
    weight_itemsize: Optional[int] = None,
) -> Optional[str]:
    """Static gate for the fused ResBlock kernel.

    Returns the grid mode, or None when the block must stay on the XLA path:
      "full"  — all batch rows share one (B*HW, 4C) VMEM scratch (one matmul
                per weight tile; best when it fits).
      "batch" — batch is the outer grid dimension, scratch is per-batch-item
                (GRN stats are per-batch anyway). This is what lets the 1B
                level-0 blocks (2 x 32^2 x 640 tokens) fuse. Weight tiles
                stream once per batch item, which overlaps the fc compute.

    The budget models TOTAL VMEM: activations scratch (xn + h), the resident
    input blocks (x, plus the two deinterleaved skip planes when with_skip),
    and the double-buffered fc weight tiles — calibrated so the largest
    measured-good configuration (level-1 full-batch, ~13.1 MB by this model)
    passes while a measured-OOM one (up-level-1 skip full-batch: model 15.7 MB,
    actual 16.85 M vs the 16 M scoped-vmem limit) falls back to "batch".

    Batch-grid mode at b > 8 pays one extra copy of the (HW, 4C) h scratch:
    measured by scoped-vmem-limit bisection on the up-0 skip block (13.1 MiB
    flat for b=2..8, then 18.1 MiB at b=16 — a +5.24 MiB step equal to the h
    scratch; Mosaic double-buffers scratch at larger outer grids). The
    pallas_call's 32 MB vmem limit absorbs it, and fusing at b=16 is FASTER
    than the XLA fallback (batch-8 sampler 606.3 vs 624.0 ms p50 A/B,
    scripts/ab_batch16_fuse.py) — so the budget model does NOT charge it.
    """
    b, h, w, ch = x_shape
    if ch != c or kernel_size != 3 or c % 128 or (4 * c) % 512:
        return None
    itemsize = jnp.dtype(dtype).itemsize
    # int8 fc kernels (quant.quantize_paella_int8) halve/quarter the streamed
    # weight-tile bytes; budgeting them at the activation itemsize made some
    # quantized geometries fall back to batch-grid/XLA unnecessarily.
    w_itemsize = itemsize if weight_itemsize is None else weight_itemsize
    in_planes = 3 if with_skip else 1  # x (+ xa, xb)
    weights = (c * 512 + 4 * c * 128) * 2 * w_itemsize  # double-buffered fc tiles
    per_batch_act = h * w * (5 + in_planes) * c * itemsize
    if b * per_batch_act + weights <= vmem_budget:
        return "full"
    if per_batch_act + weights <= vmem_budget:
        return "batch"
    return None


def _erf(x: Array) -> Array:
    """erf for Mosaic (the erf/erfc primitives have no Pallas TPU lowering):
    Abramowitz & Stegun 7.1.26, max abs error 1.5e-7 — far below bf16
    resolution and the f32 parity tolerance."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x: Array) -> Array:
    """Exact (erf) GELU, matching nn/functional.py::gelu."""
    return 0.5 * x * (1.0 + _erf(x * (2.0**-0.5)))


def _kernel(
    idx_ref,      # scalar prefetch: (1,) repetition index
    # inputs (VMEM refs; weights carry a leading singleton rep axis)
    x_ref,        # (B, H, W, C) — residual (and, cpg=1, depthwise input)
    *refs,        # [xa, xb (cpg=2 only)], dw_w (1,3,3,cpg,C), dw_b (1,1,C),
                  # w1 (1,C,TN1), b1, gamma (1,1,4C) f32, beta, w2 (1,4C,TN2),
                  # b2, s1, s2 (int8 scales), film (1,B,2C),
                  # [beta_w2 (1,1,TN2) — act_quant only] — then the output
                  # o (B,H,W,TN2) and scratch xn (B*HW,C), h (B*HW,4C),
                  # gx (B,4C) f32, [sx (1,rows), sh (16,rows), sh2 (1,rows)
                  # f32 activation scales — act_quant only]
    n_t1: int,
    n_t2: int,
    tn1: int,
    tn2: int,
    c: int,
    b: int,
    hw: int,
    with_film: bool,
    quantized: bool,
    batch_grid: bool = False,
    cpg: int = 1,
    act_quant: bool = False,
    eps_grn: float = 1e-6,
    eps_ln: float = 1e-6,  # layer_norm parity: nn/functional.py eps=1e-6
):
    if cpg == 2:
        # skip-concat block: the grouped conv's per-group channel pair comes
        # deinterleaved as two planes (see fused_resblock_stacked)
        xa_ref, xb_ref = refs[0], refs[1]
        refs = refs[2:]
        dw_inputs = (xa_ref, xb_ref)
    else:
        dw_inputs = (x_ref,)
    if act_quant:
        (dw_w_ref, dw_b_ref, w1_ref, b1_ref, gamma_ref, beta_ref, w2_ref,
         b2_ref, s1_ref, s2_ref, film_ref, bw2_ref, o_ref, xn_ref, h_ref,
         gx_ref, sx_ref, sh_ref, sh2_ref) = refs
    else:
        (dw_w_ref, dw_b_ref, w1_ref, b1_ref, gamma_ref, beta_ref, w2_ref,
         b2_ref, s1_ref, s2_ref, film_ref, o_ref, xn_ref, h_ref, gx_ref) = refs

    def quantize_rows(v: Array):
        """Per-row symmetric s8: returns (codes s8, scale f32 (rows,))."""
        am = jnp.max(jnp.abs(v), axis=-1)
        s = jnp.maximum(am, 1e-6) * (1.0 / 127.0)
        q = jnp.clip(jnp.round(v * (1.0 / s)[:, None]), -127.0, 127.0)
        return q.astype(jnp.int8), s

    # batch-grid mode: grid=(B, steps); each batch item replays the phase
    # sequence with per-batch scratch (b below is the 1-row block, not B)
    step = pl.program_id(1) if batch_grid else pl.program_id(0)
    dtype = x_ref.dtype

    # ---- phase 0 (first grid step): depthwise conv + LayerNorm into xn ----
    @pl.when(step == 0)
    def _phase0():
        # 3x3 depthwise as 9 shifted multiply-adds per input plane over a
        # zero-padded copy
        acc = None
        for j, ref in enumerate(dw_inputs):
            x = ref[...].astype(jnp.float32)  # (B, H, W, C)
            _, hh, ww, _ = x.shape
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            if acc is None:
                acc = jnp.zeros(x.shape, jnp.float32)
            for ky in range(3):
                for kx in range(3):
                    w = dw_w_ref[0, ky, kx, j, :].astype(jnp.float32)  # (C,)
                    acc = acc + xp[:, ky : ky + hh, kx : kx + ww, :] * w
        acc = acc + dw_b_ref[0, 0, :].astype(jnp.float32)
        # affine-free LayerNorm over channels, f32 stats
        mean = jnp.mean(acc, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(acc - mean), axis=-1, keepdims=True)
        xn = (acc - mean) * jax.lax.rsqrt(var + eps_ln)
        if act_quant:
            q, s = quantize_rows(xn.reshape(b * hw, c))
            xn_ref[...] = q
            sx_ref[0, :] = s
        else:
            xn_ref[...] = xn.reshape(b * hw, c).astype(dtype)

    # ---- phase 1 (steps 0..n_t1-1): fc1 tile -> gelu -> stash + L2 stats ----
    @pl.when(step < n_t1)
    def _phase1():
        xn = xn_ref[...]
        if act_quant:
            # true W8A8: s8 x s8 MACs on the MXU (1.35-1.66x the bf16 rate at
            # Paella's fc shapes incl. requant — scripts/micro_int8.py design)
            ht = jax.lax.dot_general(
                xn, w1_ref[0],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * (sx_ref[0, :][:, None] * s1_ref[0, 0, :][None, :])
        else:
            w1 = w1_ref[0].astype(xn.dtype)  # int8 values are exact in bf16
            ht = jax.lax.dot_general(
                xn, w1,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (B*HW, TN1)
            if quantized:
                # weight-only int8: x @ (Wq*s) == (x @ Wq) * s, s per out chan
                ht = ht * s1_ref[0, 0, :]
        ht = ht + b1_ref[0, 0, :].astype(jnp.float32)
        ht = _gelu_exact(ht)
        col = step * tn1
        if act_quant:
            # provisional per-(row, tile) quantization; phase 1.5 requantizes
            # to one per-row scale after the GRN scaling
            q, s = quantize_rows(ht)
            h_ref[:, pl.ds(col, tn1)] = q
            sh_ref[pl.ds(step, 1), :] = s[None, :]
        else:
            h_ref[:, pl.ds(col, tn1)] = ht.astype(h_ref.dtype)
        # per-batch spatial sum of squares for GRN (batches are row-contiguous)
        hsq = jnp.square(ht)
        for bi in range(b):
            gx_ref[bi, pl.ds(col, tn1)] = jnp.sum(hsq[bi * hw : (bi + 1) * hw], axis=0)

    # ---- phase 1.5 (last fc1 step): finalize GRN scale, apply in place ----
    @pl.when(step == n_t1 - 1)
    def _phase15():
        gx = jnp.sqrt(gx_ref[...])  # (B, 4C)
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + eps_grn)
        scale = gamma_ref[0, 0, :] * nx + 1.0  # (B, 4C) f32
        if act_quant:
            # dequant (per-tile scales) + GRN scale, requantize to ONE per-row
            # scale so phase 2 can run a single full-K s8 dot. GRN scale is
            # applied FULL-WIDTH (Mosaic rejects broadcasting a lane-sliced
            # row vector across sublanes); per-tile scales are column
            # broadcasts, which lower fine. b and n_t1 are static.
            for bi in range(b):
                r0 = bi * hw
                parts = []
                for t in range(n_t1):
                    parts.append(
                        h_ref[pl.ds(r0, hw), pl.ds(t * tn1, tn1)].astype(jnp.float32)
                        * sh_ref[t, pl.ds(r0, hw)][:, None]
                    )
                deq = jnp.concatenate(parts, axis=-1) * scale[bi][None, :]
                am = jnp.max(jnp.abs(deq), axis=-1)
                s_new = jnp.maximum(am, 1e-6) * (1.0 / 127.0)
                sh2_ref[0, pl.ds(r0, hw)] = s_new
                h_ref[pl.ds(r0, hw), :] = jnp.clip(
                    jnp.round(deq * (1.0 / s_new)[:, None]), -127.0, 127.0
                ).astype(jnp.int8)
        else:
            for bi in range(b):
                rows = h_ref[pl.ds(bi * hw, hw), :]
                h_ref[pl.ds(bi * hw, hw), :] = (
                    rows.astype(jnp.float32) * scale[bi][None, :]
                ).astype(h_ref.dtype)

    # ---- phase 2 (steps n_t1..): fc2 tile + bias + beta@W2 + residual + film --
    @pl.when(step >= n_t1)
    def _phase2():
        t2 = step - n_t1
        h = h_ref[...]
        if act_quant:
            yt = jax.lax.dot_general(
                h, w2_ref[0],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * (sh2_ref[0, :][:, None] * s2_ref[0, 0, :][None, :])
            # beta @ W2 is per-rep constant; precomputed outside (bw2_ref)
            yt = yt + bw2_ref[0, 0, :]
        else:
            w2 = w2_ref[0].astype(h.dtype)
            yt = jax.lax.dot_general(
                h, w2,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (B*HW, TN2)
            # GRN beta contributes beta @ W2 (constant per output channel)
            beta_w2 = jax.lax.dot_general(
                beta_ref[0].astype(h.dtype), w2,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (1, TN2)
            yt = yt + beta_w2[0][None, :]
            if quantized:
                yt = yt * s2_ref[0, 0, :]
        yt = yt + b2_ref[0, 0, :].astype(jnp.float32)
        col = t2 * tn2
        res = x_ref[:, :, :, pl.ds(col, tn2)].reshape(b * hw, tn2).astype(jnp.float32)
        yt = yt + res
        if with_film:
            yt = yt.reshape(b, hw, tn2)
            a = film_ref[0, :, pl.ds(col, tn2)].astype(jnp.float32)  # (B, TN2)
            bb = film_ref[0, :, pl.ds(c + col, tn2)].astype(jnp.float32)
            yt = yt * (1.0 + a[:, None, :]) + bb[:, None, :]
            yt = yt.reshape(b * hw, tn2)
        o_ref[...] = yt.reshape(o_ref.shape).astype(o_ref.dtype)


def fused_resblock_stacked(
    x: Array,
    dw_kernel: Array,   # (R, 3, 3, cpg, C); cpg=2 iff skip is not None
    dw_bias: Array,     # (R, C)
    fc1_kernel: Array,  # (R, C, 4C)
    fc1_bias: Array,    # (R, 4C)
    grn_gamma: Array,   # (R, 4C)
    grn_beta: Array,    # (R, 4C)
    fc2_kernel: Array,  # (R, 4C, C)
    fc2_bias: Array,    # (R, C)  [1D-per-rep vectors are staged as (R,1,N):
                        #  Mosaic requires the last two block dims divisible by
                        #  (8,128) or equal to the array dims]
    rep_idx,            # int or int32 scalar: which repetition's weights
    film_ab: Optional[Array] = None,  # (R, B, 2C) or None
    fc1_scale: Optional[Array] = None,  # (R, 4C) f32: fc1_kernel is int8
    fc2_scale: Optional[Array] = None,  # (R, C) f32: fc2_kernel is int8
    tile_n1: int = 512,
    tile_n2: int = 128,
    batch_grid: bool = False,
    skip: Optional[Array] = None,
    dw_planes: Optional[tuple] = None,
    act_quant: bool = False,  # true W8A8: quantize activations in-kernel
    beta_w2: Optional[Array] = None,  # (R, C) f32 = beta @ dequant(W2); required
                                      # with act_quant (beta can't join s8 dots)
    interpret: bool = False,
) -> Array:
    """Fused ResBlock(+FiLM) over scan-stacked weights. The repetition index is
    a scalar-prefetch argument, so the stacked arrays are consumed in place —
    no per-step weight slice is ever materialized in HBM.

    batch_grid=True iterates the batch as the outer grid dimension with
    per-batch-item VMEM scratch — see fuse_mode's "batch" case.

    skip: (B, H, W, C) UNet skip, channel-concatenated before the depthwise
    conv (reference: src/modules.py:56-57). The grouped conv with groups=C over
    the 2C concat reads channels (2g, 2g+1) per group g, so the concat is
    deinterleaved here into two planes and the kernel runs 18 shifted MACs
    against dw_kernel's two input planes. The residual stays x.

    dw_planes: alternative to `skip` — the two (B, H, W, C) depthwise input
    planes ALREADY deinterleaved (plane a = concat channels 0::2, plane b =
    1::2). Lets a caller that keeps activations in an even/odd-split channel
    layout replace the strided lane gather (traced at ~66 us/step at the 1B
    up-0 geometry) with contiguous half-slices. x stays the residual.

    Weight-only int8 (quant.py): pass int8 fc1/fc2 kernels with their
    per-out-channel f32 scales; the kernel streams half the weight bytes and
    applies scales to the matmul outputs — x @ (Wq*s) == (x @ Wq) * s exactly.
    """
    b, hh, ww, c = x.shape
    hw = hh * ww
    c4 = fc1_kernel.shape[-1]
    assert c4 % tile_n1 == 0 and c % tile_n2 == 0, (c4, tile_n1, c, tile_n2)
    assert skip is None or dw_planes is None, "pass skip OR dw_planes, not both"
    cpg = 2 if (skip is not None or dw_planes is not None) else 1
    assert dw_kernel.shape[3] == cpg, (dw_kernel.shape, cpg)
    n_t1 = c4 // tile_n1
    n_t2 = c // tile_n2
    dtype = x.dtype

    with_film = film_ab is not None
    quantized = fc1_scale is not None
    if quantized:
        assert fc1_kernel.dtype == jnp.int8 and fc2_kernel.dtype == jnp.int8
        assert fc2_scale is not None
    r = fc1_kernel.shape[0]
    film = film_ab if with_film else jnp.zeros((r, b, 2), dtype)
    s1 = fc1_scale if quantized else jnp.ones((r, c4), jnp.float32)
    s2 = fc2_scale if quantized else jnp.ones((r, c), jnp.float32)

    if act_quant:
        assert quantized and beta_w2 is not None, (
            "act_quant needs int8 fc kernels (with scales) and a precomputed "
            "beta_w2 = grn_beta @ dequant(fc2_kernel)"
        )
        assert n_t1 <= 16, n_t1  # sh scratch holds one scale row per fc1 tile

    kern = functools.partial(
        _kernel,
        n_t1=n_t1, n_t2=n_t2, tn1=tile_n1, tn2=tile_n2,
        c=c, b=1 if batch_grid else b, hw=hw,
        with_film=with_film, quantized=quantized, batch_grid=batch_grid,
        cpg=cpg, act_quant=act_quant,
    )

    if batch_grid:
        # grid = (batch, phase steps); index maps take (ib, i, scalars)
        def at_rep(*block):
            return lambda ib, i, s: (s[0], *block)

        def fc1_idx(ib, i, s, n1=n_t1):
            return (s[0], 0, jnp.minimum(i, n1 - 1))

        def fc2_idx(ib, i, s, n1=n_t1, n2=n_t2):
            return (s[0], 0, jnp.clip(i - n1, 0, n2 - 1))

        grid = (b, n_t1 + n_t2)
        x_spec = pl.BlockSpec((1, hh, ww, c), lambda ib, i, s: (ib, 0, 0, 0))
        # film is staged (R*B, 1, 2C): Mosaic requires the last two block dims
        # divisible by (8, 128) or equal to the array dims, so the per-(rep,
        # batch) row must be the LEADING axis
        film = film.reshape(r * b, 1, film.shape[2])
        film_spec = pl.BlockSpec(
            (1, 1, film.shape[2]), lambda ib, i, s, nb=b: (s[0] * nb + ib, 0, 0)
        )
        out_spec = pl.BlockSpec(
            (1, hh, ww, tile_n2),
            lambda ib, i, s, n1=n_t1, n2=n_t2: (ib, 0, 0, jnp.clip(i - n1, 0, n2 - 1)),
        )
        scratch_rows = hw
        gx_rows = 1
    else:
        def at_rep(*block):
            return lambda i, s: (s[0], *block)

        def fc1_idx(i, s, n1=n_t1):
            return (s[0], 0, jnp.minimum(i, n1 - 1))

        def fc2_idx(i, s, n1=n_t1, n2=n_t2):
            return (s[0], 0, jnp.clip(i - n1, 0, n2 - 1))

        grid = (n_t1 + n_t2,)
        x_spec = pl.BlockSpec((b, hh, ww, c), lambda i, s: (0, 0, 0, 0))
        film_spec = pl.BlockSpec((1,) + film.shape[1:], at_rep(0, 0))
        out_spec = pl.BlockSpec(
            (b, hh, ww, tile_n2),
            lambda i, s, n1=n_t1, n2=n_t2: (0, 0, 0, jnp.clip(i - n1, 0, n2 - 1)),
        )
        scratch_rows = b * hw
        gx_rows = b

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            x_spec,                                                           # x
            *([x_spec, x_spec] if cpg == 2 else []),                          # xa, xb
            pl.BlockSpec((1, 3, 3, cpg, c), at_rep(0, 0, 0, 0)),              # dw_w
            pl.BlockSpec((1, 1, c), at_rep(0, 0)),                            # dw_b
            pl.BlockSpec((1, c, tile_n1), fc1_idx),                           # fc1 tile
            pl.BlockSpec((1, 1, tile_n1), fc1_idx),
            pl.BlockSpec((1, 1, c4), at_rep(0, 0)),                           # gamma
            pl.BlockSpec((1, 1, c4), at_rep(0, 0)),                           # beta
            pl.BlockSpec((1, c4, tile_n2), fc2_idx),                          # fc2 tile
            pl.BlockSpec((1, 1, tile_n2), fc2_idx),
            pl.BlockSpec((1, 1, tile_n1), fc1_idx),                           # s1 tile
            pl.BlockSpec((1, 1, tile_n2), fc2_idx),                           # s2 tile
            film_spec,                                                        # film
            *([pl.BlockSpec((1, 1, tile_n2), fc2_idx)] if act_quant else []), # beta_w2
        ],
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((scratch_rows, c), jnp.int8 if act_quant else dtype),
            #                                       ^ xn: normalized depthwise out
            pltpu.VMEM((scratch_rows, c4), jnp.int8 if act_quant else dtype),
            #                                       ^ h: gelu(fc1), GRN-scaled
            pltpu.VMEM((gx_rows, c4), jnp.float32), # gx: per-channel L2 stats
            *(
                [
                    pltpu.VMEM((1, scratch_rows), jnp.float32),   # sx row scales
                    pltpu.VMEM((16, scratch_rows), jnp.float32),  # sh per-tile
                    pltpu.VMEM((1, scratch_rows), jnp.float32),   # sh2 final
                ]
                if act_quant
                else []
            ),
        ],
    )

    if cpg == 2:
        if dw_planes is not None:
            dw_operands = (dw_planes[0].astype(dtype), dw_planes[1].astype(dtype))
        else:
            # NB: slicing x/skip separately before the concat was measured
            # equivalent (the strided channel gather costs ~66 us/step either
            # way at the 1B geometry) — keep the simpler form.
            cc = jnp.concatenate([x, skip.astype(dtype)], axis=-1)
            dw_operands = (cc[..., 0::2], cc[..., 1::2])
    else:
        dw_operands = ()

    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hh, ww, c), dtype),
        # the default 16 MB scoped-vmem limit is layout-sensitive: the SAME
        # kernel+shapes compiled at ~13.1 MiB standalone but 16.69 MiB inside
        # one sampler program (operand layouts imposed by surrounding HLO
        # change Mosaic's relayout buffers). 32 MB keeps compiles robust;
        # fuse_mode still bounds the working set for pipelining efficiency.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 2**20),
        interpret=interpret,
    )(
        jnp.asarray(rep_idx, jnp.int32).reshape(1),
        x,
        *dw_operands,
        dw_kernel.astype(dtype),
        dw_bias.astype(dtype)[:, None, :],
        fc1_kernel if quantized else fc1_kernel.astype(dtype),
        fc1_bias.astype(dtype)[:, None, :],
        grn_gamma.astype(jnp.float32)[:, None, :],
        grn_beta.astype(jnp.float32)[:, None, :],
        fc2_kernel if quantized else fc2_kernel.astype(dtype),
        fc2_bias.astype(dtype)[:, None, :],
        s1.astype(jnp.float32)[:, None, :],
        s2.astype(jnp.float32)[:, None, :],
        film.astype(dtype),
        *([beta_w2.astype(jnp.float32)[:, None, :]] if act_quant else []),
    )


def fused_resblock(
    x: Array,
    dw_kernel: Array,
    dw_bias: Array,
    fc1_kernel: Array,
    fc1_bias: Array,
    grn_gamma: Array,
    grn_beta: Array,
    fc2_kernel: Array,
    fc2_bias: Array,
    film_ab: Optional[Array] = None,
    fc1_scale: Optional[Array] = None,
    fc2_scale: Optional[Array] = None,
    act_quant: bool = False,
    beta_w2: Optional[Array] = None,  # (C,) or (1, C)
    tile_n1: int = 512,
    tile_n2: int = 128,
    batch_grid: bool = False,
    skip: Optional[Array] = None,
    dw_planes: Optional[tuple] = None,
    interpret: bool = False,
) -> Array:
    """Single-repetition fused ResBlock(+FiLM): unstacked weights (the
    materialized first repetition of a level). See fused_resblock_stacked.

    x: (B, H, W, C). dw_kernel: (3,3,1,C) true-depthwise (cpg=1), or
    (3,3,2,C) with skip (the UNet skip-concat first repetition).
    fc1: (C, 4C); fc2: (4C, C); grn gamma/beta: (4C,).
    film_ab: (B, 2C) — TimestepBlock mapper output [a | b], or None.
    fc1_scale/fc2_scale: per-out-channel f32 scales when the fc kernels are
    int8; act_quant additionally runs them as s8 x s8 (needs beta_w2).
    """
    return fused_resblock_stacked(
        x,
        dw_kernel[None],
        dw_bias.reshape(1, -1),
        fc1_kernel[None],
        fc1_bias.reshape(1, -1),
        grn_gamma.reshape(1, -1),
        grn_beta.reshape(1, -1),
        fc2_kernel[None],
        fc2_bias.reshape(1, -1),
        0,
        film_ab=None if film_ab is None else film_ab[None],
        fc1_scale=None if fc1_scale is None else fc1_scale.reshape(1, -1),
        fc2_scale=None if fc2_scale is None else fc2_scale.reshape(1, -1),
        act_quant=act_quant,
        beta_w2=None if beta_w2 is None else beta_w2.reshape(1, -1),
        tile_n1=tile_n1,
        tile_n2=tile_n2,
        batch_grid=batch_grid,
        skip=skip,
        dw_planes=dw_planes,
        interpret=interpret,
    )
