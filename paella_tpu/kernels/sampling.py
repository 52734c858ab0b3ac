"""Pallas TPU kernel: fused categorical sampling (Gumbel argmax).

jax.random.categorical materializes one u32 per logit in HBM (134 MB/step at
the flagship 64x64x8192 geometry: a 211 us rng-bit-generator op plus a fusion
that reads the bits back). This kernel derives the random bits from a
counter-based hash PRNG inside VMEM — HBM sees only the bf16 logits and the
(B,H,W) int32 result.

sample = argmax_k(logits_k / T + G_k), G = -log(-log(U)) — exactly the Gumbel
reparameterization jax.random.categorical uses, so the output distribution is
multinomial(softmax(logits/T)). The PRNG stream differs from jax.random's
(per-core hardware PRNG seeded from the caller's key data), so draws are
deterministic per (key, shape) but not bit-equal to the XLA path; the sampler
only enables it when SampleConfig.categorical_impl == "pallas". Statistical
correctness is pinned by tests/test_sampling_kernel.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _mix(h):
    """murmur3 finalizer: full-avalanche 32-bit mixing on the VPU."""
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def _kernel(seed_ref, temp_ref, logits_ref, out_ref, *, k: int, tile_m: int, hw: int):
    i = pl.program_id(0)
    inv_temp = 1.0 / temp_ref[0]
    logits = logits_ref[...].astype(jnp.float32) * inv_temp  # (TM, K)
    # counter-based PRNG: one u32 per element from its image-LOCAL index + that
    # image's key (two murmur3-finalizer rounds with seed injection —
    # statistically clean for Gumbel noise, portable to interpret mode,
    # deterministic per key). seed_ref is (n_images, 2); `hw` rows per image
    # (the whole array for a scalar key), so each image's stream depends only
    # on its own key — batch position and batchmates don't perturb it.
    row0 = i * tile_m
    bi = row0 // hw
    local0 = row0 - bi * hw
    rows = jax.lax.broadcasted_iota(jnp.uint32, logits.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, logits.shape, 1)
    idx = (jnp.uint32(local0) + rows) * jnp.uint32(k) + cols
    h = _mix(idx ^ seed_ref[bi, 0].astype(jnp.uint32))
    u32 = _mix(h + seed_ref[bi, 1].astype(jnp.uint32))
    # uniform in (0, 1): 24 high bits, offset by 2^-25 so log(log) never hits 0.
    # Mosaic has no u32->f32 cast; the shifted value fits 24 bits, so bitcast
    # to i32 (exact) and convert from there.
    u24 = pltpu.bitcast(u32 >> 8, jnp.int32)
    u = u24.astype(jnp.float32) * (2.0**-24) + (2.0**-25)
    gumbel = -jnp.log(-jnp.log(u))
    score = logits + gumbel
    out_ref[...] = jnp.argmax(score, axis=-1).astype(jnp.int32).reshape(-1, 1)


def _head_kernel(
    seed_ref, temp_ref, cfgw_ref,
    fc_ref,    # (TM, C) conditional features
    fu_ref,    # (TM, C) unconditional features (dummy (TM, 8) when no CFG)
    w_ref,     # (C, K) head weight, VMEM-resident across the grid
    out_ref,   # (TM, 1) int32
    *,
    k: int,
    tile_m: int,
    hw: int,
    with_cfg: bool,
):
    i = pl.program_id(0)
    f = fc_ref[...].astype(jnp.float32)
    if with_cfg:
        w = cfgw_ref[0]
        f = f * w + fu_ref[...].astype(jnp.float32) * (1.0 - w)
    # CFG mix in f32 then bf16 into the MXU. Near-parity note: this dot keeps
    # the f32 MXU accumulator, while the XLA path's head() emits bf16-rounded
    # logits before the f32 upcast — so draws are bit-equal to
    # gumbel_categorical composed after a bf16 head matmul (what
    # test_fused_head_matches_composed_path pins), NOT to the full XLA
    # sampler path bit-for-bit.
    logits = jax.lax.dot_general(
        f.astype(fc_ref.dtype), w_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TM, K) — lives only in VMEM; HBM never sees the 8192-wide logits
    inv_temp = 1.0 / temp_ref[0]
    # same per-image PRNG indexing as _kernel (see its comment)
    row0 = i * tile_m
    bi = row0 // hw
    local0 = row0 - bi * hw
    rows = jax.lax.broadcasted_iota(jnp.uint32, logits.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, logits.shape, 1)
    idx = (jnp.uint32(local0) + rows) * jnp.uint32(k) + cols
    h = _mix(idx ^ seed_ref[bi, 0].astype(jnp.uint32))
    u32 = _mix(h + seed_ref[bi, 1].astype(jnp.uint32))
    u24 = pltpu.bitcast(u32 >> 8, jnp.int32)
    u = u24.astype(jnp.float32) * (2.0**-24) + (2.0**-25)
    gumbel = -jnp.log(-jnp.log(u))
    score = logits * inv_temp + gumbel
    out_ref[...] = jnp.argmax(score, axis=-1).astype(jnp.int32).reshape(-1, 1)


def is_batched_key(key: Array) -> bool:
    """True iff `key` is a batch of PRNG keys (one per image): a (B,)-shaped
    typed key array, or a (B, 2) stack of legacy raw uint32 keys."""
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        return key.ndim == 1
    return key.ndim == 2


def _seeds_and_tiling(key: Array, m: int, tile_m: int) -> tuple[Array, int, int]:
    """Fold the PRNG key(s) into per-image (n_images, 2) i32 seeds.

    A scalar key keeps the original single-stream indexing (hw = the whole
    padded array). A BATCHED key (shape (n_images,), one per image — the
    serving layer's per-request seeds) gives every image its own seed pair and
    image-local counter indices, so each image's draw is bit-identical whether
    it is sampled alone or inside any batch (serve.py micro-batching
    determinism). Requires m % n_images == 0; tile_m is shrunk to divide the
    per-image row count so no tile straddles two images.
    """
    if is_batched_key(key):
        n_img = key.shape[0]
        if m % n_img:
            raise ValueError(f"batched key: {n_img} keys do not divide {m} rows")
        hw = m // n_img
        while tile_m > 8 and hw % tile_m:
            tile_m //= 2
        if hw % tile_m:
            raise ValueError(
                f"per-image keys need rows-per-image ({hw}) divisible by 8"
            )
        data = jax.vmap(lambda kk: jax.random.key_data(kk).reshape(-1))(key)
        data = data.astype(jnp.uint32)
        seeds = jnp.stack([data[:, 0], data[:, -1]], axis=1).astype(jnp.int32)
        return seeds, hw, tile_m
    data = jax.random.key_data(key).reshape(-1).astype(jnp.uint32)
    seeds = jnp.stack([data[0], data[-1]]).reshape(1, 2).astype(jnp.int32)
    return seeds, 0, tile_m  # hw filled in by the caller (padded row count)


def fused_head_categorical(
    key: Array,
    feat_c: Array,
    feat_u,              # Optional[Array]: None disables the CFG mix
    cfg_weight,          # traced scalar (ignored when feat_u is None)
    w_out: Array,        # (C, K) linear head, no bias
    temperature,
    tile_m: int = 128,
    interpret: bool = False,
) -> Array:
    """tokens = categorical(softmax((mix(feat) @ w_out) / T)) in ONE kernel.

    The flagship head projects 256-dim features to 8192 logits per token —
    67 MB bf16 per step that the XLA path writes to HBM and the categorical
    immediately reads back (traced: 90 us head fusion + 313 us categorical
    + 29 us weight-transpose copy). Here the logits tile stays in VMEM: the
    head weight (256x8192 bf16 = 4 MB) is resident across the grid, each tile
    computes its logits on the MXU and Gumbel-argmaxes them in place. The CFG
    feature mix (sampler.py::head commutes the mix through the linear head)
    rides along for free.

    The Gumbel noise uses the SAME counter-hash PRNG and global indexing as
    gumbel_categorical, so draws are bit-identical to it for a given
    (key, token-count, K).

    feat_c/feat_u: (B, H, W, C) or (M, C). Returns (B, H, W) / (M,) int32.
    `key` may be a scalar key (one stream over the whole batch, the historical
    bit-stream) or a (n_images,) batched key — per-image streams independent
    of batch composition (see _seeds_and_tiling).
    """
    orig = feat_c.shape[:-1]
    c = feat_c.shape[-1]
    k = w_out.shape[-1]
    with_cfg = feat_u is not None
    flat_c = feat_c.reshape(-1, c)
    m = flat_c.shape[0]
    seeds, hw, tile_m = _seeds_and_tiling(key, m, tile_m)
    pad = (-m) % tile_m
    if pad:
        flat_c = jnp.pad(flat_c, ((0, pad), (0, 0)))
    if with_cfg:
        flat_u = feat_u.reshape(-1, c)
        if pad:
            flat_u = jnp.pad(flat_u, ((0, pad), (0, 0)))
    else:
        flat_u = jnp.zeros((flat_c.shape[0], 8), flat_c.dtype)
    mp = flat_c.shape[0]
    hw = hw or mp

    temp = jnp.asarray(temperature, jnp.float32).reshape(1)
    cfgw = jnp.asarray(
        cfg_weight if with_cfg else 0.0, jnp.float32
    ).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(mp // tile_m,),
        in_specs=[
            pl.BlockSpec((tile_m, c), lambda i, *s: (i, 0)),
            pl.BlockSpec((tile_m, flat_u.shape[-1]), lambda i, *s: (i, 0)),
            pl.BlockSpec((c, k), lambda i, *s: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile_m, 1), lambda i, *s: (i, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_head_kernel, k=k, tile_m=tile_m, hw=hw, with_cfg=with_cfg),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mp, 1), jnp.int32),
        interpret=interpret,
    )(seeds, temp, cfgw, flat_c, flat_u, w_out)
    return out[:m, 0].reshape(orig)


def gumbel_categorical(
    key: Array,
    logits: Array,
    temperature,
    tile_m: int = 128,  # 256 blew the 16 MB VMEM scoped limit (19.2M stack)
    interpret: bool = False,
) -> Array:
    """Sample token ids ~ categorical(softmax(logits / temperature)).

    logits: (..., K) bf16/f32. Returns (...,) int32. `temperature` may be a
    traced scalar (the sampler's per-step schedule); it rides in as a
    scalar-prefetch argument.
    """
    orig = logits.shape[:-1]
    k = logits.shape[-1]
    flat = logits.reshape(-1, k)
    m = flat.shape[0]
    seeds, hw, tile_m = _seeds_and_tiling(key, m, tile_m)
    pad = (-m) % tile_m
    if pad:
        flat = jnp.pad(flat, ((0, pad), (0, 0)))
    mp = flat.shape[0]
    hw = hw or mp

    temp = jnp.asarray(temperature, jnp.float32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(mp // tile_m,),
        in_specs=[pl.BlockSpec((tile_m, k), lambda i, s, t: (i, 0))],
        out_specs=pl.BlockSpec((tile_m, 1), lambda i, s, t: (i, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, k=k, tile_m=tile_m, hw=hw),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mp, 1), jnp.int32),
        interpret=interpret,
    )(seeds, temp, flat)
    return out[:m, 0].reshape(orig)
