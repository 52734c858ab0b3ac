"""Iterative renoising sampler, compiled to a single XLA program.

The reference sampler (reference: src_distributed/utils.py:97-126) is a host-driven
eager loop: per step it runs two UNet forwards (cond + uncond), a softmax, a
torch.multinomial and a re-noising — with a host round-trip between every op. The
TPU-native design here:

- The WHOLE loop is one jit: `lax.scan` over the step schedule, zero host
  round-trips between steps.
- Classifier-free guidance runs cond and uncond in ONE batched forward of size 2B.
  Heterogeneous conditioning (e.g. uncond without clip_image,
  reference: src_distributed/train.py:160) is expressed with per-modality masks —
  masked tokens are excluded from attention, which is exactly equivalent to the
  reference's shorter uncond sequence.
- torch.multinomial(softmax(logits/T)) becomes jax.random.categorical(logits/T)
  with a threaded PRNG key (distributionally identical).
- Temperature / cfg / t schedules are precomputed arrays indexed by the scan step.

Extensions beyond the reference sampler function (per its notebook capabilities,
readme.md:41): token-mask inpainting/outpainting (`fixed_mask`/`fixed_tokens`),
`init_x` img2img starts, latent token interpolation helpers, and the attention
reweighting hook (`cond_reweight`).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..config import SampleConfig
from ..kernels.sampling import is_batched_key
from ..models.noise import add_noise

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Conditioning:
    """Conditioning inputs for one forward. `clip`/`clip_image` may be None
    (statically absent) or masked per-example via the *_mask fields (None mask =
    all present). A pytree, so it can be passed straight through jit."""

    byt5: Array
    clip: Optional[Array] = None
    clip_image: Optional[Array] = None
    byt5_mask: Optional[Array] = None
    clip_mask: Optional[Array] = None
    clip_image_mask: Optional[Array] = None

    @property
    def batch(self) -> int:
        return self.byt5.shape[0]


def fast_key(seed: int) -> Array:
    """A PRNG key with the `rbg` implementation — strongly recommended for
    sampling on TPU: threefry key derivation inside the sampling scan makes XLA
    compilation pathological (observed: the compile service dies after ~40 min on
    the 1B model; rbg compiles the identical program in seconds). Distributional
    behavior is equivalent; determinism per (seed, topology) is preserved."""
    return jax.random.key(seed, impl="rbg")


def _ones_mask(b: int) -> Array:
    return jnp.ones((b,), bool)


def _mix32(h: Array) -> Array:
    """murmur3 finalizer (full-avalanche 32-bit mix) — the same hash the
    pallas sampling kernel uses (kernels/sampling.py::_mix)."""
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def _hash_bits(seeds: Array, shape: tuple) -> Array:
    """Counter-hash u32 bits: seeds (B, 2) uint32 -> (B, *shape) uint32.
    Element i of every image uses the image-LOCAL counter index, so a given
    image's bits depend only on its own seed pair — never on batch size,
    position, or batchmates."""
    import numpy as _np

    n = int(_np.prod(shape))
    idx = jnp.arange(n, dtype=jnp.uint32).reshape((1,) + tuple(shape))
    ex = (slice(None),) + (None,) * len(shape)
    return _mix32(_mix32(idx ^ seeds[:, 0][ex]) + seeds[:, 1][ex])


def _hash_uniform(seeds: Array, shape: tuple) -> Array:
    """(0, 1) floats from the high 24 bits (exact in f32), offset so log(log)
    never sees 0 — bit-compatible with the pallas kernel's recipe."""
    bits = _hash_bits(seeds, shape)
    return (bits >> 8).astype(jnp.float32) * (2.0**-24) + (2.0**-25)


def merge_cfg_pair(cond: Conditioning, uncond: Conditioning) -> Conditioning:
    """Stack cond and uncond into one batch-2B Conditioning.

    Modalities present in only one side are kept as arrays but masked off on the
    side that lacks them, so a single forward serves both branches.
    """
    b = cond.batch

    def pair_field(c, u, c_mask, u_mask, token_like: bool):
        if c is None and u is None:
            return None, None
        if c is None:
            c = jnp.zeros_like(u)
            c_mask = jnp.zeros((b,), bool)
        if u is None:
            u = jnp.zeros_like(c)
            u_mask = jnp.zeros((b,), bool)
        merged = jnp.concatenate([c, u], axis=0)
        if c_mask is None and u_mask is None:
            return merged, None
        c_mask = c_mask if c_mask is not None else _ones_mask(b)
        u_mask = u_mask if u_mask is not None else _ones_mask(b)
        return merged, jnp.concatenate([c_mask, u_mask], axis=0)

    # byt5 sequences must share a length; pad the shorter one and mask the pad.
    cb, ub = cond.byt5, uncond.byt5
    cm = cond.byt5_mask if cond.byt5_mask is not None else jnp.ones(cb.shape[:2], bool)
    um = uncond.byt5_mask if uncond.byt5_mask is not None else jnp.ones(ub.shape[:2], bool)
    s = max(cb.shape[1], ub.shape[1])
    cb = jnp.pad(cb, ((0, 0), (0, s - cb.shape[1]), (0, 0)))
    ub = jnp.pad(ub, ((0, 0), (0, s - ub.shape[1]), (0, 0)))
    cm = jnp.pad(cm, ((0, 0), (0, s - cm.shape[1])))
    um = jnp.pad(um, ((0, 0), (0, s - um.shape[1])))
    byt5 = jnp.concatenate([cb, ub], axis=0)
    byt5_mask = jnp.concatenate([cm, um], axis=0)

    clip, clip_mask = pair_field(cond.clip, uncond.clip, cond.clip_mask, uncond.clip_mask, False)
    clip_image, clip_image_mask = pair_field(
        cond.clip_image, uncond.clip_image, cond.clip_image_mask, uncond.clip_image_mask, False
    )
    return Conditioning(byt5, clip, clip_image, byt5_mask, clip_mask, clip_image_mask)


def _apply_model(
    model, params, x, t, c: Conditioning, cond_reweight=None, return_features=False,
    cond_cache=None,
):
    return model.apply(
        {"params": params},
        x,
        t,
        c.byt5,
        c.clip,
        c.clip_image,
        byt5_mask=c.byt5_mask,
        clip_mask=c.clip_mask,
        clip_image_mask=c.clip_image_mask,
        cond_reweight=cond_reweight,
        deterministic=True,
        return_features=return_features,
        cond_cache=cond_cache,
    )


def _build_cond_cache(model, params, c: Conditioning, enabled: bool = True):
    """Step-invariant conditioning activations, computed ONCE outside the
    sampling scan (Paella.gen_cond_cache) — XLA does not hoist them out of
    the while loop on its own."""
    if not enabled or not hasattr(type(model), "gen_cond_cache"):
        return None
    return model.apply(
        {"params": params},
        c.byt5,
        c.clip,
        c.clip_image,
        byt5_mask=c.byt5_mask,
        clip_mask=c.clip_mask,
        clip_image_mask=c.clip_image_mask,
        method=type(model).gen_cond_cache,
    )


def sample(
    model: Any,
    params: Any,
    key: Array,
    conditioning: Conditioning,
    latent_shape: tuple[int, int, int],
    unconditional: Optional[Conditioning] = None,
    config: SampleConfig = SampleConfig(),
    init_x: Optional[Array] = None,
    fixed_mask: Optional[Array] = None,
    fixed_tokens: Optional[Array] = None,
    cond_reweight: Optional[Array] = None,
) -> Array:
    """Generate a token grid. Single compiled program; returns (B, h, w) int32.

    Signature parity with the reference sampler (src_distributed/utils.py:97):
    steps/renoise_steps/temperature/cfg/t_start/t_end/sampling_conditional_steps
    live in `config`; init_x is the img2img start. fixed_mask/fixed_tokens pin
    token positions every step (inpainting: True = keep fixed_tokens there).

    Compilation: only the STRUCTURE of the schedule is static (steps,
    sampling_conditional_steps, categorical_impl, cond_cache, whether CFG is
    on). The schedule VALUES — cfg weights, temperatures, t_start/t_end,
    renoise_steps — are traced operands, so a server sweeping guidance
    weights or temperatures per request reuses one compiled program.

    PRNG: `key` may be a scalar key (one stream over the whole batch — the
    historical behavior) or a BATCHED key of shape (B,), one per image. With
    per-image keys every random draw (init noise, categorical, renoise) is
    keyed by that image's key alone, so image i's tokens are bit-identical
    whether sampled at batch 1 or inside any batch — the determinism contract
    serving micro-batching needs (serve.py folds each request's seed into its
    own key).
    """
    cfg = config.resolved()
    b, h, w = latent_shape
    if is_batched_key(key) and key.shape[0] != b:
        raise ValueError(
            f"batched key has {key.shape[0]} keys but latent batch is {b}"
        )
    down = model.config.patch_size * 2 ** (len(model.config.c_hidden) - 1)
    if h % down or w % down:
        raise ValueError(
            f"latent_shape {latent_shape}: H and W must be divisible by the UNet's "
            f"total downsample factor {down} (patch_size * 2^(levels-1))"
        )
    if (fixed_mask is None) != (fixed_tokens is None):
        raise ValueError("fixed_mask and fixed_tokens must be passed together")
    do_cfg = cfg.cfg is not None and unconditional is not None
    n_cfg_steps = min(cfg.sampling_conditional_steps, cfg.steps) if do_cfg else 0
    schedule = {
        "t_span": jnp.asarray([cfg.t_start, cfg.t_end], jnp.float32),
        "temperature": jnp.asarray(cfg.temperature, jnp.float32),
        "cfg": jnp.asarray(cfg.cfg if do_cfg else (0.0, 0.0), jnp.float32),
        "renoise_steps": jnp.asarray(cfg.renoise_steps, jnp.int32),
    }
    return _sample_jit(
        model,
        params,
        key,
        conditioning,
        latent_shape,
        unconditional if do_cfg else None,
        schedule,
        cfg.steps,
        n_cfg_steps,
        cfg.categorical_impl,
        cfg.cond_cache,
        init_x,
        fixed_mask,
        fixed_tokens,
        cond_reweight,
    )


@partial(
    jax.jit,
    static_argnames=(
        "model",
        "latent_shape",
        "steps",
        "n_cfg_steps",
        "categorical_impl",
        "cond_cache_on",
    ),
)
def _sample_jit(
    model: Any,
    params: Any,
    key: Array,
    conditioning: Conditioning,
    latent_shape: tuple[int, int, int],
    unconditional: Optional[Conditioning],
    schedule: dict,
    steps: int,
    n_cfg_steps: int,
    categorical_impl: str,
    cond_cache_on: bool,
    init_x: Optional[Array],
    fixed_mask: Optional[Array],
    fixed_tokens: Optional[Array],
    cond_reweight: Optional[Array],
) -> Array:
    b, h, w = latent_shape
    num_labels = model.config.num_labels
    do_cfg = unconditional is not None
    per_image = is_batched_key(key)  # (B,) batched keys: per-image streams

    if per_image:
        # Per-image mode draws EVERYTHING from a counter-hash PRNG (the same
        # murmur3 scheme kernels/sampling.py uses) keyed by each image's own
        # key data + a per-(step, draw) salt. Two reasons jax.random cannot be
        # used here: (a) rbg keys — the TPU-safe impl — are NOT vmap-
        # invariant: vmapped draws over a key batch do not reproduce the solo
        # per-key draws (observed: lane 0 matches, lanes 1+ diverge), which is
        # the whole point of this mode; (b) threefry keys vmap correctly but
        # threefry derivation inside this scan is the known XLA compile bomb
        # on the 1B model. The hash draws are deterministic per (image key,
        # step), independent of batch size/composition, and have no in-scan
        # RNG primitives at all.
        data = jax.vmap(lambda kk: jax.random.key_data(kk).reshape(-1))(key)
        data = data.astype(jnp.uint32)
        s0, s1 = data[:, 0], data[:, -1]

        def derive_seeds(tag: int, idx: Array) -> Array:
            """(len(idx), B, 2) uint32 seed pairs for draw `tag` at steps idx."""
            salts = _mix32(
                idx.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
                + jnp.uint32(tag) * jnp.uint32(0x85EBCA6B)
                + jnp.uint32(1)
            )
            return jnp.stack(
                [_mix32(s0[None, :] ^ salts[:, None]), _mix32(s1[None, :] + salts[:, None])],
                axis=-1,
            )

        init_seeds = derive_seeds(0, jnp.zeros((1,), jnp.uint32))[0]
        # % num_labels is exact for power-of-two codebooks (the 8192 default);
        # otherwise the modulo bias is ~num_labels/2^32 — negligible
        init_noise = (
            _hash_bits(init_seeds, (h, w)) % jnp.uint32(num_labels)
        ).astype(jnp.int32)
    else:
        key, k_init = jax.random.split(key)
        init_noise = jax.random.randint(k_init, latent_shape, 0, num_labels, jnp.int32)
    sampled = init_noise if init_x is None else init_x.astype(jnp.int32)
    if fixed_mask is not None:
        sampled = jnp.where(fixed_mask, fixed_tokens, sampled)

    t_list = jnp.linspace(schedule["t_span"][0], schedule["t_span"][1], steps + 1)
    temperatures = jnp.linspace(
        schedule["temperature"][0], schedule["temperature"][1], steps
    )
    cfgs = jnp.linspace(schedule["cfg"][0], schedule["cfg"][1], steps)
    renoise_steps = schedule["renoise_steps"]

    merged = merge_cfg_pair(conditioning, unconditional) if do_cfg else conditioning
    cache_merged = _build_cond_cache(model, params, merged, cond_cache_on)
    # the cond-only phase (past sampling_conditional_steps) runs batch B with
    # the conditional inputs only — its own cache. Only built when that phase
    # actually has steps (with the default cutoff == steps it never does).
    if not do_cfg:
        cache_cond = cache_merged
    elif n_cfg_steps < steps:
        cache_cond = _build_cond_cache(model, params, conditioning, cond_cache_on)
    else:
        cache_cond = None

    # The output head is linear (no bias), so the CFG logit mix commutes with
    # it: mixing the c_out-dim FEATURES then projecting once does 2x less head
    # compute and 32x less logit HBM traffic than projecting both branches to
    # (B, H, W, 8192) and mixing there (traced at ~1 ms/step of the flagship
    # sampler). Bit-identity for the non-CFG path is pinned by test_goldens.
    dtype = model.config.compute_dtype
    w_out = params["out_proj"]["kernel"]

    def head(feat):
        return jnp.dot(feat.astype(dtype), w_out.astype(dtype))

    def make_step(with_cfg: bool):
        def step(carry, inputs):
            sampled, key = carry
            if per_image:
                i, t_curr, t_next, temp, cfg_w, k_cat, k_noise = inputs
            else:
                i, t_curr, t_next, temp, cfg_w = inputs
                key, k_cat, k_noise = jax.random.split(key, 3)
            t = jnp.full((b,), t_curr, jnp.float32)

            if with_cfg:
                feats2 = _apply_model(
                    model,
                    params,
                    jnp.concatenate([sampled, sampled], axis=0),
                    jnp.concatenate([t, t], axis=0),
                    merged,
                    cond_reweight=cond_reweight,
                    return_features=True,
                    cond_cache=cache_merged,
                )
                # reference mix: logits*cfg + uncond*(1-cfg)
                # (src_distributed/utils.py:117), applied pre-head in f32 —
                # equivalent because the head is linear.
                feat_c, feat_u = jnp.split(feats2, 2, axis=0)
            else:
                # past sampling_conditional_steps the reference runs ONLY the
                # conditional forward (src_distributed/utils.py:116) — so does
                # this branch (batch B, conditional conditioning only).
                feat_c = _apply_model(
                    model, params, sampled, t, conditioning,
                    cond_reweight=cond_reweight, return_features=True,
                    cond_cache=cache_cond,
                )
                feat_u = None

            # multinomial(softmax(logits/T)) == categorical(logits/T).
            if categorical_impl == "pallas":
                # head + CFG mix + Gumbel argmax in ONE kernel: the 8192-wide
                # logits never touch HBM (traced: the XLA path spent
                # ~430 us/step writing + re-reading them).
                from ..kernels.sampling import fused_head_categorical

                new_tokens = fused_head_categorical(
                    k_cat, feat_c, feat_u, cfg_w, w_out.astype(dtype), temp
                )
            else:
                if with_cfg:
                    fc32, fu32 = feat_c.astype(jnp.float32), feat_u.astype(jnp.float32)
                    logits = head(fc32 * cfg_w + fu32 * (1.0 - cfg_w))
                else:
                    logits = head(feat_c)
                scaled = logits.astype(jnp.float32) / temp
                if per_image:
                    # Gumbel-argmax with per-image counter-hash bits — the
                    # same reparameterization jax.random.categorical uses
                    u = _hash_uniform(k_cat, scaled.shape[1:])
                    gumbel = -jnp.log(-jnp.log(u))
                    new_tokens = jnp.argmax(scaled + gumbel, axis=-1).astype(jnp.int32)
                else:
                    new_tokens = jax.random.categorical(k_cat, scaled, axis=-1).astype(
                        jnp.int32
                    )

            # renoise toward the SAME init_noise (src_distributed/utils.py:123-125)
            if per_image:
                # add_noise with random_x=init_noise reduces to the Bernoulli
                # mask draw — per-image hash bits instead of a PRNG key
                u = _hash_uniform(k_noise, (h, w))
                mask = (u <= t_next).astype(jnp.int32)
                renoised = new_tokens * (1 - mask) + init_noise * mask
            else:
                t_next_b = jnp.full((b,), t_next, jnp.float32)
                renoised, _ = add_noise(
                    k_noise, new_tokens, t_next_b, num_labels, random_x=init_noise
                )
            new_tokens = jnp.where(i < renoise_steps, renoised, new_tokens)

            if fixed_mask is not None:
                new_tokens = jnp.where(fixed_mask, fixed_tokens, new_tokens)
            return (new_tokens, key), None

        return step

    xs = (
        jnp.arange(steps),
        t_list[:steps],
        t_list[1 : steps + 1],
        temperatures,
        cfgs,
    )
    if per_image:
        # per-(step, draw) seed pairs, derived OUTSIDE the scan: (steps, B, 2)
        step_idx = jnp.arange(steps, dtype=jnp.uint32)
        xs = xs + (derive_seeds(1, step_idx), derive_seeds(2, step_idx))
    # sampling_conditional_steps is static, so the schedule splits into a CFG
    # phase and a cond-only phase of static lengths: the uncond forward is never
    # computed-and-discarded (the reference likewise skips it,
    # src_distributed/utils.py:116). With the default cutoff (== steps) this is
    # one scan, identical to before.
    n_cfg = n_cfg_steps
    carry = (sampled, key)
    if n_cfg > 0:
        carry, _ = jax.lax.scan(
            make_step(True), carry, jax.tree_util.tree_map(lambda a: a[:n_cfg], xs)
        )
    if n_cfg < steps:
        carry, _ = jax.lax.scan(
            make_step(False), carry, jax.tree_util.tree_map(lambda a: a[n_cfg:], xs)
        )
    (sampled, _) = carry
    return sampled


def interpolate_latents(idx_a: Array, idx_b: Array, codebook: Array, alphas: Array) -> Array:
    """Latent interpolation between two token grids (a reference-notebook
    capability, readme.md:41): embed both grids with the codebook, lerp, and
    re-quantize each blend to the nearest code.

    idx_a/idx_b: (h, w) int. alphas: (n,) in [0,1]. Returns (n, h, w) int32.
    """
    from ..codec.quantize import codebook_lookup

    za = jnp.take(codebook, idx_a, axis=0)
    zb = jnp.take(codebook, idx_b, axis=0)
    blends = za[None] * (1 - alphas[:, None, None, None]) + zb[None] * alphas[:, None, None, None]
    return codebook_lookup(blends, codebook).astype(jnp.int32)


def outpaint_canvas(
    tokens: Array, canvas_hw: tuple[int, int], offset: tuple[int, int], num_labels: int, key: Array
) -> tuple[Array, Array]:
    """Build (init_x, fixed_mask) for outpainting: place `tokens` (B,h,w) on a
    random-token canvas at `offset`; the placed region is pinned every step."""
    b, h, w = tokens.shape
    ch, cw = canvas_hw
    oy, ox = offset
    canvas = jax.random.randint(key, (b, ch, cw), 0, num_labels, jnp.int32)
    canvas = jax.lax.dynamic_update_slice(canvas, tokens.astype(jnp.int32), (0, oy, ox))
    mask = jnp.zeros((b, ch, cw), bool)
    mask = jax.lax.dynamic_update_slice(mask, jnp.ones((b, h, w), bool), (0, oy, ox))
    return canvas, mask
