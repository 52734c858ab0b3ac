"""The Paella denoiser: a 3-level UNet over a discrete token grid.

TPU-first re-design of the reference denoiser (reference: src/modules.py:109-283):
- NHWC activations everywhere; logits come out channels-LAST: (B, H, W, num_labels)
  (the reference returns (B, num_labels, H, W)).
- PixelUnshuffle/Shuffle become reshape/transpose (space_to_depth/depth_to_space),
  which XLA fuses into the adjacent 1x1 matmuls.
- 1x1 convs are Dense layers on the channel axis.
- Conditioning may carry a token mask so heterogeneous cond/uncond CFG pairs batch
  into a single forward (absent tokens are masked out of attention — equivalent to
  the reference running them as separate sequences).
- Repeated block groups are `nn.scan`-compiled: each level materializes its first
  repetition (it may consume the UNet skip) and scans the remaining ones over
  stacked parameters. The default config runs 56 block instances eagerly in the
  reference; here XLA sees ~12, which cuts compile time ~5x with identical math.

Architecture (reference call stack src/modules.py:263-275):
  tokens (B,H,W) -> Embed+LN -> space_to_depth(patch) -> 1x1 conv -> LN
  -> down levels [CT]x6 @ c640, [CTA]x16 @ c1280 (stride-2), [CTA]x6 @ c1280 (stride-2)
  -> mirrored up levels with skip-concat into the first ResBlock of shallower levels
  -> LN -> 1x1 conv (zero-init) -> depth_to_space(patch) -> LN -> 1x1 (tied) -> logits
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.core import FrozenDict

from ..config import PaellaConfig
from ..nn import init as tinit
from ..nn.blocks import (
    AttnBlock,
    Downsample,
    FeedForwardBlock,
    FusedResBlock,
    ResBlock,
    TimestepBlock,
    Upsample,
)


from ..kernels.resblock import fuse_mode
from ..nn.blocks import _DenseParams
from ..nn.functional import (
    depth_to_space_pmajor,
    layer_norm,
    pmajor_permutation,
    sinusoidal_embedding,
    space_to_depth_pmajor,
)


def _can_fuse_resblock(
    x, c: int, kernel_size: int, with_skip: bool = False, weight_itemsize=None
) -> bool:
    """Static gate for the fused ResBlock kernel (kernels/resblock.py::fuse_mode):
    tile-aligned channels and VMEM-resident scratch — full-batch when it fits,
    per-batch-item grid otherwise (how the 1B level-0 blocks fuse). Blocks that
    fail both keep the XLA path; the parameter tree is identical either way."""
    return (
        fuse_mode(
            x.shape, x.dtype, c, kernel_size,
            with_skip=with_skip, weight_itemsize=weight_itemsize,
        )
        is not None
    )


def _fc_weight_itemsize(mdl, name: str, rep_key: Optional[str] = None):
    """1 when a block's fc kernels are int8 (they stream as s8 tiles), else
    None (float kernels are cast to the activation dtype before the kernel,
    so the default activation-itemsize budget is already correct)."""
    if mdl.is_initializing() or not mdl.has_variable("params", name):
        return None
    p = mdl.get_variable("params", name)
    if rep_key is not None:
        p = p.get(rep_key, {})
    k1 = p.get("channelwise", {}).get("fc1", {}).get("kernel")
    if k1 is not None and k1.dtype == jnp.int8:
        return 1
    return None

Array = jax.Array


class BlockGroup(nn.Module):
    """One repetition of a level's block sequence (e.g. 'CTA'), no skip input.

    nn.scan maps this over the level's remaining repetitions with parameters
    stacked on a leading axis (the converter stacks the torch per-rep weights).
    """

    level_config: str
    c: int
    nhead: int
    c_r: int
    c_cond: int
    kernel_size: int
    dropout: float
    out_init_scale: float
    self_attn: bool
    dtype: Any
    deterministic: bool = True
    attention_impl: str = "xla"
    fused_blocks: bool = False
    act_quant: bool = False

    @nn.compact
    def __call__(self, x, r_embed, c_embed, cond_mask, cond_reweight):
        seq = self.level_config
        k = 0
        while k < len(seq):
            bt = seq[k]
            name = f"{k}_{bt}"
            if (
                bt == "C"
                and self.fused_blocks
                and self.deterministic
                and _can_fuse_resblock(
                    x, self.c, self.kernel_size,
                    weight_itemsize=_fc_weight_itemsize(self, name),
                )
            ):
                film_ab = None
                consumed = 1
                if k + 1 < len(seq) and seq[k + 1] == "T":
                    film_ab = TimestepBlock(
                        self.c, self.c_r, dtype=self.dtype, name=f"{k + 1}_T"
                    )(x, r_embed, return_ab=True)
                    consumed = 2
                x = FusedResBlock(
                    self.c,
                    kernel_size=self.kernel_size,
                    out_init_scale=self.out_init_scale,
                    dtype=self.dtype,
                    act_quant=self.act_quant,
                    name=name,
                )(x, film_ab)
                k += consumed
                continue
            if bt == "C":
                x = ResBlock(
                    self.c,
                    kernel_size=self.kernel_size,
                    dropout=self.dropout,
                    out_init_scale=self.out_init_scale,
                    dtype=self.dtype,
                    name=name,
                )(x, deterministic=self.deterministic)
            elif bt == "T":
                x = TimestepBlock(self.c, self.c_r, dtype=self.dtype, name=name)(x, r_embed)
            elif bt == "A":
                x = AttnBlock(
                    self.c,
                    self.c_cond,
                    self.nhead,
                    self_attn=self.self_attn,
                    dropout=self.dropout,
                    dtype=self.dtype,
                    attention_impl=self.attention_impl,
                    name=name,
                )(
                    x,
                    c_embed,
                    cond_mask=cond_mask,
                    cond_reweight=cond_reweight,
                    deterministic=self.deterministic,
                )
            elif bt == "F":
                x = FeedForwardBlock(
                    self.c,
                    dropout=self.dropout,
                    out_init_scale=self.out_init_scale,
                    dtype=self.dtype,
                    name=name,
                )(x, deterministic=self.deterministic)
            else:
                raise ValueError(f"Block type {bt} not supported")
            k += 1
        return x, None


class Paella(nn.Module):
    """Token-space denoiser. See module docstring.

    __call__(x, r, byt5, clip, clip_image, x_cat, ...) mirrors the reference forward
    (src/modules.py:263); conditioning inputs:
      x          (B, H, W) int32 token grid
      r          (B,) float noise level in (0, 1]
      byt5       (B, S, byt5_embd) frozen ByT5 encoder states
      clip       (B, clip_embd) CLIP text embedding or None
      clip_image (B, clip_embd) CLIP image embedding or None
      x_cat      optional extra token rows concatenated along H (src/modules.py:264-265)
      byt5_mask / clip_mask / clip_image_mask: optional boolean masks; a False
        clip/image mask drops that modality's tokens from attention, which lets a
        cond/uncond CFG pair with different modality sets run as one batch.
      cond_reweight: (B, S_cond_total) multiplicative post-softmax attention
        reweighting over conditioning tokens (utils/alter_attention.py parity).
    """

    config: PaellaConfig

    def _cond_embed_modules(self):
        cfg = self.config
        dtype = cfg.compute_dtype
        mk = lambda feats, name: nn.Dense(
            feats, dtype=dtype, kernel_init=tinit.normal(0.02), bias_init=tinit.zeros, name=name
        )
        return (
            mk(cfg.c_cond, "byt5_mapper"),
            mk(cfg.c_cond * cfg.clip_seq_len, "clip_mapper"),
            mk(cfg.c_cond * cfg.clip_seq_len, "clip_image_mapper"),
        )

    def gen_r_embedding(self, r: Array) -> Array:
        """Sinusoidal noise-level embedding (reference: src/modules.py:212-221)."""
        return sinusoidal_embedding(r, self.config.c_r).astype(self.config.compute_dtype)

    def _gen_c_embeddings(
        self, mappers, byt5, clip, clip_image, byt5_mask, clip_mask, clip_image_mask
    ):
        """Assemble the conditioning sequence (reference: src/modules.py:223-232).

        Returns (seq (B, S, c_cond), mask (B, S) or None). The reference has no
        padding mask — pass no masks for bit-faithful parity with torch outputs.
        """
        cfg = self.config
        from ..parallel.mesh import constrain_batch

        byt5_mapper, clip_mapper, clip_image_mapper = mappers
        b = byt5.shape[0]
        parts = [byt5_mapper(byt5.astype(cfg.compute_dtype))]
        mask_parts = [byt5_mask if byt5_mask is not None else jnp.ones(byt5.shape[:2], bool)]
        any_mask = byt5_mask is not None
        if clip is not None:
            parts.append(
                clip_mapper(clip.astype(cfg.compute_dtype)).reshape(b, cfg.clip_seq_len, cfg.c_cond)
            )
            mask_parts.append(
                jnp.broadcast_to(
                    (clip_mask[:, None] if clip_mask is not None else jnp.ones((b, 1), bool)),
                    (b, cfg.clip_seq_len),
                )
            )
            any_mask |= clip_mask is not None
        if clip_image is not None:
            # multi-image conditioning (the reference's notebook variant,
            # utils/modules.py:228-235): (B, K, clip_embd) -> K * clip_seq_len
            # tokens; a single (B, clip_embd) image is the K=1 case.
            imgs = clip_image if clip_image.ndim == 3 else clip_image[:, None, :]
            k_imgs = imgs.shape[1]
            parts.append(
                clip_image_mapper(imgs.astype(cfg.compute_dtype)).reshape(
                    b, k_imgs * cfg.clip_seq_len, cfg.c_cond
                )
            )
            if clip_image_mask is not None:
                # mask may be (B,) for all images or (B, K) per image
                im = clip_image_mask if clip_image_mask.ndim == 2 else clip_image_mask[:, None]
                im = jnp.broadcast_to(im, (b, k_imgs))
                mask_parts.append(jnp.repeat(im, cfg.clip_seq_len, axis=1))
            else:
                mask_parts.append(jnp.ones((b, k_imgs * cfg.clip_seq_len), bool))
            any_mask |= clip_image_mask is not None
        # pin batch-only sharding: the mappers' fsdp/tp weight shardings
        # otherwise propagate into these (tiny) activations and force SPMD
        # rematerialization at the reshape/concat (seen at 1B fsdp=8)
        parts = [constrain_batch(p) for p in parts]
        seq = layer_norm(jnp.concatenate(parts, axis=1))
        mask = jnp.concatenate(mask_parts, axis=1) if any_mask else None
        return seq, mask

    def gen_cond_cache(
        self,
        byt5: Array,
        clip: Optional[Array] = None,
        clip_image: Optional[Array] = None,
        byt5_mask: Optional[Array] = None,
        clip_mask: Optional[Array] = None,
        clip_image_mask: Optional[Array] = None,
    ) -> dict:
        """Precompute every sampling-step-invariant conditioning activation.

        The sampler runs the denoiser inside a lax.scan; XLA's while-loop
        invariant code motion does NOT hoist these (traced: ~70 us/step of
        redundant recompute at the 1B geometry — the normalized embedding
        table, the cond-sequence mappers, and the per-repetition kv
        projections). Computing them ONCE via this method and passing the
        result as `cond_cache=` to __call__ makes them true loop constants.
        Bit-equal to the uncached path (pinned by test_denoiser.py).

        (Plain method — only __call__ may be @nn.compact — so the mappers are
        applied functionally on their raw params, matching nn.Dense's op
        order: cast input+kernel+bias to compute dtype, dot, add.)
        """
        cfg = self.config
        dtype = cfg.compute_dtype
        from ..nn.functional import silu as _silu

        def functional_dense(name):
            pr = self.get_variable("params", name)

            def apply(v):
                return jnp.dot(v, pr["kernel"].astype(dtype)) + pr["bias"].astype(dtype)

            return apply

        mappers = tuple(
            functional_dense(nm) for nm in ("byt5_mapper", "clip_mapper", "clip_image_mapper")
        )
        c_embed, cond_mask = self._gen_c_embeddings(
            mappers, byt5, clip, clip_image, byt5_mask, clip_mask, clip_image_mask
        )
        cache = {"c_embed": c_embed, "cond_mask": cond_mask}
        # LN commutes with the embedding gather (both are per-row); the
        # normalized table replaces layer_norm(in_embedding(x)) per step.
        emb = self.get_variable("params", "in_embedding")["embedding"]
        cache["norm_embedding"] = layer_norm(emb).astype(dtype)
        # kv_mapper outputs for every scanned CTA level instance
        for prefix in ("down", "up"):
            for i in range(len(cfg.c_hidden)):
                pattern = cfg.level_config[i]
                name = f"{prefix}_{i}_rest"
                if not pattern.endswith("A") or cfg.blocks[i] <= 1:
                    continue
                if not self.has_variable("params", name):
                    continue
                p_a = self.get_variable("params", name)[f"{len(pattern) - 1}_A"]
                kvm = p_a["kv_mapper"]
                cache[f"kv_all_{name}"] = (
                    jnp.einsum(
                        "bsk,rko->rbso",
                        _silu(c_embed).astype(dtype),
                        kvm["kernel"].astype(dtype),
                    )
                    + kvm["bias"][:, None, None, :].astype(dtype)
                )
        return cache

    @nn.compact
    def __call__(
        self,
        x: Array,
        r: Array,
        byt5: Array,
        clip: Optional[Array] = None,
        clip_image: Optional[Array] = None,
        x_cat: Optional[Array] = None,
        byt5_mask: Optional[Array] = None,
        clip_mask: Optional[Array] = None,
        clip_image_mask: Optional[Array] = None,
        cond_reweight: Optional[Array] = None,
        deterministic: bool = True,
        return_features: bool = False,
        cond_cache: Optional[dict] = None,
    ) -> Array:
        cfg = self.config
        dtype = cfg.compute_dtype
        n = len(cfg.c_hidden)
        out_scale = (1.0 / sum(cfg.blocks)) ** 0.5
        if cfg.split_skip_levels and not (cfg.fused_blocks and deterministic):
            raise ValueError(
                "split_skip_levels is an inference-only layout: it requires "
                "fused_blocks=True and deterministic=True (the XLA grouped-conv "
                "skip path reads the interleaved concat, which no longer exists)"
            )
        if x_cat is not None:
            x = jnp.concatenate([x, x_cat], axis=1)  # reference: src/modules.py:264-265

        r_embed = self.gen_r_embedding(r)
        if cond_cache is not None:
            c_embed, cond_mask = cond_cache["c_embed"], cond_cache["cond_mask"]
        else:
            c_embed, cond_mask = self._gen_c_embeddings(
                self._cond_embed_modules(), byt5, clip, clip_image, byt5_mask, clip_mask, clip_image_mask
            )

        # token embed -> patchify -> project (reference: src/modules.py:271).
        # The patchify runs in PATCH-MAJOR channel order (contiguous c-blocks
        # per patch offset — the torch ordering's every-lane interleave made
        # the transpose shuffle-bound, traced at 40 us/step); the projection
        # kernel's rows are permuted to compensate, so the params stay in the
        # torch/checkpoint order and the math is exactly the reference's.
        if cond_cache is not None:
            h = jnp.take(cond_cache["norm_embedding"], x, axis=0)
        else:
            in_embedding = nn.Embed(
                cfg.num_labels,
                cfg.c_in,
                embedding_init=tinit.normal((1.0 / cfg.num_labels) ** 0.5),
                param_dtype=jnp.float32,
                name="in_embedding",
            )
            h = layer_norm(in_embedding(x)).astype(dtype)
        h = space_to_depth_pmajor(h, cfg.patch_size)
        ek, eb, _ = _DenseParams(
            cfg.c_in * cfg.patch_size**2,
            cfg.c_hidden[0],
            tinit.xavier_uniform(0.02),
            name="embedding_conv",
        )()
        perm_in = pmajor_permutation(cfg.c_in, cfg.patch_size)
        h = jnp.dot(h, jnp.take(ek, perm_in, axis=0).astype(dtype)) + eb.astype(dtype)
        h = layer_norm(h)

        def first_rep(prefix: str, i: int, h, skip):
            """Materialized first repetition of a level (may take the UNet skip)."""
            seq = cfg.level_config[i]
            k = 0
            while k < len(seq):
                bt = seq[k]
                name = f"{prefix}_{i}_0_{k}_{bt}"
                x_skip = skip if k == 0 else None
                if (
                    bt == "C"
                    and cfg.fused_blocks
                    and deterministic
                    and (x_skip is None or x_skip.shape[-1] == cfg.c_hidden[i])
                    and _can_fuse_resblock(
                        h, cfg.c_hidden[i], cfg.kernel_size,
                        with_skip=x_skip is not None,
                        weight_itemsize=_fc_weight_itemsize(self, name),
                    )
                ):
                    film_ab = None
                    consumed = 1
                    if k + 1 < len(seq) and seq[k + 1] == "T":
                        film_ab = TimestepBlock(
                            cfg.c_hidden[i], cfg.c_r, dtype=dtype,
                            name=f"{prefix}_{i}_0_{k + 1}_T",
                        )(h, r_embed, return_ab=True)
                        consumed = 2
                    h = FusedResBlock(
                        cfg.c_hidden[i],
                        c_skip=0 if x_skip is None else x_skip.shape[-1],
                        kernel_size=cfg.kernel_size,
                        out_init_scale=out_scale,
                        dtype=dtype,
                        act_quant=cfg.act_quant,
                        split_planes=(
                            i in cfg.split_skip_levels and x_skip is not None
                        ),
                        name=name,
                    )(h, film_ab, x_skip=x_skip)
                    k += consumed
                    continue
                if bt == "C":
                    if i in cfg.split_skip_levels and k == 0 and skip is not None:
                        raise ValueError(
                            f"split_skip_levels: the level-{i} skip block failed "
                            "the fuse gate but MUST run the fused kernel — the "
                            "XLA grouped-conv path reads the interleaved concat, "
                            "which the split layout no longer provides"
                        )
                    # Same hazard guard as rest_reps: int8 kernels (quant.
                    # quantize_paella_int8 include_first=True) are codes, not
                    # weights — the XLA Dense fallback would silently cast
                    # them to bf16 and produce garbage.
                    if not self.is_initializing() and self.has_variable("params", name):
                        pb = self.get_variable("params", name)
                        if any(
                            getattr(l, "dtype", None) == jnp.int8
                            for l in jax.tree_util.tree_leaves(pb)
                        ):
                            raise ValueError(
                                f"{name} holds int8 weights but is not on the "
                                "fused kernel path (fuse gate failed or "
                                "fused_blocks/deterministic off) — int8 codes "
                                "have no meaning to the XLA Dense path. Use a "
                                "fuse-eligible geometry or keep this block bf16."
                            )
                    c_skip = skip.shape[-1] if (skip is not None and k == 0) else 0
                    h = ResBlock(
                        cfg.c_hidden[i],
                        c_skip=c_skip,
                        kernel_size=cfg.kernel_size,
                        dropout=cfg.dropout[i],
                        out_init_scale=out_scale,
                        dtype=dtype,
                        name=name,
                    )(h, skip if k == 0 else None, deterministic=deterministic)
                elif bt == "T":
                    h = TimestepBlock(cfg.c_hidden[i], cfg.c_r, dtype=dtype, name=name)(h, r_embed)
                elif bt == "A":
                    h = AttnBlock(
                        cfg.c_hidden[i],
                        cfg.c_cond,
                        cfg.nhead[i],
                        self_attn=cfg.self_attn,
                        dropout=cfg.dropout[i],
                        dtype=dtype,
                        attention_impl=cfg.attention_impl,
                        name=name,
                    )(h, c_embed, cond_mask=cond_mask, cond_reweight=cond_reweight,
                      deterministic=deterministic)
                elif bt == "F":
                    h = FeedForwardBlock(
                        cfg.c_hidden[i],
                        dropout=cfg.dropout[i],
                        out_init_scale=out_scale,
                        dtype=dtype,
                        name=name,
                    )(h, deterministic=deterministic)
                k += 1
            return h

        def rest_reps_fused(prefix: str, i: int, h):
            """Inference fast path: manual lax.scan over the SAME stacked params
            nn.scan created, with ResBlock+FiLM evaluated by the Pallas kernel.
            The kernel takes the full stacked weights plus the repetition index
            as a scalar-prefetch argument — nn.scan's per-step weight slices
            materialized 26 MB/rep of HBM copies (traced at 36 us/rep), which
            this avoids entirely. Attention applies functionally on
            dynamically-indexed params (those slices fuse into the matmuls)."""
            from ..kernels.resblock import fused_resblock_stacked

            stacked = self.get_variable("params", f"{prefix}_{i}_rest")
            pattern = cfg.level_config[i]
            reps = cfg.blocks[i] - 1
            p_c = stacked["0_C"]
            cw = p_c["channelwise"]
            bgrid = (
                fuse_mode(
                    h.shape, h.dtype, cfg.c_hidden[i], cfg.kernel_size,
                    weight_itemsize=(
                        1 if cw["fc1"]["kernel"].dtype == jnp.int8 else None
                    ),
                )
                == "batch"
            )
            # true W8A8 (cfg.act_quant + quantized weights): fc matmuls run as
            # s8 x s8 inside the fused kernel; the attention qkvo matmuls run
            # as s8 x s8 XLA dots with per-row dynamic activation quant.
            act_q = (
                cfg.act_quant
                and cw["fc1"].get("kernel_scale") is not None
                and cw["fc2"].get("kernel_scale") is not None
            )

            film_all = None
            if len(pattern) > 1 and pattern[1] == "T":
                p_t = stacked["1_T"]["mapper"]
                film_all = (
                    jnp.einsum(
                        "bk,rko->rbo", r_embed.astype(dtype), p_t["kernel"].astype(dtype)
                    )
                    + p_t["bias"][:, None, :].astype(dtype)
                )

            attn = None
            if pattern.endswith("A"):
                from ..nn.attention import dot_product_attention
                from ..nn.functional import layer_norm as _ln, silu as _silu

                p_a = stacked[f"{len(pattern) - 1}_A"]
                nhead = cfg.nhead[i]
                # hoisted out of the scan (all loop-invariant):
                # - kv_mapper applied for ALL reps in one einsum
                # - k and v kernels pre-concatenated so the in-loop projection
                #   of the (pixels + cond) sequence is ONE matmul
                if cond_cache is not None:
                    # hoisted out of the sampling scan entirely (gen_cond_cache)
                    kv_all = cond_cache[f"kv_all_{prefix}_{i}_rest"]
                else:
                    kvm = p_a["kv_mapper"]
                    kv_all = (
                        jnp.einsum(
                            "bsk,rko->rbso",
                            _silu(c_embed).astype(dtype),
                            kvm["kernel"].astype(dtype),
                        )
                        + kvm["bias"][:, None, None, :].astype(dtype)
                    )  # (R, B, S_cond, c)
                pa_att = p_a["attention"]
                w_kv = jnp.concatenate(
                    [pa_att["k"]["kernel"], pa_att["v"]["kernel"]], axis=-1
                ).astype(dtype)  # (R, c, 2c)
                b_kv = jnp.concatenate(
                    [pa_att["k"]["bias"], pa_att["v"]["bias"]], axis=-1
                ).astype(dtype)  # (R, 2c)
                w_q = pa_att["q"]["kernel"].astype(dtype)
                b_q = pa_att["q"]["bias"].astype(dtype)
                w_o = pa_att["o"]["kernel"].astype(dtype)
                b_o = pa_att["o"]["bias"].astype(dtype)
                # NB: qkvo as s8 x s8 XLA dots (per-row dynamic activation
                # quant) was tried and MEASURED SLOWER (sampler 110.1 vs
                # 108.4 p50): these matmuls are dispatch/overhead-bound
                # (56 us/rep vs ~39 floor), so the out-of-kernel quant VPU
                # work exceeds the s8 MAC savings. W8A8 stays fc-only.

                c_i = cfg.c_hidden[i]
                b_, hh_, ww_ = h.shape[0], h.shape[1], h.shape[2]
                s_c = kv_all.shape[2]
                # the kernel pads heads to 128 lanes (Mosaic can't shape-cast
                # 80-lane heads); its padded qkv scratch must fit VMEM — true
                # for the small deep levels where dispatch overhead dominates
                qkv_scratch = (
                    b_ * (hh_ * ww_ + s_c) * 3 * nhead * 128 * jnp.dtype(dtype).itemsize
                )
                use_attn_kernel = (
                    cfg.attn_block_kernel
                    and cond_reweight is None
                    and c_i % 128 == 0
                    and nhead % 2 == 0
                    and qkv_scratch <= 4_500_000
                )
                if use_attn_kernel:
                    from ..kernels.attn_block import (
                        fused_attn_block_stacked,
                        pad_attn_weights,
                    )

                    wqkv = jnp.concatenate([w_q, w_kv], axis=-1)  # (R, c, 3c)
                    bqkv = jnp.concatenate([b_q, b_kv], axis=-1)
                    # padded OUTSIDE the scan: lax.scan re-executes invariant
                    # body computations every iteration (traced: 120 us/rep)
                    wqkv_p, bqkv_p, wo_p = pad_attn_weights(wqkv, bqkv, w_o, nhead)
                    c3p = 3 * nhead * 128
                    tile = 512 if c3p % 512 == 0 else 128
                    chunk = 4 if nhead % 4 == 0 else 2

                    def attn(x, idx):
                        return fused_attn_block_stacked(
                            x, kv_all, wqkv_p, bqkv_p, wo_p, b_o, idx, nhead,
                            cond_mask=cond_mask, head_chunk=chunk,
                            tile_qkv=tile, tile_o=128 if c_i % 256 else 256,
                        )

                    h, _ = jax.lax.scan(
                        lambda hh, idx: (
                            attn(
                                fused_resblock_stacked(
                                    hh.astype(dtype),
                                    p_c["depthwise"]["kernel"],
                                    p_c["depthwise"]["bias"],
                                    cw["fc1"]["kernel"],
                                    cw["fc1"]["bias"],
                                    cw["grn"]["gamma"],
                                    cw["grn"]["beta"],
                                    cw["fc2"]["kernel"],
                                    cw["fc2"]["bias"],
                                    idx,
                                    film_ab=film_all,
                                    fc1_scale=cw["fc1"].get("kernel_scale"),
                                    fc2_scale=cw["fc2"].get("kernel_scale"),
                                    batch_grid=bgrid,
                                ),
                                idx,
                            ),
                            None,
                        ),
                        h,
                        jnp.arange(reps),
                    )
                    return h

                def attn(x, idx):
                    """AttnBlock math (nn/blocks.py::AttnBlock) on per-rep
                    dynamically-indexed params; parity pinned by
                    test_resblock_kernel.py::test_fused_blocks_model_parity."""
                    b, hh_, ww_, c = x.shape
                    n_pix = hh_ * ww_
                    tokens = _ln(x).reshape(b, n_pix, c).astype(dtype)
                    kv = kv_all[idx]
                    kv_full = jnp.concatenate([tokens, kv], axis=1)
                    kv_mask = None
                    if cond_mask is not None:
                        kv_mask = jnp.concatenate(
                            [jnp.ones((b, n_pix), bool), cond_mask], axis=1
                        )
                    reweight = None
                    if cond_reweight is not None:
                        cw_ = jnp.broadcast_to(cond_reweight, (b, kv.shape[1]))
                        pix_w = jnp.ones((b, n_pix), dtype=cw_.dtype)
                        reweight = jnp.concatenate([pix_w, cw_], axis=-1)[:, None, None, :]

                    hd = c // nhead
                    s = kv_full.shape[1]
                    if cfg.attn_qkvo_2d:
                        # 2D forms of the projections: avoids XLA's batched-dot
                        # operand relayouts ({2,1,0}->{1,2,0} copies per rep)
                        q = (
                            tokens.reshape(b * n_pix, c) @ w_q[idx] + b_q[idx]
                        ).reshape(b, n_pix, nhead, hd)
                        kvp = (
                            kv_full.reshape(b * s, c) @ w_kv[idx] + b_kv[idx]
                        ).reshape(b, s, 2 * c)
                    else:
                        q = (tokens @ w_q[idx] + b_q[idx]).reshape(b, n_pix, nhead, hd)
                        kvp = kv_full @ w_kv[idx] + b_kv[idx]
                    xk, xv = jnp.split(kvp, 2, axis=-1)
                    xk = xk.reshape(b, s, nhead, hd)
                    xv = xv.reshape(b, s, nhead, hd)
                    out = dot_product_attention(q, xk, xv, kv_mask=kv_mask, reweight=reweight)
                    if cfg.attn_qkvo_2d:
                        out = (
                            out.reshape(b * n_pix, c) @ w_o[idx] + b_o[idx]
                        ).reshape(b, n_pix, c)
                    else:
                        out = out.reshape(b, n_pix, c) @ w_o[idx] + b_o[idx]
                    return x + out.reshape(b, hh_, ww_, c).astype(x.dtype)

            # beta @ W2 can't join an s8 dot; precompute per repetition
            # (loop-invariant) for the kernel's act_quant path.
            beta_w2_all = None
            if act_q:
                beta_w2_all = (
                    jnp.einsum(
                        "rk,rkn->rn",
                        cw["grn"]["beta"].astype(jnp.float32),
                        cw["fc2"]["kernel"].astype(jnp.float32),
                    )
                    * cw["fc2"]["kernel_scale"]
                )

            def body(hh, idx):
                out = fused_resblock_stacked(
                    hh.astype(dtype),
                    p_c["depthwise"]["kernel"],
                    p_c["depthwise"]["bias"],
                    cw["fc1"]["kernel"],
                    cw["fc1"]["bias"],
                    cw["grn"]["gamma"],
                    cw["grn"]["beta"],
                    cw["fc2"]["kernel"],
                    cw["fc2"]["bias"],
                    idx,
                    film_ab=film_all,
                    # weight-only int8 (quant.quantize_paella_int8) rides along
                    fc1_scale=cw["fc1"].get("kernel_scale"),
                    fc2_scale=cw["fc2"].get("kernel_scale"),
                    batch_grid=bgrid,
                    act_quant=act_q,
                    beta_w2=beta_w2_all,
                )
                if attn is not None:
                    out = attn(out, idx)
                return out, None

            # NB measured: unrolling this scan (full or chunks of 5) does NOT
            # help — the per-repetition cost is op time, not loop overhead
            # (84.5 vs 84.8 ms module wall) — so keep the compact loop.
            h, _ = jax.lax.scan(body, h, jnp.arange(reps))
            return h

        def rest_reps(prefix: str, i: int, h):
            """Remaining blocks[i]-1 repetitions, scanned over stacked params."""
            reps = cfg.blocks[i] - 1
            if reps <= 0:
                return h
            pattern = cfg.level_config[i]
            if (
                cfg.fused_blocks
                and deterministic
                and not self.is_initializing()
                and pattern in ("CT", "CTA")
                and _can_fuse_resblock(
                    h, cfg.c_hidden[i], cfg.kernel_size,
                    weight_itemsize=_fc_weight_itemsize(
                        self, f"{prefix}_{i}_rest", rep_key="0_C"
                    ),
                )
            ):
                return rest_reps_fused(prefix, i, h)
            if not self.is_initializing():
                st = self.get_variable("params", f"{prefix}_{i}_rest")
                if any(
                    getattr(l, "dtype", None) == jnp.int8
                    for l in jax.tree_util.tree_leaves(st)
                ):
                    raise ValueError(
                        f"{prefix}_{i}_rest holds int8 weights (quant."
                        "quantize_paella_int8) but this level is not on the "
                        "fused kernel path — int8 codes have no meaning to the "
                        "XLA Dense path. Use fused_blocks=True with a "
                        "fuse-eligible geometry, or keep these levels bf16."
                    )
            do_remat = cfg.remat if cfg.remat_levels is None else cfg.remat_levels[i]
            group_cls = nn.remat(BlockGroup) if do_remat else BlockGroup
            scanned = nn.scan(
                group_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=nn.broadcast,
                length=reps,
            )(
                level_config=cfg.level_config[i],
                c=cfg.c_hidden[i],
                nhead=cfg.nhead[i],
                c_r=cfg.c_r,
                c_cond=cfg.c_cond,
                kernel_size=cfg.kernel_size,
                dropout=cfg.dropout[i],
                out_init_scale=out_scale,
                self_attn=cfg.self_attn,
                dtype=dtype,
                deterministic=deterministic,
                attention_impl=cfg.attention_impl,
                fused_blocks=cfg.fused_blocks,
                act_quant=cfg.act_quant,
                name=f"{prefix}_{i}_rest",
            )
            h, _ = scanned(h, r_embed, c_embed, cond_mask, cond_reweight)
            return h

        # DOWN (reference: src/modules.py:234-247); level_outputs deepest-first
        level_outputs = []
        for i in range(n):
            if i > 0:
                h = Downsample(cfg.c_hidden[i], dtype=dtype, name=f"down_{i}_downsample")(h)
            h = first_rep("down", i, h, None)
            h = rest_reps("down", i, h)
            level_outputs.insert(0, h)

        # UP (reference: src/modules.py:249-261); deepest level first
        h = level_outputs[0]
        for idx, i in enumerate(reversed(range(n))):
            skip = level_outputs[idx] if idx > 0 else None
            h = first_rep("up", i, h, skip)
            h = rest_reps("up", i, h)
            if i > 0:
                h = Upsample(cfg.c_hidden[i - 1], dtype=dtype, name=f"up_{i}_upsample")(h)

        # OUTPUT head (reference: src/modules.py:179-187, 274). Same
        # patch-major trick as the input: clf's output columns are permuted so
        # the un-patchify moves contiguous c-blocks; params stay torch-ordered.
        h = layer_norm(h)
        ck, cb, _ = _DenseParams(
            cfg.c_hidden[0],
            cfg.c_out * cfg.patch_size**2,
            tinit.zeros,
            name="clf_conv",
        )()
        perm_out = pmajor_permutation(cfg.c_out, cfg.patch_size)
        h = (
            jnp.dot(h.astype(dtype), jnp.take(ck, perm_out, axis=1).astype(dtype))
            + cb[perm_out].astype(dtype)
        )
        h = depth_to_space_pmajor(h, cfg.patch_size)
        # keep the un-patchify transpose in bf16: without the barrier XLA
        # fuses the final layer_norm's f32 upcast backward through it and the
        # copies run at twice the bytes (traced: 80 us/step of f32 copies)
        h = jax.lax.optimization_barrier(h)
        h = layer_norm(h)
        if return_features:
            # pre-head features (B, H, W, c_out). The head is LINEAR (no bias),
            # so any affine combination of logits — notably the CFG mix —
            # commutes through it; the sampler exploits this to mix c_out-dim
            # features instead of num_labels-dim logits (32x less HBM traffic
            # at the 8192-label flagship geometry).
            return h
        # out kernel is value-tied to in_embedding at init by init_params()
        # (reference: src/modules.py:197); trained independently afterwards.
        logits = nn.Dense(
            cfg.num_labels,
            use_bias=False,
            dtype=dtype,
            kernel_init=tinit.normal((1.0 / cfg.num_labels) ** 0.5),
            name="out_proj",
        )(h)
        return logits


def init_params(model: Paella, rng: Array, latent_hw: tuple[int, int] = (8, 8)) -> FrozenDict:
    """Initialize parameters and apply the reference's out/in weight tie
    (reference: src/modules.py:197 copies the input embedding into the output
    projection at init; they train independently afterwards)."""
    cfg = model.config
    h, w = latent_hw
    x = jnp.zeros((1, h, w), jnp.int32)
    r = jnp.ones((1,), jnp.float32)
    byt5 = jnp.zeros((1, 4, cfg.byt5_embd), jnp.float32)
    clip = jnp.zeros((1, cfg.clip_embd), jnp.float32)
    # jit the init: unjitted flax init dispatches thousands of tiny ops eagerly,
    # which is pathological on remote/tunneled TPU backends
    init_fn = jax.jit(lambda k: model.init(k, x, r, byt5, clip, clip, deterministic=True))
    variables = init_fn(rng)
    params = variables["params"]
    params = jax.tree_util.tree_map(lambda p: p, params)  # shallow copy
    emb = params["in_embedding"]["embedding"]  # (num_labels, c_in)
    params = flatten_set(params, ("out_proj", "kernel"), jnp.transpose(emb))
    return params


def flatten_set(params, path, value):
    """Return params with params[path...] = value (pure update)."""
    import flax

    flat = flax.traverse_util.flatten_dict(flax.core.unfreeze(params))
    flat[path] = value
    return flax.traverse_util.unflatten_dict(flat)


def count_params(params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
