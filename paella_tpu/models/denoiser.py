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
    ResBlock,
    TimestepBlock,
    Upsample,
)
from ..nn.functional import depth_to_space, layer_norm, sinusoidal_embedding, space_to_depth

Array = jax.Array


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
        clip/image mask drops that modality's 4 tokens from attention, which lets a
        cond/uncond CFG pair with different modality sets run as one batch.
      cond_reweight: (B, S_cond_total) multiplicative post-softmax attention
        reweighting over conditioning tokens (utils/alter_attention.py parity).
    """

    config: PaellaConfig

    def setup(self):
        cfg = self.config
        dtype = cfg.compute_dtype
        n_blocks_total = sum(cfg.blocks)
        out_scale = (1.0 / n_blocks_total) ** 0.5

        # CONDITIONING (reference: src/modules.py:121-124)
        self.byt5_mapper = nn.Dense(
            cfg.c_cond, dtype=dtype, kernel_init=tinit.normal(0.02), bias_init=tinit.zeros
        )
        self.clip_mapper = nn.Dense(
            cfg.c_cond * cfg.clip_seq_len,
            dtype=dtype,
            kernel_init=tinit.normal(0.02),
            bias_init=tinit.zeros,
        )
        self.clip_image_mapper = nn.Dense(
            cfg.c_cond * cfg.clip_seq_len,
            dtype=dtype,
            kernel_init=tinit.normal(0.02),
            bias_init=tinit.zeros,
        )

        # IN/OUT MAPPERS (reference: src/modules.py:126-134, 179-187)
        self.in_embedding = nn.Embed(
            cfg.num_labels,
            cfg.c_in,
            embedding_init=tinit.normal((1.0 / cfg.num_labels) ** 0.5),
            param_dtype=jnp.float32,
        )
        self.embedding_conv = nn.Dense(
            cfg.c_hidden[0],
            dtype=dtype,
            kernel_init=tinit.xavier_uniform(0.02),
            bias_init=tinit.zeros,
        )
        self.clf_conv = nn.Dense(
            cfg.c_out * cfg.patch_size**2,
            dtype=dtype,
            kernel_init=tinit.zeros,
            bias_init=tinit.zeros,
        )
        # out kernel is value-tied to in_embedding at init by init_params()
        # (reference: src/modules.py:197); trained independently afterwards.
        self.out_proj = nn.Dense(
            cfg.num_labels,
            use_bias=False,
            dtype=dtype,
            kernel_init=tinit.normal((1.0 / cfg.num_labels) ** 0.5),
        )

        # remat: recompute block activations in backward instead of storing them
        # (jax.checkpoint — the TPU answer to the reference's activation-memory
        # pressure; the reference has no equivalent)
        res_cls = nn.remat(ResBlock) if cfg.remat else ResBlock
        attn_cls = nn.remat(AttnBlock) if cfg.remat else AttnBlock
        ff_cls = nn.remat(FeedForwardBlock) if cfg.remat else FeedForwardBlock

        def make_block(block_type: str, c: int, nhead: int, c_skip: int, drop: float, name: str):
            if block_type == "C":
                return res_cls(
                    c,
                    c_skip=c_skip,
                    kernel_size=cfg.kernel_size,
                    dropout=drop,
                    out_init_scale=out_scale,
                    dtype=dtype,
                    name=name,
                )
            if block_type == "A":
                return attn_cls(
                    c, cfg.c_cond, nhead, self_attn=cfg.self_attn, dropout=drop, dtype=dtype, name=name
                )
            if block_type == "F":
                return ff_cls(c, dropout=drop, out_init_scale=out_scale, dtype=dtype, name=name)
            if block_type == "T":
                return TimestepBlock(c, cfg.c_r, dtype=dtype, name=name)
            raise ValueError(f"Block type {block_type} not supported")

        # DOWN LEVELS (reference: src/modules.py:148-160)
        downsamples = []
        down_levels = []
        for i, c in enumerate(cfg.c_hidden):
            downsamples.append(
                Downsample(c, dtype=dtype, name=f"down_{i}_downsample") if i > 0 else None
            )
            level = []
            for rep in range(cfg.blocks[i]):
                for k, bt in enumerate(cfg.level_config[i]):
                    level.append(
                        (bt, make_block(bt, c, cfg.nhead[i], 0, cfg.dropout[i], f"down_{i}_{rep}_{k}_{bt}"))
                    )
            down_levels.append(level)
        self.downsamples = downsamples
        self.down_levels = down_levels

        # UP LEVELS (reference: src/modules.py:162-176); index order: deepest first
        up_levels = []
        upsamples = []
        n = len(cfg.c_hidden)
        for idx, i in enumerate(reversed(range(n))):
            level = []
            for rep in range(cfg.blocks[i]):
                for k, bt in enumerate(cfg.level_config[i]):
                    c_skip = cfg.c_hidden[i] if (i < n - 1 and rep == 0 and k == 0) else 0
                    level.append(
                        (
                            bt,
                            make_block(
                                bt, cfg.c_hidden[i], cfg.nhead[i], c_skip, cfg.dropout[i], f"up_{i}_{rep}_{k}_{bt}"
                            ),
                        )
                    )
            up_levels.append(level)
            upsamples.append(
                Upsample(cfg.c_hidden[i - 1], dtype=dtype, name=f"up_{i}_upsample") if i > 0 else None
            )
        self.up_levels = up_levels
        self.upsamples = upsamples

    def gen_r_embedding(self, r: Array) -> Array:
        """Sinusoidal noise-level embedding (reference: src/modules.py:212-221)."""
        return sinusoidal_embedding(r, self.config.c_r).astype(self.config.compute_dtype)

    def gen_c_embeddings(
        self,
        byt5: Array,
        clip: Optional[Array],
        clip_image: Optional[Array],
        byt5_mask: Optional[Array] = None,
        clip_mask: Optional[Array] = None,
        clip_image_mask: Optional[Array] = None,
    ) -> tuple[Array, Optional[Array]]:
        """Assemble the conditioning sequence (reference: src/modules.py:223-232).

        Returns (seq (B, S, c_cond), mask (B, S) or None). The reference has no
        padding mask — pass no masks for bit-faithful parity with torch outputs.
        """
        cfg = self.config
        b = byt5.shape[0]
        parts = [self.byt5_mapper(byt5.astype(cfg.compute_dtype))]
        mask_parts = [byt5_mask if byt5_mask is not None else jnp.ones(byt5.shape[:2], bool)]
        any_mask = byt5_mask is not None
        if clip is not None:
            parts.append(self.clip_mapper(clip.astype(cfg.compute_dtype)).reshape(b, cfg.clip_seq_len, cfg.c_cond))
            mask_parts.append(
                jnp.broadcast_to(
                    (clip_mask[:, None] if clip_mask is not None else jnp.ones((b, 1), bool)),
                    (b, cfg.clip_seq_len),
                )
            )
            any_mask |= clip_mask is not None
        if clip_image is not None:
            parts.append(
                self.clip_image_mapper(clip_image.astype(cfg.compute_dtype)).reshape(
                    b, cfg.clip_seq_len, cfg.c_cond
                )
            )
            mask_parts.append(
                jnp.broadcast_to(
                    (clip_image_mask[:, None] if clip_image_mask is not None else jnp.ones((b, 1), bool)),
                    (b, cfg.clip_seq_len),
                )
            )
            any_mask |= clip_image_mask is not None
        seq = jnp.concatenate(parts, axis=1)
        seq = layer_norm(seq)
        mask = jnp.concatenate(mask_parts, axis=1) if any_mask else None
        return seq, mask

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
    ) -> Array:
        cfg = self.config
        if x_cat is not None:
            x = jnp.concatenate([x, x_cat], axis=1)  # reference: src/modules.py:264-265

        r_embed = self.gen_r_embedding(r)
        c_embed, cond_mask = self.gen_c_embeddings(
            byt5, clip, clip_image, byt5_mask, clip_mask, clip_image_mask
        )

        # token embed -> patchify -> project (reference: src/modules.py:271)
        h = self.in_embedding(x)
        h = layer_norm(h).astype(cfg.compute_dtype)
        h = space_to_depth(h, cfg.patch_size)
        h = self.embedding_conv(h)
        h = layer_norm(h)

        def run_block(bt, block, h, skip):
            if bt == "C":
                return block(h, skip, deterministic=deterministic)
            if bt == "A":
                return block(
                    h,
                    c_embed,
                    cond_mask=cond_mask,
                    cond_reweight=cond_reweight,
                    deterministic=deterministic,
                )
            if bt == "T":
                return block(h, r_embed)
            return block(h, deterministic=deterministic)

        # DOWN (reference: src/modules.py:234-247); level_outputs deepest-first
        level_outputs = []
        for down, level in zip(self.downsamples, self.down_levels):
            if down is not None:
                h = down(h)
            for bt, block in level:
                h = run_block(bt, block, h, None)
            level_outputs.insert(0, h)

        # UP (reference: src/modules.py:249-261)
        h = level_outputs[0]
        for i, (level, up) in enumerate(zip(self.up_levels, self.upsamples)):
            for j, (bt, block) in enumerate(level):
                skip = level_outputs[i] if (j == 0 and i > 0) else None
                h = run_block(bt, block, h, skip)
            if up is not None:
                h = up(h)

        # OUTPUT head (reference: src/modules.py:179-187, 274)
        h = layer_norm(h)
        h = self.clf_conv(h)
        h = depth_to_space(h, cfg.patch_size)
        h = layer_norm(h)
        logits = self.out_proj(h)
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
