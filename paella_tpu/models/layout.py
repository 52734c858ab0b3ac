"""Even/odd-split channel layout for UNet skip levels (inference-only).

The up-path's first repetition at every level i < n-1 concatenates the UNet
skip before its grouped depthwise conv (reference: src/modules.py:56-57); the
fused kernel needs that concat deinterleaved into even/odd channel planes — a
shuffle-bound strided lane gather traced at ~106 us/step (up-0) + ~28 us
(up-1) at the 1B geometry. Keeping a level's activations in the split layout

    E(v) = [v_even || v_odd]        (channel permutation, even-then-odd)

turns those planes into contiguous half-slice concats (measured on-chip A/B:
+125 us/block at 32x32x640, +41 at 16x16x1280 — scripts/ab_skip_layout.py),
and costs nothing anywhere else: every op at a level (depthwise conv,
LayerNorm, channelwise MLP, GRN, FiLM, joint attention) is
channel-permutation-equivariant, so the layout exists purely as a WEIGHT
permutation applied once by `split_skip_params` — checkpoints stay
reference-ordered, the model code is unchanged except the skip blocks' plane
construction (gated by PaellaConfig.split_skip_levels).

Weight rules per split level i (E over c = c_hidden[i]):
- producers INTO the level: embedding_conv columns+bias (i=0) /
  down_{i}_downsample kernel output axis+bias (i>0); up_{i+1}_upsample kernel
  output axis+bias
- consumers OF the level: clf_conv rows (i=0) / up_{i}_upsample kernel input
  axis (i>0); down_{i+1}_downsample kernel input axis
- C/F blocks (non-skip): depthwise kernel/bias channel axis E, fc1 kernel
  rows E, fc2 kernel columns (+bias, +int8 kernel_scale) E (the 4C hidden
  axis and GRN params are internal — untouched)
- the up-i SKIP block: ONLY fc2 columns/bias/scale E — its depthwise planes
  and fc1 input stay in the standard internal order because the plane VALUES
  are identical either way (E's halves ARE the even/odd planes)
- T blocks: mapper columns [E || E+c] (FiLM acts on the E output)
- A blocks: kv_mapper columns+bias E (cond tokens join the pixel-token
  space), attention q/k/v kernel ROWS E (input side only — head structure is
  downstream of the projection and stays standard), o kernel columns+bias E

The denoiser's logits come out in the STANDARD space (only summation order
inside dots changes); parity is pinned by test_layout.py.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import flax
import jax
import jax.numpy as jnp


def even_odd_perm(c: int) -> np.ndarray:
    return np.concatenate([np.arange(0, c, 2), np.arange(1, c, 2)])


def inverse_perm(perm: np.ndarray) -> np.ndarray:
    return np.argsort(perm)


def default_split_levels(cfg) -> Tuple[int, ...]:
    """All levels with a skip block (i < n-1) whose channels satisfy the
    fused kernel's tile alignment (the split skip block MUST fuse)."""
    n = len(cfg.c_hidden)
    return tuple(
        i
        for i in range(n - 1)
        if cfg.c_hidden[i] % 128 == 0 and (4 * cfg.c_hidden[i]) % 512 == 0
    )


def _permute(params, cfg, levels: Sequence[int], invert: bool):
    n = len(cfg.c_hidden)
    flat = flax.traverse_util.flatten_dict(flax.core.unfreeze(params))
    out = dict(flat)

    for i in levels:
        if not 0 <= i < n - 1:
            raise ValueError(f"level {i}: only levels 0..{n - 2} have skip blocks")
        c = cfg.c_hidden[i]
        perm = even_odd_perm(c)
        if invert:
            perm = inverse_perm(perm)
        E = jnp.asarray(perm)
        E2 = jnp.concatenate([E, E + c])  # T-mapper [a || b] halves

        def take(path, axis, p=None):
            if path in out:
                out[path] = jnp.take(out[path], E if p is None else p, axis=axis)

        def c_block(prefix: tuple, stacked: bool, skip_block: bool):
            o = 1 if stacked else 0  # leading rep axis on scanned weights
            if not skip_block:
                take(prefix + ("depthwise", "kernel"), 3 + o)
                take(prefix + ("depthwise", "bias"), 0 + o)
                take(prefix + ("channelwise", "fc1", "kernel"), 0 + o)
            take(prefix + ("channelwise", "fc2", "kernel"), 1 + o)
            take(prefix + ("channelwise", "fc2", "bias"), 0 + o)
            take(prefix + ("channelwise", "fc2", "kernel_scale"), 0 + o)

        def t_block(prefix: tuple, stacked: bool):
            o = 1 if stacked else 0
            take(prefix + ("mapper", "kernel"), 1 + o, p=E2)
            take(prefix + ("mapper", "bias"), 0 + o, p=E2)

        def a_block(prefix: tuple, stacked: bool):
            o = 1 if stacked else 0
            take(prefix + ("kv_mapper", "kernel"), 1 + o)
            take(prefix + ("kv_mapper", "bias"), 0 + o)
            for proj in ("q", "k", "v"):
                take(prefix + ("attention", proj, "kernel"), 0 + o)
            take(prefix + ("attention", "o", "kernel"), 1 + o)
            take(prefix + ("attention", "o", "bias"), 0 + o)

        # level boundary ops
        if i == 0:
            take(("embedding_conv", "kernel"), 1)
            take(("embedding_conv", "bias"), 0)
            take(("clf_conv", "kernel"), 0)
        else:
            take((f"down_{i}_downsample", "conv", "kernel"), 3)  # producer out
            take((f"down_{i}_downsample", "conv", "bias"), 0)
            take((f"up_{i}_upsample", "conv", "kernel"), 2)  # consumer in
        take((f"down_{i + 1}_downsample", "conv", "kernel"), 2)  # consumer in
        take((f"up_{i + 1}_upsample", "conv", "kernel"), 3)  # producer out
        take((f"up_{i + 1}_upsample", "conv", "bias"), 0)

        pattern = cfg.level_config[i]
        for prefix in ("down", "up"):
            for k, bt in enumerate(pattern):
                name = (f"{prefix}_{i}_0_{k}_{bt}",)
                if bt in ("C", "F"):
                    # up-i's k=0 C block consumes the UNet skip (partial rules)
                    c_block(name, stacked=False,
                            skip_block=(prefix == "up" and k == 0 and bt == "C"))
                elif bt == "T":
                    t_block(name, stacked=False)
                elif bt == "A":
                    a_block(name, stacked=False)
            rest = f"{prefix}_{i}_rest"
            for k, bt in enumerate(pattern):
                sub = (rest, f"{k}_{bt}")
                if bt in ("C", "F"):
                    c_block(sub, stacked=True, skip_block=False)
                elif bt == "T":
                    t_block(sub, stacked=True)
                elif bt == "A":
                    a_block(sub, stacked=True)

    return flax.traverse_util.unflatten_dict(out)


def split_skip_params(params, cfg, levels: Optional[Sequence[int]] = None):
    """Checkpoint-ordered params -> even/odd-split layout on `levels`
    (default: every fuse-eligible skip level). Use with
    PaellaConfig(split_skip_levels=<same levels>, fused_blocks=True)."""
    levels = default_split_levels(cfg) if levels is None else tuple(levels)
    return _permute(params, cfg, levels, invert=False)


def merge_skip_params(params, cfg, levels: Optional[Sequence[int]] = None):
    """Inverse of split_skip_params (for checkpoint export)."""
    levels = default_split_levels(cfg) if levels is None else tuple(levels)
    return _permute(params, cfg, levels, invert=True)
