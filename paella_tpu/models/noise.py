"""Forward noising process and loss weighting for token-space diffusion.

Pure functions with explicit PRNG keys — the functional JAX equivalent of the
reference's stateful-RNG methods Paella.add_noise (reference: src/modules.py:277-283)
and Paella.get_loss_weight (reference: src_distributed/modules.py:283-284).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def add_noise(
    key: Array,
    x: Array,
    t: Array,
    num_labels: int,
    mask: Optional[Array] = None,
    random_x: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """Replace a Bernoulli(t) fraction of tokens with uniform-random codebook ids.

    x: (B, H, W) int tokens; t: (B,) noise level. Returns (noised, mask) where
    mask==1 marks replaced positions. Callers may pin `mask` and/or `random_x`
    (the sampler passes random_x=init_noise so renoising converges,
    reference: src_distributed/utils.py:125).
    """
    k_mask, k_rand = jax.random.split(key)
    if mask is None:
        u = jax.random.uniform(k_mask, x.shape, jnp.float32)
        mask = (u <= t.reshape(t.shape + (1,) * (x.ndim - t.ndim))).astype(jnp.int32)
    if random_x is None:
        random_x = jax.random.randint(k_rand, x.shape, 0, num_labels, x.dtype)
    noised = x * (1 - mask) + random_x * mask
    return noised, mask


def get_loss_weight(t: Array, mask: Array, min_val: float = 0.3) -> Array:
    """Down-weight un-noised tokens as t -> 0 (reference: src_distributed/modules.py:283-284).

    weight = 1 - (1 - mask) * (1 - t) * (1 - min_val): noised positions get 1.0,
    clean positions decay toward min_val at low noise levels.
    """
    t_b = t.reshape(t.shape + (1,) * (mask.ndim - t.ndim))
    return 1.0 - (1.0 - mask.astype(jnp.float32)) * ((1.0 - t_b) * (1.0 - min_val))
