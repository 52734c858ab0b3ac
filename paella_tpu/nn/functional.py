"""Stateless functional ops shared across the framework.

All spatial tensors in this framework are NHWC (channels-last) — the native layout
for TPU convolutions — whereas the reference is NCHW with permutes around every
LayerNorm (reference: src/modules.py:22-27). In NHWC those permutes vanish.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def layer_norm(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """LayerNorm over the last axis with no learned affine.

    Every LayerNorm in the reference denoiser and codec is
    elementwise_affine=False, eps=1e-6 (reference: src/modules.py:47,69,124,128;
    src/vqgan.py:10,16), so the framework's layer norm is a pure function.
    Statistics are computed in float32 for bf16 inputs.
    """
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(dtype)


def gelu(x: jax.Array) -> jax.Array:
    """Exact (erf) GELU — torch nn.GELU's default, unlike jax.nn.gelu's tanh approx."""
    return jax.nn.gelu(x, approximate=False)


def silu(x: jax.Array) -> jax.Array:
    return jax.nn.silu(x)


def space_to_depth(x: jax.Array, r: int) -> jax.Array:
    """NHWC equivalent of torch.nn.PixelUnshuffle (reference: src/modules.py:131).

    Matches torch's channel ordering: out channel index = c*r^2 + i*r + j where
    (i, j) is the intra-patch offset. This ordering matters because a 1x1 conv
    consumes the result, so converted checkpoints depend on it.
    """
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (b, h/r, w/r, c, i, j)
    return x.reshape(b, h // r, w // r, c * r * r)


def depth_to_space(x: jax.Array, r: int) -> jax.Array:
    """NHWC equivalent of torch.nn.PixelShuffle (reference: src/modules.py:182).

    Inverse of :func:`space_to_depth`: input channel c*r^2 + i*r + j goes to
    spatial offset (i, j) of output channel c.
    """
    b, h, w, c = x.shape
    c_out = c // (r * r)
    x = x.reshape(b, h, w, c_out, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (b, h, i, w, j, c_out)
    return x.reshape(b, h * r, w * r, c_out)


def space_to_depth_pmajor(x: jax.Array, r: int) -> jax.Array:
    """space_to_depth with PATCH-MAJOR channel order: out channel
    (i*r + j)*c + ch — contiguous c-sized lane blocks per patch offset.

    Torch's c*r^2 + i*r + j order (space_to_depth) interleaves every lane,
    which makes the transpose shuffle-bound on TPU (traced: 40 us for a 4 MB
    move at the 1B sampler geometry vs ~12 us for the blocked move). Callers
    that consume the result with a learned matmul permute that weight's rows
    instead (see models/denoiser.py), keeping checkpoints in torch order.
    """
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (b, h/r, w/r, i, j, c)
    return x.reshape(b, h // r, w // r, c * r * r)


def depth_to_space_pmajor(x: jax.Array, r: int) -> jax.Array:
    """Inverse of :func:`space_to_depth_pmajor`: input channel (i*r+j)*c + ch
    goes to spatial offset (i, j) of output channel ch."""
    b, h, w, c = x.shape
    c_out = c // (r * r)
    x = x.reshape(b, h, w, r, r, c_out)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (b, h, i, w, j, c_out)
    return x.reshape(b, h * r, w * r, c_out)


def pmajor_permutation(c: int, r: int):
    """Index map from patch-major channel order to torch order:
    perm[(i*r + j)*c + ch] = ch*r^2 + (i*r + j). Used to permute the rows
    (inputs) or columns (outputs) of a weight that sits next to a
    space_to_depth_pmajor / depth_to_space_pmajor, so the math stays
    bit-equal to the torch-ordered checkpoint layout."""
    import numpy as np

    pq = np.arange(r * r)
    ch = np.arange(c)
    return (ch[None, :] * (r * r) + pq[:, None]).reshape(-1)


def replication_pad_2d(x: jax.Array, pad: int) -> jax.Array:
    """NHWC equivalent of torch.nn.ReplicationPad2d (reference: src/vqgan.py:12)."""
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")


def sinusoidal_embedding(r: jax.Array, dim: int, max_positions: int = 10000) -> jax.Array:
    """Timestep embedding (reference: src/modules.py:212-221).

    `r` in (0, 1] is scaled by max_positions; returns sin||cos of shape (B, dim).
    """
    import math

    r = r.astype(jnp.float32) * max_positions
    half_dim = dim // 2
    emb = math.log(max_positions) / (half_dim - 1)
    emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
    emb = r[:, None] * emb[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb
