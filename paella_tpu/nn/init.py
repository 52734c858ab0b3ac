"""Torch-compatible weight initializers.

The reference model's training stability and checkpoint parity depend on its exact
initialization scheme (reference: src/modules.py:189-210). PyTorch and JAX disagree on
fan computation for some layouts, so we provide initializers that reproduce PyTorch
semantics on JAX-layout kernels:

- Dense kernels are (in, out)        [torch Linear weight is (out, in)]
- Conv kernels are (kh, kw, in/groups, out)   [torch is (out, in/groups, kh, kw)]
- ConvTranspose kernels are (kh, kw, in, out) [torch is (in, out/groups, kh, kw)]

For Linear/Conv, torch computes fan_in = in/groups * receptive_field and
fan_out = out * receptive_field, identical to JAX's convention on these layouts.
For ConvTranspose, torch swaps the roles (fan_in uses the *output* channel count),
which we replicate in :func:`kaiming_uniform_leaky_transpose`.
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp


def _fan_in_out(shape: Sequence[int]) -> tuple[int, int]:
    """Fan for JAX-layout kernels: (..., in, out) with leading spatial dims."""
    if len(shape) < 2:
        raise ValueError(f"need >=2D shape, got {shape}")
    receptive = 1
    for s in shape[:-2]:
        receptive *= s
    return shape[-2] * receptive, shape[-1] * receptive


def xavier_uniform(gain: float = 1.0):
    """torch.nn.init.xavier_uniform_ with gain (reference: src/modules.py:194,208)."""

    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = _fan_in_out(shape)
        bound = gain * math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def packed_qkv_xavier_uniform():
    """Init for one of q/k/v kernels (c, c) as if part of torch MHA's packed
    in_proj_weight of shape (3c, c): bound = sqrt(6 / (c + 3c)).

    torch.nn.MultiheadAttention xavier-inits the packed matrix jointly, so the
    per-projection bound differs from a standalone xavier by sqrt(2).
    """

    def init(key, shape, dtype=jnp.float32):
        c_in, c_out = shape
        bound = math.sqrt(6.0 / (c_in + 3 * c_in))
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def kaiming_uniform_leaky(a: float = math.sqrt(5.0)):
    """torch's default Linear/Conv init: kaiming_uniform_(a=sqrt(5)) == U(+-1/sqrt(fan_in))."""

    def init(key, shape, dtype=jnp.float32):
        fan_in, _ = _fan_in_out(shape)
        gain = math.sqrt(2.0 / (1.0 + a * a))
        bound = gain * math.sqrt(3.0 / fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def kaiming_uniform_leaky_transpose(a: float = math.sqrt(5.0)):
    """torch's default ConvTranspose init on a (kh, kw, in, out) kernel.

    torch stores transpose kernels as (in, out, kh, kw) and its fan helper reads
    dim 1 as the "input" fan, so fan_in = out * kh * kw.
    """

    def init(key, shape, dtype=jnp.float32):
        receptive = 1
        for s in shape[:-2]:
            receptive *= s
        fan_in = shape[-1] * receptive  # torch reads the OUT channels here
        gain = math.sqrt(2.0 / (1.0 + a * a))
        bound = gain * math.sqrt(3.0 / fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_default_bias(fan_in: int):
    """torch Linear/Conv default bias init: U(+-1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def normal(std: float):
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)

    return init


def scaled(base_init, scale: float):
    """Post-scale another initializer (reference: src/modules.py:199-202 scales the
    last channelwise kernel by sqrt(1/sum(blocks)) after xavier init)."""

    def init(key, shape, dtype=jnp.float32):
        return base_init(key, shape, dtype) * scale

    return init


zeros = jax.nn.initializers.zeros
ones = jax.nn.initializers.ones
