"""Weight-only int8 quantization for inference (VERDICT r1 #10).

Per-output-channel symmetric int8 on the scan-stacked channelwise MLP kernels
(fc1/fc2) — the dominant per-repetition weight traffic (26 of 45 MB at the 1B
level-1 geometry). The fused ResBlock kernel streams the int8 tiles and
applies the scales to its matmul outputs: x @ (Wq * s) == (x @ Wq) * s, so
the only approximation is the rounding of W itself (per-channel, <=0.4%
relative — pinned against bf16 by tests/test_quant.py).

Quantized trees are only valid with PaellaConfig.fused_blocks=True: the XLA
Dense path would consume the raw int8 codes without scales (the denoiser
raises if it sees int8 kernels outside the fused path).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def quantize_dense_int8(kernel: Array) -> Tuple[Array, Array]:
    """(..., in, out) kernel -> (int8 codes, (..., out) f32 scales)."""
    amax = jnp.max(jnp.abs(kernel.astype(jnp.float32)), axis=-2)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.round(kernel.astype(jnp.float32) / scale[..., None, :])
    return q.astype(jnp.int8), scale.astype(jnp.float32)


def dequantize_dense_int8(q: Array, scale: Array, dtype=jnp.float32) -> Array:
    return (q.astype(jnp.float32) * scale[..., None, :]).astype(dtype)


def quantize_paella_int8(
    params, levels: Sequence[int] = (1, 2), include_first: bool = False
):
    """int8-quantize the scan-stacked channelwise fc1/fc2 kernels of the given
    UNet levels (the repetitions the fused kernel executes; level 0 stays on
    the XLA path at 256^2 and keeps bf16 weights). Returns a NEW params tree
    where those 'kernel' leaves are int8 with 'kernel_scale' siblings.

    include_first=True also quantizes each level's FIRST repetition (the
    {down,up}_{i}_0_{k}_C blocks, incl. the skip-concat ones) — valid only
    when those blocks run the fused kernel path (fused_blocks=True and
    fuse-eligible shapes): the XLA ResBlock path has no meaning for the codes.
    """
    import re

    import flax

    flat = flax.traverse_util.flatten_dict(flax.core.unfreeze(params))
    out = dict(flat)
    stems = tuple(f"{d}_{i}_rest" for d in ("down", "up") for i in levels)
    first_re = re.compile(
        r"^(down|up)_(" + "|".join(str(i) for i in levels) + r")_0_\d+_C$"
    )
    for path, leaf in flat.items():
        if (
            len(path) >= 4
            and path[-3] == "channelwise"
            and path[-2] in ("fc1", "fc2")
            and path[-1] == "kernel"
            and (
                path[0] in stems
                or (include_first and first_re.match(path[0]))
            )
        ):
            q, s = quantize_dense_int8(leaf)
            out[path] = q
            out[path[:-1] + ("kernel_scale",)] = s
    return flax.traverse_util.unflatten_dict(out)
