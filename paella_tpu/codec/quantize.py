"""Vector quantization for the f4 codec.

The reference imports VectorQuantize from the external `pabloppp/pytorch-tools`
package (reference: src/vqgan.py:3, requirements.txt:12; called at src/vqgan.py:94,104).
This framework implements it natively: nearest-neighbor codebook lookup with a
straight-through gradient estimator, plus `idx2vq` for decoding token grids.

TPU notes: distances are computed as |z|^2 - 2 z.E^T + |E|^2 — the z.E^T term is a
single (B*h*w, c) x (c, K) matmul on the MXU; argmin runs on the VPU. For Paella's
geometry (4096 positions x 8192 codes x 4 dims) this is bandwidth-trivial.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


def codebook_lookup(z: Array, codebook: Array) -> Array:
    """Nearest-neighbor indices of z (..., c) in codebook (K, c)."""
    flat = z.reshape(-1, z.shape[-1]).astype(jnp.float32)
    cb = codebook.astype(jnp.float32)
    # |z - e|^2 = |z|^2 - 2 z.e + |e|^2 ; |z|^2 is constant over codes -> dropped
    dots = jnp.dot(flat, cb.T, preferred_element_type=jnp.float32)
    dists = jnp.sum(cb * cb, axis=-1)[None, :] - 2.0 * dots
    idx = jnp.argmin(dists, axis=-1)
    return idx.reshape(z.shape[:-1])


class VectorQuantize(nn.Module):
    """Codebook of K entries of dim c, channels-last.

    quantize(z) returns (z_q straight-through, (vq_loss, commit_loss), indices),
    matching the tuple shape of the external torchtools quantizer the reference
    calls (src/vqgan.py:94). idx2vq embeds indices back to latents (src/vqgan.py:104).

    impl="pallas" routes the nearest-neighbor search through the fused VMEM
    kernel (kernels/quantize.py) — the (tokens, K) distance matrix never
    touches HBM.
    """

    c: int
    k: int
    impl: str = "xla"

    def setup(self):
        self.codebook = self.param(
            "codebook",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -1.0 / self.k, 1.0 / self.k),
            (self.k, self.c),
        )

    def _lookup(self, z: Array) -> Array:
        if self.impl == "pallas":
            from ..kernels.quantize import fused_codebook_lookup

            return fused_codebook_lookup(z, self.codebook)
        return codebook_lookup(z, self.codebook)

    def quantize(self, z: Array) -> Tuple[Array, Tuple[Array, Array], Array]:
        idx = self._lookup(z)
        z_q = jnp.take(self.codebook, idx, axis=0).astype(z.dtype)
        vq_loss = jnp.mean(jnp.square(jax.lax.stop_gradient(z) - z_q))
        commit_loss = jnp.mean(jnp.square(z - jax.lax.stop_gradient(z_q)))
        z_q_st = z + jax.lax.stop_gradient(z_q - z)  # straight-through estimator
        return z_q_st, (vq_loss, commit_loss), idx

    def idx2vq(self, idx: Array) -> Array:
        return jnp.take(self.codebook, idx, axis=0)

    def __call__(self, z: Array):
        return self.quantize(z)
