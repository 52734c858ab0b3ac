"""VQGAN f4 codec: 256x256x3 image <-> 64x64 grid of discrete tokens.

TPU-first re-design of the reference codec (reference: src/vqgan.py:45-112): NHWC,
1x1 convs as Dense, PixelShuffle as reshape/transpose. Geometry (VQConfig defaults):
encoder = space_to_depth(2) + 1x1 -> ResBlock(192) -> stride-2 4x4 conv -> ResBlock(384)
-> 1x1 to 4ch + BatchNorm (src/vqgan.py:62-66) -> VectorQuantize(8192 x 4);
decoder = 1x1 -> 12 bottleneck ResBlocks + transposed 4x4 stride-2 -> ResBlock(192)
-> 1x1 + depth_to_space(2). Latents are divided by scale_factor=0.3764 on encode and
multiplied back on decode (src/vqgan.py:95,98).

The encoder ends in BatchNorm2d, so the module carries a `batch_stats` collection;
inference uses the (converted) running statistics.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import VQConfig
from ..nn import init as tinit
from ..nn.blocks import ConvTranspose2dTorch
from ..nn.functional import depth_to_space, gelu, layer_norm, replication_pad_2d, space_to_depth
from .quantize import VectorQuantize

Array = jax.Array


class VQResBlock(nn.Module):
    """Dual-branch residual block gated by 6 learned scalars (reference: src/vqgan.py:6-42).

    gammas are zero-initialized, making the block the identity at init. The
    depthwise branch uses replication (edge) padding.
    """

    c: int
    c_hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        g = self.param("gammas", tinit.zeros, (6,)).astype(jnp.float32)
        # branch 1: depthwise 3x3 over replication-padded, modulated input
        h = layer_norm(x) * (1 + g[0]) + g[1]
        h = replication_pad_2d(h, 1)
        h = nn.Conv(
            self.c,
            (3, 3),
            padding="VALID",
            feature_group_count=self.c,
            dtype=self.dtype,
            kernel_init=tinit.xavier_uniform(),
            bias_init=tinit.zeros,
            name="depthwise",
        )(h)
        x = x + h * g[2]
        # branch 2: channelwise MLP
        h = layer_norm(x) * (1 + g[3]) + g[4]
        h = nn.Dense(
            self.c_hidden,
            dtype=self.dtype,
            kernel_init=tinit.xavier_uniform(),
            bias_init=tinit.zeros,
            name="fc1",
        )(h)
        h = gelu(h)
        h = nn.Dense(
            self.c,
            dtype=self.dtype,
            kernel_init=tinit.xavier_uniform(),
            bias_init=tinit.zeros,
            name="fc2",
        )(h)
        return x + h * g[5]


class VQModel(nn.Module):
    """f4 codec (reference: src/vqgan.py:45-112). See module docstring.

    Methods (use via `model.apply(vars, ..., method=VQModel.encode)` or the
    convenience wrappers in paella_tpu.codec.api):
      encode(x)          -> (qe/scale, z/scale, indices, vq_loss + 0.25*commit)
      decode(z)          -> image from continuous (scaled) latents
      decode_indices(ix) -> image from token grid
      __call__(x)        -> (reconstruction, vq_loss), the autoencoder path
    """

    config: VQConfig

    def setup(self):
        cfg = self.config
        dtype = cfg.compute_dtype
        c_levels = [cfg.c_hidden // (2**i) for i in reversed(range(cfg.levels))]
        self.c_levels = c_levels
        conv_kw = dict(
            dtype=dtype,
            kernel_init=tinit.kaiming_uniform_leaky(),
        )

        # -- encoder --
        self.in_conv = nn.Dense(
            c_levels[0],
            dtype=dtype,
            kernel_init=tinit.kaiming_uniform_leaky(),
            bias_init=tinit.torch_default_bias(3 * 4),
            name="in_conv",
        )
        down_convs = []
        down_res = []
        for i in range(cfg.levels):
            down_convs.append(
                nn.Conv(
                    c_levels[i],
                    (4, 4),
                    strides=(2, 2),
                    padding=[(1, 1), (1, 1)],
                    bias_init=tinit.torch_default_bias(c_levels[i - 1] * 16),
                    name=f"down_conv_{i}",
                    **conv_kw,
                )
                if i > 0
                else None
            )
            down_res.append(VQResBlock(c_levels[i], c_levels[i] * 4, dtype=dtype, name=f"down_res_{i}"))
        self.down_convs = down_convs
        self.down_res = down_res
        self.to_latent = nn.Dense(
            cfg.c_latent,
            use_bias=False,
            dtype=dtype,
            kernel_init=tinit.kaiming_uniform_leaky(),
            name="to_latent",
        )
        # torch BatchNorm2d defaults: eps=1e-5, momentum=0.1 -> flax momentum 0.9
        self.latent_norm = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=jnp.float32, name="latent_norm")

        self.vquantizer = VectorQuantize(
            cfg.c_latent, cfg.codebook_size, impl=cfg.lookup_impl, name="vquantizer"
        )

        # -- decoder --
        self.from_latent = nn.Dense(
            c_levels[-1],
            dtype=dtype,
            kernel_init=tinit.kaiming_uniform_leaky(),
            bias_init=tinit.torch_default_bias(cfg.c_latent),
            name="from_latent",
        )
        up_res = []
        up_convs = []
        for i in range(cfg.levels):
            c = c_levels[cfg.levels - 1 - i]
            n_blocks = cfg.bottleneck_blocks if i == 0 else 1
            up_res.append(
                [VQResBlock(c, c * 4, dtype=dtype, name=f"up_res_{i}_{j}") for j in range(n_blocks)]
            )
            if i < cfg.levels - 1:
                up_convs.append(
                    ConvTranspose2dTorch(
                        c_levels[cfg.levels - 2 - i], (4, 4), (2, 2), padding=1, dtype=dtype, name=f"up_conv_{i}"
                    )
                )
            else:
                up_convs.append(None)
        self.up_res = up_res
        self.up_convs = up_convs
        self.out_conv = nn.Dense(
            3 * 4,
            dtype=dtype,
            kernel_init=tinit.kaiming_uniform_leaky(),
            bias_init=tinit.torch_default_bias(c_levels[0]),
            name="out_conv",
        )

    def encoder(self, x: Array, train: bool = False) -> Array:
        """Image (B,H,W,3) -> pre-quantization latents (B,H/f,W/f,c_latent)."""
        cfg = self.config
        h = space_to_depth(x.astype(cfg.compute_dtype), 2)
        h = self.in_conv(h)
        for i in range(cfg.levels):
            if self.down_convs[i] is not None:
                h = self.down_convs[i](h)
            h = self.down_res[i](h)
        h = self.to_latent(h)
        h = self.latent_norm(h, use_running_average=not train)
        return h

    def encode(self, x: Array, train: bool = False):
        """reference: src/vqgan.py:91-95. Returns (qe, z, indices, loss), with both
        qe and z divided by scale_factor."""
        z = self.encoder(x, train=train)
        qe, (vq_loss, commit_loss), indices = self.vquantizer.quantize(z)
        s = self.config.scale_factor
        return qe / s, z / s, indices, vq_loss + commit_loss * 0.25

    def decoder(self, z: Array) -> Array:
        cfg = self.config
        h = self.from_latent(z.astype(cfg.compute_dtype))
        for i in range(cfg.levels):
            for block in self.up_res[i]:
                h = block(h)
            if self.up_convs[i] is not None:
                h = self.up_convs[i](h)
        h = self.out_conv(h)
        return depth_to_space(h, 2)

    def decode(self, z: Array) -> Array:
        """Continuous (scaled) latents -> image (reference: src/vqgan.py:97-101)."""
        return self.decoder(z * self.config.scale_factor)

    def decode_indices(self, indices: Array) -> Array:
        """Token grid (B,h,w) int -> image (reference: src/vqgan.py:103-107).

        Note: idx2vq yields unscaled codebook vectors; the reference feeds them to
        up_blocks directly (no scale_factor multiply), replicated here.
        """
        z = self.vquantizer.idx2vq(indices)
        return self.decoder(z)

    def __call__(self, x: Array, train: bool = False) -> Tuple[Array, Array]:
        """Autoencode: fixes the reference's broken forward (src/vqgan.py:109-110
        calls encode with a nonexistent arg) per its evident intent."""
        qe, _, _, vq_loss = self.encode(x, train=train)
        return self.decode(qe), vq_loss


class Discriminator(nn.Module):
    """Patch discriminator for codec training (reference: src/vqgan.py:115-140).

    Spectral-normalized strided conv stack + instance norm + leaky ReLU, optional
    broadcast conditioning concat, sigmoid patch map. (The reference ships this but
    never trains the codec in-repo; provided for codec pretraining capability.)
    """

    c_in: int = 3
    c_cond: int = 0
    c_hidden: int = 512
    depth: int = 6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, cond: Optional[Array] = None, update_stats: bool = False) -> Array:
        d = max(self.depth - 3, 3)
        h = nn.SpectralNorm(
            nn.Conv(
                self.c_hidden // (2**d),
                (3, 3),
                strides=(2, 2),
                padding=[(1, 1), (1, 1)],
                dtype=self.dtype,
                kernel_init=tinit.kaiming_uniform_leaky(),
            ),
        )(x, update_stats=update_stats)
        h = nn.leaky_relu(h, 0.2)
        for i in range(self.depth - 1):
            c_out = self.c_hidden // (2 ** max(d - 1 - i, 0))
            h = nn.SpectralNorm(
                nn.Conv(
                    c_out,
                    (3, 3),
                    strides=(2, 2),
                    padding=[(1, 1), (1, 1)],
                    dtype=self.dtype,
                    kernel_init=tinit.kaiming_uniform_leaky(),
                ),
            )(h, update_stats=update_stats)
            # InstanceNorm: per-sample, per-channel spatial normalization
            mean = jnp.mean(h, axis=(1, 2), keepdims=True)
            var = jnp.var(h, axis=(1, 2), keepdims=True)
            h = (h - mean) * jax.lax.rsqrt(var + 1e-5)
            h = nn.leaky_relu(h, 0.2)
        if cond is not None:
            cond_map = jnp.broadcast_to(
                cond[:, None, None, :], (h.shape[0], h.shape[1], h.shape[2], cond.shape[-1])
            )
            h = jnp.concatenate([h, cond_map], axis=-1)
        h = nn.Dense(1, dtype=self.dtype, kernel_init=tinit.kaiming_uniform_leaky(), name="shuffle")(h)
        return jax.nn.sigmoid(h)
