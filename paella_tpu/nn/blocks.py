"""Denoiser building blocks (NHWC, channels-last).

Re-designs of the reference blocks (reference: src/modules.py:7-106) for TPU:
- NHWC layout end-to-end: the reference's permute-wrapped LayerNorms
  (src/modules.py:22-27, 60-61) become plain last-axis ops.
- "1x1 conv" degenerates to Dense on NHWC; XLA lowers both to the same MXU matmul.
- All LayerNorms in the reference are affine-free, so they are pure functions here.

Initialization replicates the reference scheme exactly (src/modules.py:189-210):
xavier-uniform for conv/linear with zero bias, special-cased layers take explicit
kernel_init arguments at the model level.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from . import init as tinit
from .attention import MultiheadAttention
from .functional import gelu, layer_norm, silu

Array = jax.Array


class GlobalResponseNorm(nn.Module):
    """ConvNeXt-V2 GRN (reference: src/modules.py:30-40).

    gamma/beta are stored as (dim,); the torch checkpoint shape (1,1,1,dim) is
    squeezed by the converter.
    """

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        gamma = self.param("gamma", tinit.zeros, (self.dim,))
        beta = self.param("beta", tinit.zeros, (self.dim,))
        x32 = x.astype(jnp.float32)
        gx = jnp.sqrt(jnp.sum(x32 * x32, axis=(1, 2), keepdims=True))
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
        out = gamma * (x32 * nx) + beta + x32
        return out.astype(x.dtype)


class ChannelwiseMLP(nn.Module):
    """The c -> 4c -> c MLP shared by ResBlock and FeedForwardBlock
    (reference: src/modules.py:48-54, 86-92). `out_init_scale` reproduces the
    sqrt(1/sum(blocks)) rescale of the final kernel (src/modules.py:199-202)."""

    c: int
    dropout: float = 0.0
    out_init_scale: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        x = nn.Dense(
            self.c * 4,
            dtype=self.dtype,
            kernel_init=tinit.xavier_uniform(),
            bias_init=tinit.zeros,
            name="fc1",
        )(x)
        x = gelu(x)
        x = GlobalResponseNorm(self.c * 4, dtype=self.dtype, name="grn")(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.Dense(
            self.c,
            dtype=self.dtype,
            kernel_init=tinit.scaled(tinit.xavier_uniform(), self.out_init_scale),
            bias_init=tinit.zeros,
            name="fc2",
        )(x)
        return x


class GroupedDepthwiseConv(nn.Module):
    """Grouped conv with `features` groups over (features * cpg) input channels,
    computed as cpg TRUE depthwise convs summed.

    XLA's TPU conv emitter has a fast path for 1-channel-per-group depthwise
    convs but falls off it for 2+ channels per group: profiling the 1B sampler
    showed the two skip-concat grouped convs costing 3.7 ms + 1.85 ms PER STEP
    (~28% of the whole UNet). Slicing group-major channel j of the input against
    kernel plane j turns each into a fast depthwise conv; the sum is bit-for-bit
    the same grouped convolution. Param layout matches nn.Conv's
    (kh, kw, cpg, features), so converted checkpoints are unaffected.
    """

    features: int
    kernel_size: Tuple[int, int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from ..parallel.mesh import constrain_batch

        kh, kw = self.kernel_size
        cpg = x.shape[-1] // self.features
        kernel = self.param("kernel", tinit.xavier_uniform(), (kh, kw, cpg, self.features))
        bias = self.param("bias", tinit.zeros, (self.features,))
        k = kernel.astype(self.dtype)
        pad = [(kh // 2, kh // 2), (kw // 2, kw // 2)]
        # GSPMD mis-propagates channel shardings through channel re-slicing
        # (observed: 'involuntary full rematerialization' under fsdp); pin
        # batch-only sharding and split the groups via reshape+index rather
        # than a strided gather, which SPMD cannot shard.
        x = constrain_batch(x)
        b, hh, ww, _ = x.shape
        if cpg == 1 and (kh, kw) == (3, 3):
            # pure depthwise: 9 shifted multiply-adds (elementwise; XLA fuses
            # them and keeps a standard layout). The conv emitter's output
            # layout otherwise forces the following fc1 matmul onto a
            # transposed operand (traced at 35% MFU on the level-0 blocks).
            xq = x.astype(self.dtype)
            xp = jnp.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)))
            out = jnp.zeros_like(xq)
            for ky in range(3):
                for kx in range(3):
                    out = out + xp[:, ky : ky + hh, kx : kx + ww, :] * k[ky, kx, 0, :]
            return constrain_batch(out) + bias.astype(self.dtype)
        xg = x.reshape(b, hh, ww, self.features, cpg)
        out = None
        for j in range(cpg):
            conv = jax.lax.conv_general_dilated(
                constrain_batch(xg[..., j]).astype(self.dtype),
                k[:, :, j : j + 1, :],
                (1, 1),
                pad,
                feature_group_count=self.features,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            out = conv if out is None else out + conv
        out = constrain_batch(out)
        return out + bias.astype(self.dtype)


class _DenseParams(nn.Module):
    """Declares nn.Dense's exact param tree without computing — the fused
    ResBlock kernel consumes raw kernels (checkpoint-compatible paths).

    Returns (kernel, bias, scale): scale is the per-out-channel f32 scale a
    quantized tree (quant.quantize_paella_int8 include_first=True) stores as
    a 'kernel_scale' sibling, or None on float trees (never created at init)."""

    in_features: int
    features: int
    kernel_init: Any = None

    @nn.compact
    def __call__(self):
        k = self.param("kernel", self.kernel_init, (self.in_features, self.features))
        b = self.param("bias", tinit.zeros, (self.features,))
        s = (
            self.get_variable("params", "kernel_scale")
            if self.has_variable("params", "kernel_scale")
            else None
        )
        return k, b, s


class _GRNParams(nn.Module):
    dim: int

    @nn.compact
    def __call__(self):
        return (
            self.param("gamma", tinit.zeros, (self.dim,)),
            self.param("beta", tinit.zeros, (self.dim,)),
        )


class _ChannelwiseParams(nn.Module):
    """Mirrors ChannelwiseMLP's param tree (fc1 / grn / fc2)."""

    c: int
    out_init_scale: float = 1.0

    @nn.compact
    def __call__(self):
        fc1 = _DenseParams(self.c, self.c * 4, tinit.xavier_uniform(), name="fc1")()
        grn = _GRNParams(self.c * 4, name="grn")()
        fc2 = _DenseParams(
            self.c * 4,
            self.c,
            tinit.scaled(tinit.xavier_uniform(), self.out_init_scale),
            name="fc2",
        )()
        return fc1, grn, fc2


class FusedResBlock(nn.Module):
    """ResBlock evaluated by the fused Pallas kernel (kernels/resblock.py),
    optionally absorbing the following TimestepBlock's FiLM. Parameter tree is
    IDENTICAL to ResBlock's (same names, shapes, inits), so checkpoints and
    init_params are interchangeable between the fused and unfused paths.

    c_skip=c supports the UNet skip-concat first repetitions (the kernel
    deinterleaves the grouped-conv channel pairs; see fused_resblock_stacked).

    Inference-only (the kernel has no VJP); training uses ResBlock.
    """

    c: int
    c_skip: int = 0
    kernel_size: int = 3
    out_init_scale: float = 1.0
    dtype: jnp.dtype = jnp.float32
    act_quant: bool = False
    # x and x_skip arrive in the even/odd-SPLIT channel layout
    # (models/layout.py): depthwise planes are contiguous half-slices, and
    # this module's weights must be layout.split_level0_params-transformed
    split_planes: bool = False

    @nn.compact
    def __call__(
        self,
        x: Array,
        film_ab: Optional[Array] = None,
        x_skip: Optional[Array] = None,
    ) -> Array:
        from ..kernels.resblock import fuse_mode, fused_resblock

        kh = self.kernel_size
        cpg = (self.c + self.c_skip) // self.c
        assert self.c_skip in (0, self.c), self.c_skip  # callers gate on this
        assert (x_skip is not None) == (self.c_skip > 0)
        dwp = _DWParams(self.c, (kh, kh), cpg=cpg, name="depthwise")()
        fc1, grn, fc2 = _ChannelwiseParams(
            self.c, self.out_init_scale, name="channelwise"
        )()
        mode = fuse_mode(
            x.shape, self.dtype, self.c, kh, with_skip=cpg == 2,
            # float kernels stream cast to the activation dtype; only int8
            # really changes the tile bytes
            weight_itemsize=1 if fc1[0].dtype == jnp.int8 else None,
        )
        assert mode is not None, (x.shape, self.c)  # callers gate on fuse_mode
        # W8A8 engages only when the tree carries quantized fc kernels
        act_q = self.act_quant and fc1[2] is not None and fc2[2] is not None
        beta_w2 = None
        if act_q:
            beta_w2 = (
                jnp.einsum(
                    "k,kn->n", grn[1].astype(jnp.float32), fc2[0].astype(jnp.float32)
                )
                * fc2[2]
            )[None, :]
        skip = None if x_skip is None else x_skip.astype(self.dtype)
        dw_planes = None
        if self.split_planes and skip is not None:
            # split layout: E(v) = [v_even || v_odd], so the depthwise planes
            # [x_even || skip_even] / [x_odd || skip_odd] are half-slice
            # concats — no strided lane gather (models/layout.py)
            h2 = self.c // 2
            xe = x.astype(self.dtype)
            dw_planes = (
                jnp.concatenate([xe[..., :h2], skip[..., :h2]], axis=-1),
                jnp.concatenate([xe[..., h2:], skip[..., h2:]], axis=-1),
            )
            skip = None
        return fused_resblock(
            x.astype(self.dtype),
            dwp[0], dwp[1],
            fc1[0], fc1[1],
            grn[0], grn[1],
            fc2[0], fc2[1],
            film_ab=None if film_ab is None else film_ab.astype(self.dtype),
            fc1_scale=fc1[2],
            fc2_scale=fc2[2],
            act_quant=act_q,
            beta_w2=beta_w2,
            batch_grid=mode == "batch",
            skip=skip,
            dw_planes=dw_planes,
        )


class _DWParams(nn.Module):
    """Mirrors GroupedDepthwiseConv's param tree (cpg channels per group)."""

    features: int
    kernel_size: Tuple[int, int]
    cpg: int = 1

    @nn.compact
    def __call__(self):
        kh, kw = self.kernel_size
        k = self.param("kernel", tinit.xavier_uniform(), (kh, kw, self.cpg, self.features))
        b = self.param("bias", tinit.zeros, (self.features,))
        return k, b


class ResBlock(nn.Module):
    """Depthwise conv + channelwise MLP residual block (reference: src/modules.py:43-62).

    When a skip tensor is given it is channel-concatenated BEFORE the depthwise
    conv, whose feature_group_count=c splits the (c + c_skip) input channels into
    c contiguous groups — identical semantics to torch's grouped Conv2d, which the
    converted checkpoints rely on.
    """

    c: int
    c_skip: int = 0
    kernel_size: int = 3
    dropout: float = 0.0
    out_init_scale: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, x_skip: Optional[Array] = None, deterministic: bool = True) -> Array:
        x_res = x
        if x_skip is not None:
            x = jnp.concatenate([x, x_skip.astype(x.dtype)], axis=-1)
        x = GroupedDepthwiseConv(
            self.c,
            (self.kernel_size, self.kernel_size),
            dtype=self.dtype,
            name="depthwise",
        )(x)
        x = layer_norm(x)
        x = ChannelwiseMLP(
            self.c,
            dropout=self.dropout,
            out_init_scale=self.out_init_scale,
            dtype=self.dtype,
            name="channelwise",
        )(x, deterministic=deterministic)
        return x + x_res


class FeedForwardBlock(nn.Module):
    """LN + channelwise MLP residual (reference: src/modules.py:82-96)."""

    c: int
    dropout: float = 0.0
    out_init_scale: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        h = layer_norm(x)
        h = ChannelwiseMLP(
            self.c,
            dropout=self.dropout,
            out_init_scale=self.out_init_scale,
            dtype=self.dtype,
            name="channelwise",
        )(h, deterministic=deterministic)
        return x + h


class AttnBlock(nn.Module):
    """Joint self+cross attention over the spatial map (reference: src/modules.py:65-79).

    With self_attn=True the (normed) pixel tokens are concatenated in front of the
    mapped conditioning tokens and a single attention call performs self- and
    cross-attention jointly (reference: src/modules.py:15-17).

    cond_mask (B, S_cond) masks padded/absent conditioning tokens — this is how a
    CFG cond/uncond pair with different conditioning sets runs as one batch.
    cond_reweight multiplies post-softmax attention toward chosen conditioning
    tokens (the structural-editing hook, reference: utils/alter_attention.py:23-34).
    """

    c: int
    c_cond: int
    nhead: int
    self_attn: bool = True
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    attention_impl: str = "xla"  # "xla" | "pallas"

    @nn.compact
    def __call__(
        self,
        x: Array,
        cond: Array,
        cond_mask: Optional[Array] = None,
        cond_reweight: Optional[Array] = None,
        deterministic: bool = True,
    ) -> Array:
        b, h, w, c = x.shape
        kv = nn.Dense(
            self.c,
            dtype=self.dtype,
            kernel_init=tinit.xavier_uniform(),
            bias_init=tinit.zeros,
            name="kv_mapper",
        )(silu(cond))

        tokens = layer_norm(x).reshape(b, h * w, c)
        n_pix = h * w
        if self.self_attn:
            kv_full = jnp.concatenate([tokens, kv], axis=1)
            kv_mask = None
            if cond_mask is not None:
                pix_mask = jnp.ones((b, n_pix), dtype=bool)
                kv_mask = jnp.concatenate([pix_mask, cond_mask], axis=1)
        else:
            kv_full = kv
            kv_mask = cond_mask

        reweight = None
        if cond_reweight is not None:
            cw = jnp.broadcast_to(cond_reweight, (b, kv.shape[1]))
            pix_w = jnp.ones((b, n_pix if self.self_attn else 0), dtype=cw.dtype)
            reweight = jnp.concatenate([pix_w, cw], axis=-1)[:, None, None, :]

        if self.attention_impl == "pallas":
            from ..kernels.attention import fused_attention

            attention_fn = fused_attention
        else:
            from .attention import dot_product_attention

            attention_fn = dot_product_attention
        attn_out = MultiheadAttention(
            self.c,
            self.nhead,
            dropout=self.dropout,
            dtype=self.dtype,
            attention_fn=attention_fn,
            name="attention",
        )(tokens, kv_full, kv_mask=kv_mask, reweight=reweight, deterministic=deterministic)
        return x + attn_out.reshape(b, h, w, c)


class TimestepBlock(nn.Module):
    """FiLM modulation by the timestep embedding (reference: src/modules.py:99-106).

    Zero-initialized (src/modules.py:203-204) so it is the identity at init.
    """

    c: int
    c_timestep: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, t_embed: Array, return_ab: bool = False) -> Array:
        ab = nn.Dense(
            self.c * 2,
            dtype=self.dtype,
            kernel_init=tinit.zeros,
            bias_init=tinit.zeros,
            name="mapper",
        )(t_embed)
        if return_ab:
            # (B, 2c) [a | b] for the fused ResBlock kernel's FiLM epilogue
            return ab
        a, b = jnp.split(ab[:, None, None, :], 2, axis=-1)
        return x * (1 + a) + b


class ConvTranspose2dTorch(nn.Module):
    """ConvTranspose2d with torch-exact semantics and default init.

    The reference's upsamplers are ConvTranspose2d (src/modules.py:174,
    src/vqgan.py:83), which Paella._init_weights does NOT re-initialize (it only
    matches nn.Conv2d/nn.Linear), so they keep torch's kaiming-uniform default —
    replicated by kaiming_uniform_leaky_transpose. Kernel stored as (kh, kw, in, out).
    """

    features: int
    kernel_size: tuple[int, int]
    strides: tuple[int, int]
    padding: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kh, kw = self.kernel_size
        c_in = x.shape[-1]
        kernel = self.param(
            "kernel",
            tinit.kaiming_uniform_leaky_transpose(),
            (kh, kw, c_in, self.features),
        )
        fan_in = self.features * kh * kw  # torch's fan for transpose kernels
        bias = self.param("bias", tinit.torch_default_bias(fan_in), (self.features,))
        # transposed conv == conv over the lhs-dilated input with a flipped kernel
        k = jnp.flip(kernel, axis=(0, 1)).astype(self.dtype)
        pad_h = kh - 1 - self.padding
        pad_w = kw - 1 - self.padding
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            k,
            window_strides=(1, 1),
            padding=[(pad_h, pad_h), (pad_w, pad_w)],
            lhs_dilation=self.strides,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(self.dtype)


class _Conv2dParams(nn.Module):
    """Declares a conv's (kernel, bias) param pair without computing — the
    resampling modules below evaluate the conv as a dot_general instead."""

    kernel_shape: Tuple[int, int, int, int]  # (kh, kw, c_in, c_out)
    kernel_init: Any
    bias_init: Any

    @nn.compact
    def __call__(self):
        k = self.param("kernel", self.kernel_init, self.kernel_shape)
        b = self.param("bias", self.bias_init, (self.kernel_shape[-1],))
        return k, b


class Downsample(nn.Module):
    """LN + strided 2x2 conv between UNet levels (reference: src/modules.py:152-156).

    kernel==stride means each output pixel reads a disjoint 2x2 patch, so the
    conv IS a patch matmul: a single dot_general contracting (p, q, c_in)
    against the conv kernel in its NATIVE (kh, kw, c_in, c_out) layout. The
    conv-emitter path cost ~60 us/step of activation layout copies at the 1B
    sampler geometry; the dot leaves layout choices to the matmul. Param tree
    (conv/kernel, conv/bias) is unchanged — checkpoints are unaffected.
    """

    c_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = layer_norm(x)
        kernel, bias = _Conv2dParams(
            (2, 2, x.shape[-1], self.c_out),
            tinit.xavier_uniform(),
            tinit.zeros,
            name="conv",
        )()
        b, hh, ww, c = x.shape
        x6 = x.reshape(b, hh // 2, 2, ww // 2, 2, c).astype(self.dtype)
        y = jax.lax.dot_general(
            x6,
            kernel.astype(self.dtype),
            dimension_numbers=(((2, 4, 5), (0, 1, 2)), ((), ())),
        )  # (b, h/2, w/2, c_out)
        return y + bias.astype(self.dtype)


class Upsample(nn.Module):
    """LN + 2x2 stride-2 transposed conv (reference: src/modules.py:171-175).

    kernel==stride means no output overlap: out[2i+p, 2j+q, o] =
    sum_c x[i,j,c] * K[p,q,c,o] — one dot_general over c with the kernel in
    its native layout, then an interleaving reshape (the same depth_to_space
    transpose XLA would emit anyway, minus the conv emitter's extra copies).
    Init matches torch's ConvTranspose2d defaults exactly like
    ConvTranspose2dTorch (same param tree: conv/kernel, conv/bias).
    """

    c_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = layer_norm(x)
        kernel, bias = _Conv2dParams(
            (2, 2, x.shape[-1], self.c_out),
            tinit.kaiming_uniform_leaky_transpose(),
            tinit.torch_default_bias(self.c_out * 2 * 2),  # torch's transpose fan
            name="conv",
        )()
        b, hh, ww, _ = x.shape
        z = jax.lax.dot_general(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            dimension_numbers=(((3,), (2,)), ((), ())),
        )  # (b, h, w, p, q, c_out)
        z = z.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh * 2, ww * 2, self.c_out)
        return z + bias.astype(self.dtype)
