"""InceptionV3 pool3 feature extractor — the classic-FID featurizer.

The reference reports FID for its released checkpoints (reference: readme.md:6)
but ships no evaluation code; BASELINE.md's parity bar needs the CLASSIC FID
(InceptionV3 pool3, 2048-dim), not just the CLIP-FID variant already wired in
eval/metrics.py. This module implements the network as pure JAX functions over
a converted torch state dict (zero-egress: weights must be user-supplied — the
standard `pt_inception-2015-12-05` checkpoint from pytorch-fid, or any
torchvision InceptionV3 state dict; `convert_inception` reads both, they share
key names).

Two variants, selectable because the canonical FID numbers depend on it:
- "fid" (default): pytorch-fid's TF-compatible graph — avg-pools inside
  InceptionA/C and Mixed_7b use count_include_pad=False, and Mixed_7c's
  branch_pool is a MAX pool (the well-known TF-Inception quirk every published
  FID number bakes in).
- "torchvision": stock torchvision.models.inception_v3 semantics
  (count_include_pad=True everywhere, avg pool in Mixed_7c).

Layout: NHWC activations, HWIO kernels; BatchNorm runs in eval mode on the
checkpoint's running stats (eps=1e-3, torchvision BasicConv2d). Preprocessing
matches the standard FID recipe: resize to 299x299 bilinear
(half-pixel-centers == torch align_corners=False), scale [0,1] -> [-1,1].
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Mapping

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_BN_EPS = 1e-3
POOL3_DIM = 2048


# ---------------------------------------------------------------------------
# primitive ops
# ---------------------------------------------------------------------------


def _conv(x: Array, kernel: Array, strides=(1, 1), padding=((0, 0), (0, 0))) -> Array:
    return jax.lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=strides,
        padding=list(padding),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _basic_conv(p: Mapping, x: Array, strides=(1, 1), padding=((0, 0), (0, 0))) -> Array:
    """torchvision BasicConv2d: bias-free conv -> BatchNorm(eval) -> relu."""
    x = _conv(x, p["conv"]["kernel"], strides, padding)
    bn = p["bn"]
    inv = jax.lax.rsqrt(bn["var"].astype(jnp.float32) + _BN_EPS)
    scale = (bn["scale"].astype(jnp.float32) * inv).astype(x.dtype)
    shift = (
        bn["bias"].astype(jnp.float32)
        - bn["mean"].astype(jnp.float32) * bn["scale"].astype(jnp.float32) * inv
    ).astype(x.dtype)
    return jax.nn.relu(x * scale + shift)


def _avg_pool3(x: Array, count_include_pad: bool) -> Array:
    """3x3 stride-1 pad-1 average pool; count_include_pad=False divides each
    window by its count of non-pad elements (the TF/pytorch-fid behavior)."""
    pad = ((0, 0), (1, 1), (1, 1), (0, 0))
    summed = jax.lax.reduce_window(
        x, jnp.array(0, x.dtype), jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), pad
    )
    if count_include_pad:
        return summed / jnp.array(9, x.dtype)
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    cnt = jax.lax.reduce_window(
        ones, jnp.array(0, x.dtype), jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), pad
    )
    return summed / cnt


def _max_pool3(x: Array, stride: int, pad: int = 0) -> Array:
    p = ((0, 0), (pad, pad), (pad, pad), (0, 0))
    return jax.lax.reduce_window(
        x,
        jnp.array(-jnp.inf, x.dtype),
        jax.lax.max,
        (1, 3, 3, 1),
        (1, stride, stride, 1),
        p,
    )


_P0 = ((0, 0), (0, 0))
_P1 = ((1, 1), (1, 1))
_P2 = ((2, 2), (2, 2))
_P_1x7 = ((0, 0), (3, 3))  # kernel (1,7)
_P_7x1 = ((3, 3), (0, 0))  # kernel (7,1)
_P_1x3 = ((0, 0), (1, 1))
_P_3x1 = ((1, 1), (0, 0))


# ---------------------------------------------------------------------------
# inception blocks (channel arithmetic per torchvision.models.inception)
# ---------------------------------------------------------------------------


def _inception_a(p, x, fid: bool) -> Array:
    b1 = _basic_conv(p["branch1x1"], x)
    b5 = _basic_conv(p["branch5x5_2"], _basic_conv(p["branch5x5_1"], x), padding=_P2)
    b3 = _basic_conv(p["branch3x3dbl_1"], x)
    b3 = _basic_conv(p["branch3x3dbl_2"], b3, padding=_P1)
    b3 = _basic_conv(p["branch3x3dbl_3"], b3, padding=_P1)
    bp = _basic_conv(p["branch_pool"], _avg_pool3(x, count_include_pad=not fid))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(p, x) -> Array:
    b3 = _basic_conv(p["branch3x3"], x, strides=(2, 2))
    bd = _basic_conv(p["branch3x3dbl_1"], x)
    bd = _basic_conv(p["branch3x3dbl_2"], bd, padding=_P1)
    bd = _basic_conv(p["branch3x3dbl_3"], bd, strides=(2, 2))
    return jnp.concatenate([b3, bd, _max_pool3(x, 2)], axis=-1)


def _inception_c(p, x, fid: bool) -> Array:
    b1 = _basic_conv(p["branch1x1"], x)
    b7 = _basic_conv(p["branch7x7_1"], x)
    b7 = _basic_conv(p["branch7x7_2"], b7, padding=_P_1x7)
    b7 = _basic_conv(p["branch7x7_3"], b7, padding=_P_7x1)
    bd = _basic_conv(p["branch7x7dbl_1"], x)
    bd = _basic_conv(p["branch7x7dbl_2"], bd, padding=_P_7x1)
    bd = _basic_conv(p["branch7x7dbl_3"], bd, padding=_P_1x7)
    bd = _basic_conv(p["branch7x7dbl_4"], bd, padding=_P_7x1)
    bd = _basic_conv(p["branch7x7dbl_5"], bd, padding=_P_1x7)
    bp = _basic_conv(p["branch_pool"], _avg_pool3(x, count_include_pad=not fid))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(p, x) -> Array:
    b3 = _basic_conv(p["branch3x3_2"], _basic_conv(p["branch3x3_1"], x), strides=(2, 2))
    b7 = _basic_conv(p["branch7x7x3_1"], x)
    b7 = _basic_conv(p["branch7x7x3_2"], b7, padding=_P_1x7)
    b7 = _basic_conv(p["branch7x7x3_3"], b7, padding=_P_7x1)
    b7 = _basic_conv(p["branch7x7x3_4"], b7, strides=(2, 2))
    return jnp.concatenate([b3, b7, _max_pool3(x, 2)], axis=-1)


def _inception_e(p, x, pool: str) -> Array:
    """pool: 'avg' (count_include_pad=True), 'avg_nopad' (FID Mixed_7b), or
    'max' (FID Mixed_7c — the TF-Inception quirk)."""
    b1 = _basic_conv(p["branch1x1"], x)
    b3 = _basic_conv(p["branch3x3_1"], x)
    b3 = jnp.concatenate(
        [
            _basic_conv(p["branch3x3_2a"], b3, padding=_P_1x3),
            _basic_conv(p["branch3x3_2b"], b3, padding=_P_3x1),
        ],
        axis=-1,
    )
    bd = _basic_conv(p["branch3x3dbl_1"], x)
    bd = _basic_conv(p["branch3x3dbl_2"], bd, padding=_P1)
    bd = jnp.concatenate(
        [
            _basic_conv(p["branch3x3dbl_3a"], bd, padding=_P_1x3),
            _basic_conv(p["branch3x3dbl_3b"], bd, padding=_P_3x1),
        ],
        axis=-1,
    )
    if pool == "max":
        pooled = _max_pool3(x, 1, pad=1)
    else:
        pooled = _avg_pool3(x, count_include_pad=pool == "avg")
    bp = _basic_conv(p["branch_pool"], pooled)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def inception_pool3(params: Mapping, images: Array, variant: str = "fid") -> Array:
    """(B, 299, 299, 3) images in [-1, 1] -> (B, 2048) pool3 features."""
    if variant not in ("fid", "torchvision"):
        raise ValueError(f"unknown variant {variant!r}")
    fid = variant == "fid"
    x = images
    x = _basic_conv(params["Conv2d_1a_3x3"], x, strides=(2, 2))
    x = _basic_conv(params["Conv2d_2a_3x3"], x)
    x = _basic_conv(params["Conv2d_2b_3x3"], x, padding=_P1)
    x = _max_pool3(x, 2)
    x = _basic_conv(params["Conv2d_3b_1x1"], x)
    x = _basic_conv(params["Conv2d_4a_3x3"], x)
    x = _max_pool3(x, 2)
    for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        x = _inception_a(params[name], x, fid)
    x = _inception_b(params["Mixed_6a"], x)
    for name in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        x = _inception_c(params[name], x, fid)
    x = _inception_d(params["Mixed_7a"], x)
    x = _inception_e(params["Mixed_7b"], x, pool="avg_nopad" if fid else "avg")
    x = _inception_e(params["Mixed_7c"], x, pool="max" if fid else "avg")
    return jnp.mean(x, axis=(1, 2))  # global average pool -> (B, 2048)


def inception_preprocess(images: Array, size: int = 299) -> Array:
    """[0,1] (or uint8) NHWC images, any resolution -> (B, 299, 299, 3) in
    [-1, 1], bilinear — the standard FID preprocessing."""
    if images.dtype == jnp.uint8:
        images = images.astype(jnp.float32) / 255.0
    b, h, w, c = images.shape
    if (h, w) != (size, size):
        images = jax.image.resize(images, (b, size, size, c), method="bilinear")
    return images * 2.0 - 1.0


def inception_features(
    params, variant: str = "fid", dtype=jnp.float32
) -> Callable[[Array], Array]:
    """Jit'd classic-FID featurizer for eval/metrics.py::features_over_batches:
    [0,1]-or-uint8 NHWC images (any resolution) -> (B, 2048) f32 features."""
    params = jax.tree_util.tree_map(lambda a: jnp.asarray(a, dtype), params)

    @jax.jit
    def extract(images: Array) -> Array:
        x = inception_preprocess(images).astype(dtype)
        return inception_pool3(params, x, variant).astype(jnp.float32)

    return extract


# ---------------------------------------------------------------------------
# converter (torchvision inception_v3 / pytorch-fid checkpoint — same keys)
# ---------------------------------------------------------------------------

# every BasicConv2d unit, per block (names exactly as in the torch state dict)
INCEPTION_UNITS = {
    "Conv2d_1a_3x3": None,  # None = the block IS one BasicConv2d
    "Conv2d_2a_3x3": None,
    "Conv2d_2b_3x3": None,
    "Conv2d_3b_1x1": None,
    "Conv2d_4a_3x3": None,
    "Mixed_5b": ["branch1x1", "branch5x5_1", "branch5x5_2", "branch3x3dbl_1",
                 "branch3x3dbl_2", "branch3x3dbl_3", "branch_pool"],
    "Mixed_5c": ["branch1x1", "branch5x5_1", "branch5x5_2", "branch3x3dbl_1",
                 "branch3x3dbl_2", "branch3x3dbl_3", "branch_pool"],
    "Mixed_5d": ["branch1x1", "branch5x5_1", "branch5x5_2", "branch3x3dbl_1",
                 "branch3x3dbl_2", "branch3x3dbl_3", "branch_pool"],
    "Mixed_6a": ["branch3x3", "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3"],
    "Mixed_6b": ["branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
                 "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
                 "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool"],
    "Mixed_6c": ["branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
                 "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
                 "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool"],
    "Mixed_6d": ["branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
                 "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
                 "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool"],
    "Mixed_6e": ["branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
                 "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
                 "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool"],
    "Mixed_7a": ["branch3x3_1", "branch3x3_2", "branch7x7x3_1", "branch7x7x3_2",
                 "branch7x7x3_3", "branch7x7x3_4"],
    "Mixed_7b": ["branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
                 "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a",
                 "branch3x3dbl_3b", "branch_pool"],
    "Mixed_7c": ["branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
                 "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a",
                 "branch3x3dbl_3b", "branch_pool"],
}


def _convert_basic_conv(sd: Mapping, prefix: str) -> dict:
    return {
        # torch conv (out, in, kh, kw) -> HWIO
        "conv": {"kernel": np.ascontiguousarray(
            np.asarray(sd[f"{prefix}.conv.weight"]).transpose(2, 3, 1, 0)
        )},
        "bn": {
            "scale": np.asarray(sd[f"{prefix}.bn.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bn.bias"]),
            "mean": np.asarray(sd[f"{prefix}.bn.running_mean"]),
            "var": np.asarray(sd[f"{prefix}.bn.running_var"]),
        },
    }


def convert_inception(sd: Mapping) -> dict:
    """torch InceptionV3 state dict -> params for inception_pool3. Ignores the
    classifier/aux keys (fc.*, AuxLogits.*) — only pool3 features are needed."""
    params = {}
    for block, units in INCEPTION_UNITS.items():
        if units is None:
            params[block] = _convert_basic_conv(sd, block)
        else:
            params[block] = {u: _convert_basic_conv(sd, f"{block}.{u}") for u in units}
    return params


def load_inception(path: str, variant: str = "fid") -> Callable[[Array], Array]:
    """One-call classic-FID featurizer from a torch checkpoint on disk."""
    from ..convert.torch_import import load_torch_state_dict

    return inception_features(convert_inception(load_torch_state_dict(path, key=None)), variant)
