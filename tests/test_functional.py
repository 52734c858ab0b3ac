"""Golden-value tests of functional ops against torch's implementations.

These pin down the semantics that converted PyTorch checkpoints depend on:
pixel shuffle channel ordering, grouped-conv channel grouping, exact GELU,
layernorm eps placement, replication padding, and transposed-conv geometry.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from paella_tpu.nn import functional as pf
from paella_tpu.nn.blocks import ConvTranspose2dTorch

RTOL, ATOL = 1e-5, 1e-5


def nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))


def nhwc(x_nchw: torch.Tensor) -> np.ndarray:
    return x_nchw.detach().numpy().transpose(0, 2, 3, 1)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_space_to_depth_matches_pixel_unshuffle(rng):
    x = rng.standard_normal((2, 8, 8, 3), dtype=np.float32)
    ours = np.asarray(pf.space_to_depth(jnp.asarray(x), 2))
    theirs = nhwc(F.pixel_unshuffle(nchw(x), 2))
    np.testing.assert_allclose(ours, theirs, rtol=RTOL, atol=ATOL)


def test_depth_to_space_matches_pixel_shuffle(rng):
    x = rng.standard_normal((2, 4, 4, 12), dtype=np.float32)
    ours = np.asarray(pf.depth_to_space(jnp.asarray(x), 2))
    theirs = nhwc(F.pixel_shuffle(nchw(x), 2))
    np.testing.assert_allclose(ours, theirs, rtol=RTOL, atol=ATOL)


def test_space_depth_roundtrip(rng):
    x = rng.standard_normal((1, 8, 8, 5), dtype=np.float32)
    out = pf.depth_to_space(pf.space_to_depth(jnp.asarray(x), 2), 2)
    np.testing.assert_allclose(np.asarray(out), x)


def test_layer_norm_matches_torch(rng):
    x = rng.standard_normal((2, 4, 4, 16), dtype=np.float32)
    ours = np.asarray(pf.layer_norm(jnp.asarray(x), eps=1e-6))
    theirs = F.layer_norm(torch.from_numpy(x), (16,), eps=1e-6).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_gelu_is_exact_erf_variant(rng):
    x = rng.standard_normal((64,), dtype=np.float32) * 3
    ours = np.asarray(pf.gelu(jnp.asarray(x)))
    theirs = F.gelu(torch.from_numpy(x)).numpy()  # torch default = exact erf
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_replication_pad_matches_torch(rng):
    x = rng.standard_normal((1, 5, 6, 3), dtype=np.float32)
    ours = np.asarray(pf.replication_pad_2d(jnp.asarray(x), 1))
    theirs = nhwc(F.pad(nchw(x), (1, 1, 1, 1), mode="replicate"))
    np.testing.assert_allclose(ours, theirs, rtol=RTOL, atol=ATOL)


def test_sinusoidal_embedding_matches_reference_formula():
    """reference: src/modules.py:212-221"""
    import math

    r = np.array([0.25, 1.0], dtype=np.float32)
    c_r = 8
    ours = np.asarray(pf.sinusoidal_embedding(jnp.asarray(r), c_r))
    rr = torch.from_numpy(r) * 10000
    half = c_r // 2
    emb = math.log(10000) / (half - 1)
    emb = torch.arange(half).float().mul(-emb).exp()
    emb = rr[:, None] * emb[None, :]
    theirs = torch.cat([emb.sin(), emb.cos()], dim=1).numpy()
    # phases reach r*10000 ~ 2.5e3 rad, so f32 frequency rounding amplifies to ~1e-3
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-3)


def test_grouped_conv_channel_grouping(rng):
    """The skip-concat depthwise conv (reference: src/modules.py:46) splits the
    (c + c_skip) input channels into c CONTIGUOUS groups; JAX's
    feature_group_count must group identically for checkpoint parity."""
    c, c_skip, k = 4, 4, 3
    x = rng.standard_normal((2, 6, 6, c + c_skip), dtype=np.float32)
    w = rng.standard_normal((c, (c + c_skip) // c, k, k), dtype=np.float32)  # torch OIHW
    b = rng.standard_normal((c,), dtype=np.float32)

    theirs = nhwc(F.conv2d(nchw(x), torch.from_numpy(w), torch.from_numpy(b), padding=k // 2, groups=c))

    w_jax = jnp.asarray(w.transpose(2, 3, 1, 0))  # -> HWIO
    ours = jax.lax.conv_general_dilated(
        jnp.asarray(x),
        w_jax,
        window_strides=(1, 1),
        padding=[(1, 1), (1, 1)],
        feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + jnp.asarray(b)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("kernel,stride,pad", [(2, 2, 0), (4, 2, 1)])
def test_conv_transpose_matches_torch(rng, kernel, stride, pad):
    """Both transposed convs used by the framework: the denoiser's 2x2/s2
    (reference: src/modules.py:174) and the codec's 4x4/s2/p1 (src/vqgan.py:83)."""
    c_in, c_out = 3, 5
    x = rng.standard_normal((2, 6, 6, c_in), dtype=np.float32)
    w = rng.standard_normal((c_in, c_out, kernel, kernel), dtype=np.float32)  # torch layout
    b = rng.standard_normal((c_out,), dtype=np.float32)

    theirs = nhwc(
        F.conv_transpose2d(nchw(x), torch.from_numpy(w), torch.from_numpy(b), stride=stride, padding=pad)
    )

    mod = ConvTranspose2dTorch(c_out, (kernel, kernel), (stride, stride), padding=pad)
    params = {
        "params": {
            "kernel": jnp.asarray(w.transpose(2, 3, 0, 1)),  # (kh,kw,in,out)
            "bias": jnp.asarray(b),
        }
    }
    ours = np.asarray(mod.apply(params, jnp.asarray(x)))
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)
