"""Pallas kernel correctness tests (interpreter mode on CPU) against the XLA
reference implementations."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paella_tpu.codec.quantize import codebook_lookup
from paella_tpu.kernels.attention import fused_attention
from paella_tpu.kernels.quantize import fused_codebook_lookup
from paella_tpu.nn.attention import dot_product_attention


@pytest.mark.parametrize("n,s,d", [(16, 24, 8), (64, 72, 80)])
def test_fused_attention_matches_xla(n, s, d):
    b, h = 2, 4
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(k1, (b, n, h, d))
    k = jax.random.normal(k2, (b, s, h, d))
    v = jax.random.normal(k3, (b, s, h, d))
    ref = dot_product_attention(q, k, v)
    out = fused_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_fused_attention_respects_mask():
    b, n, s, h, d = 1, 8, 12, 2, 16
    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(keys[0], (b, n, h, d))
    k = jax.random.normal(keys[1], (b, s, h, d))
    v = jax.random.normal(keys[2], (b, s, h, d))
    mask = jnp.concatenate([jnp.ones((b, 9), bool), jnp.zeros((b, 3), bool)], axis=1)
    ref = dot_product_attention(q, k, v, kv_mask=mask)
    out = fused_attention(q, k, v, kv_mask=mask, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)
    # masked == truncated
    trunc = dot_product_attention(q, k[:, :9], v[:, :9])
    np.testing.assert_allclose(np.asarray(out), np.asarray(trunc), rtol=2e-4, atol=2e-4)


def test_fused_attention_falls_back_for_reweight():
    b, n, s, h, d = 1, 4, 6, 2, 8
    keys = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(keys[0], (b, n, h, d))
    k = jax.random.normal(keys[1], (b, s, h, d))
    v = jax.random.normal(keys[2], (b, s, h, d))
    w = jnp.ones((b, 1, 1, s)) * 0.5
    ref = dot_product_attention(q, k, v, reweight=w)
    out = fused_attention(q, k, v, reweight=w, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("m,k,c", [(100, 64, 4), (1000, 300, 4)])
def test_fused_codebook_lookup_matches_xla(m, k, c):
    z = jax.random.normal(jax.random.PRNGKey(0), (m, c))
    cb = jax.random.normal(jax.random.PRNGKey(1), (k, c))
    ref = codebook_lookup(z, cb)
    out = fused_codebook_lookup(z, cb, tile_m=64, tile_k=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_fused_codebook_lookup_grid_shape():
    z = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 4))
    cb = jax.random.normal(jax.random.PRNGKey(3), (128, 4))
    out = fused_codebook_lookup(z, cb, tile_m=64, tile_k=128, interpret=True)
    assert out.shape == (2, 8, 8)
    ref = codebook_lookup(z, cb)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
