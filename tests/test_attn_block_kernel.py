"""Parity tests for the fused attention-block Pallas kernel (interpret mode):
must match the AttnBlock math (LN + joint self+cross MHA + o-proj + residual)
that rest_reps_fused otherwise runs functionally."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paella_tpu.kernels.attn_block import fused_attn_block_stacked, pad_attn_weights
from paella_tpu.nn.attention import dot_product_attention
from paella_tpu.nn.functional import layer_norm


def reference_attn_block(x, kv, wq, bq, wk, bk, wv, bv, wo, bo, nhead, cond_mask=None):
    b, hh, ww, c = x.shape
    n_pix = hh * ww
    tokens = layer_norm(x).reshape(b, n_pix, c)
    kv_full = jnp.concatenate([tokens, kv], axis=1)
    kv_mask = None
    if cond_mask is not None:
        kv_mask = jnp.concatenate([jnp.ones((b, n_pix), bool), cond_mask], axis=1)
    hd = c // nhead
    s = kv_full.shape[1]
    q = (tokens @ wq + bq).reshape(b, n_pix, nhead, hd)
    k = (kv_full @ wk + bk).reshape(b, s, nhead, hd)
    v = (kv_full @ wv + bv).reshape(b, s, nhead, hd)
    out = dot_product_attention(q, k, v, kv_mask=kv_mask)
    out = out.reshape(b, n_pix, c) @ wo + bo
    return x + out.reshape(b, hh, ww, c)


@pytest.mark.parametrize("with_mask", [False, True])
def test_fused_attn_block_matches_reference(with_mask):
    b, hh, c, nhead, s_c, r = 2, 4, 128, 4, 6, 3
    ks = jax.random.split(jax.random.PRNGKey(0), 12)
    x = jax.random.normal(ks[0], (b, hh, hh, c)) * 0.5
    kv_all = jax.random.normal(ks[1], (r, b, s_c, c)) * 0.5
    wq = jax.random.normal(ks[2], (r, c, c)) * (c**-0.5)
    wk = jax.random.normal(ks[3], (r, c, c)) * (c**-0.5)
    wv = jax.random.normal(ks[4], (r, c, c)) * (c**-0.5)
    wo = jax.random.normal(ks[5], (r, c, c)) * (c**-0.5)
    bq = jax.random.normal(ks[6], (r, c)) * 0.05
    bk = jax.random.normal(ks[7], (r, c)) * 0.05
    bv = jax.random.normal(ks[8], (r, c)) * 0.05
    bo = jax.random.normal(ks[9], (r, c)) * 0.05
    mask = None
    if with_mask:
        mask = jax.random.bernoulli(ks[10], 0.7, (b, s_c))
        mask = mask.at[:, 0].set(True)  # at least one cond token attends

    wqkv = jnp.concatenate([wq, wk, wv], axis=-1)
    bqkv = jnp.concatenate([bq, bk, bv], axis=-1)
    wqkv_p, bqkv_p, wo_p = pad_attn_weights(wqkv, bqkv, wo, nhead)

    for idx in range(r):
        want = reference_attn_block(
            x, kv_all[idx], wq[idx], bq[idx], wk[idx], bk[idx], wv[idx], bv[idx],
            wo[idx], bo[idx], nhead, cond_mask=mask,
        )
        got = fused_attn_block_stacked(
            x, kv_all, wqkv_p, bqkv_p, wo_p, bo, idx, nhead,
            cond_mask=mask, head_chunk=2, tile_qkv=128, tile_o=128, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5,
            err_msg=f"rep {idx} mask={with_mask}",
        )
