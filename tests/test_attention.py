"""MultiheadAttention parity with torch.nn.MultiheadAttention semantics, and the
mask/reweight extensions the TPU sampler relies on."""
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from paella_tpu.nn.attention import MultiheadAttention

B, N, S, C, NHEAD = 2, 6, 5, 16, 4


def make_params(rng):
    wq, wk, wv, wo = (rng.standard_normal((C, C), dtype=np.float32) * 0.1 for _ in range(4))
    bq, bk, bv, bo = (rng.standard_normal((C,), dtype=np.float32) * 0.1 for _ in range(4))
    return dict(wq=wq, wk=wk, wv=wv, wo=wo, bq=bq, bk=bk, bv=bv, bo=bo)


def jax_params(p):
    # our Dense kernels are (in, out) = torch weight transposed
    return {
        "params": {
            "q": {"kernel": jnp.asarray(p["wq"].T), "bias": jnp.asarray(p["bq"])},
            "k": {"kernel": jnp.asarray(p["wk"].T), "bias": jnp.asarray(p["bk"])},
            "v": {"kernel": jnp.asarray(p["wv"].T), "bias": jnp.asarray(p["bv"])},
            "o": {"kernel": jnp.asarray(p["wo"].T), "bias": jnp.asarray(p["bo"])},
        }
    }


def torch_mha(p, q, kv):
    in_proj_w = torch.from_numpy(np.concatenate([p["wq"], p["wk"], p["wv"]], axis=0))
    in_proj_b = torch.from_numpy(np.concatenate([p["bq"], p["bk"], p["bv"]], axis=0))
    out, _ = F.multi_head_attention_forward(
        torch.from_numpy(q).transpose(0, 1),  # (N, B, C)
        torch.from_numpy(kv).transpose(0, 1),
        torch.from_numpy(kv).transpose(0, 1),
        C,
        NHEAD,
        in_proj_w,
        in_proj_b,
        None,
        None,
        False,
        0.0,
        torch.from_numpy(p["wo"]),
        torch.from_numpy(p["bo"]),
        need_weights=False,
    )
    return out.transpose(0, 1).detach().numpy()


def test_mha_matches_torch():
    rng = np.random.default_rng(1)
    p = make_params(rng)
    q = rng.standard_normal((B, N, C), dtype=np.float32)
    kv = rng.standard_normal((B, S, C), dtype=np.float32)

    mod = MultiheadAttention(C, NHEAD)
    ours = np.asarray(mod.apply(jax_params(p), jnp.asarray(q), jnp.asarray(kv)))
    theirs = torch_mha(p, q, kv)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_masked_tokens_equal_absent_tokens():
    """Masking the last tokens of kv must equal dropping them — the property that
    makes batched CFG with heterogeneous conditioning exact."""
    rng = np.random.default_rng(2)
    p = make_params(rng)
    q = rng.standard_normal((B, N, C), dtype=np.float32)
    kv = rng.standard_normal((B, S, C), dtype=np.float32)

    mod = MultiheadAttention(C, NHEAD)
    params = jax_params(p)
    keep = 3
    mask = jnp.concatenate([jnp.ones((B, keep), bool), jnp.zeros((B, S - keep), bool)], axis=1)
    masked = np.asarray(mod.apply(params, jnp.asarray(q), jnp.asarray(kv), kv_mask=mask))
    truncated = np.asarray(mod.apply(params, jnp.asarray(q), jnp.asarray(kv[:, :keep])))
    np.testing.assert_allclose(masked, truncated, rtol=1e-4, atol=1e-5)


def test_reweight_matches_manual_softmax_scaling():
    """reweight multiplies post-softmax probabilities
    (reference: utils/alter_attention.py:34)."""
    rng = np.random.default_rng(3)
    p = make_params(rng)
    q = rng.standard_normal((1, N, C), dtype=np.float32)
    kv = rng.standard_normal((1, S, C), dtype=np.float32)
    params = jax_params(p)
    mod = MultiheadAttention(C, NHEAD)

    w = np.ones((1, 1, 1, S), dtype=np.float32)
    out_ones = np.asarray(mod.apply(params, jnp.asarray(q), jnp.asarray(kv), reweight=jnp.asarray(w)))
    out_plain = np.asarray(mod.apply(params, jnp.asarray(q), jnp.asarray(kv)))
    np.testing.assert_allclose(out_ones, out_plain, rtol=1e-5, atol=1e-6)

    # zeroing all attention must collapse output to the out-proj bias
    w0 = np.zeros((1, 1, 1, S), dtype=np.float32)
    out_zero = np.asarray(mod.apply(params, jnp.asarray(q), jnp.asarray(kv), reweight=jnp.asarray(w0)))
    np.testing.assert_allclose(out_zero, np.broadcast_to(p["bo"], out_zero.shape), rtol=1e-4, atol=1e-5)
