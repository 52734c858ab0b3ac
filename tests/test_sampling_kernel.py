"""Statistical tests for the fused Gumbel-argmax categorical kernel
(interpret mode on CPU): the empirical distribution over many draws must match
softmax(logits / T)."""
import jax
import jax.numpy as jnp
import numpy as np

from paella_tpu.kernels.sampling import fused_head_categorical, gumbel_categorical


def test_matches_softmax_distribution():
    k_classes = 8
    logits = jnp.array([1.5, 0.0, -1.0, 2.0, 0.5, -2.0, 1.0, 0.2], jnp.float32)
    temp = 0.8
    n = 8192  # one kernel call, n iid rows of the same logits
    batch = jnp.broadcast_to(logits, (n, k_classes))
    draws = gumbel_categorical(jax.random.PRNGKey(0), batch, temp, interpret=True)
    counts = np.bincount(np.asarray(draws), minlength=k_classes) / n
    want = np.asarray(jax.nn.softmax(logits / temp))
    # ~3.5 sigma at p~0.4, n=8192 -> tolerance ~0.02
    np.testing.assert_allclose(counts, want, atol=0.025)


def test_temperature_limits_and_determinism():
    logits = jnp.array([0.0, 0.0, 5.0, 0.0], jnp.float32)
    batch = jnp.broadcast_to(logits, (256, 4))
    # near-zero temperature -> argmax almost surely
    draws = gumbel_categorical(jax.random.PRNGKey(1), batch, 0.05, interpret=True)
    assert (np.asarray(draws) == 2).mean() > 0.99
    # deterministic per key; different keys differ
    a = gumbel_categorical(jax.random.PRNGKey(2), batch, 2.0, interpret=True)
    b = gumbel_categorical(jax.random.PRNGKey(2), batch, 2.0, interpret=True)
    c = gumbel_categorical(jax.random.PRNGKey(3), batch, 2.0, interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_shapes_and_padding():
    # non-multiple-of-tile row count exercises the pad/unpad path
    logits = jax.random.normal(jax.random.PRNGKey(0), (3, 5, 7, 16))
    out = gumbel_categorical(jax.random.PRNGKey(1), logits, 1.0, tile_m=64, interpret=True)
    assert out.shape == (3, 5, 7)
    assert out.dtype == jnp.int32
    assert int(out.min()) >= 0 and int(out.max()) < 16


def test_fused_head_matches_composed_path():
    """fused_head_categorical must draw the SAME tokens as head-matmul followed
    by gumbel_categorical: identical counter-hash PRNG stream, identical op
    order (f32 CFG mix -> bf16 matmul -> f32 score)."""
    kf = jax.random.split(jax.random.PRNGKey(7), 4)
    b, h, w, c, k = 2, 4, 8, 128, 256
    feat_c = jax.random.normal(kf[0], (b, h, w, c), jnp.bfloat16)
    feat_u = jax.random.normal(kf[1], (b, h, w, c), jnp.bfloat16)
    w_out = (jax.random.normal(kf[2], (c, k)) * 0.1).astype(jnp.bfloat16)
    key, temp, cfg_w = jax.random.PRNGKey(5), 0.7, 1.8

    # with CFG mix
    mixed = feat_c.astype(jnp.float32) * cfg_w + feat_u.astype(jnp.float32) * (1 - cfg_w)
    logits = jnp.dot(mixed.astype(jnp.bfloat16), w_out, preferred_element_type=jnp.float32)
    want = gumbel_categorical(key, logits, temp, tile_m=64, interpret=True)
    got = fused_head_categorical(
        key, feat_c, feat_u, cfg_w, w_out, temp, tile_m=64, interpret=True
    )
    assert got.shape == (b, h, w) and got.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # without CFG (cond-only phase)
    logits1 = jnp.dot(feat_c, w_out, preferred_element_type=jnp.float32)
    want1 = gumbel_categorical(key, logits1, temp, tile_m=64, interpret=True)
    got1 = fused_head_categorical(
        key, feat_c, None, 0.0, w_out, temp, tile_m=64, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got1), np.asarray(want1))


def test_fused_head_distribution():
    """End-to-end distributional check: draws ~ softmax((f @ W)/T)."""
    c, k_classes, n = 64, 8, 4096
    f = jnp.broadcast_to(
        jax.random.normal(jax.random.PRNGKey(0), (1, c), jnp.bfloat16), (n, c)
    )
    w_out = (jax.random.normal(jax.random.PRNGKey(1), (c, k_classes)) * 0.3).astype(
        jnp.bfloat16
    )
    temp = 0.9
    draws = fused_head_categorical(
        jax.random.PRNGKey(2), f, None, 0.0, w_out, temp, tile_m=128, interpret=True
    )
    logits = jnp.dot(f[:1], w_out, preferred_element_type=jnp.float32)[0]
    want = np.asarray(jax.nn.softmax(logits.astype(jnp.float32) / temp))
    counts = np.bincount(np.asarray(draws), minlength=k_classes) / n
    np.testing.assert_allclose(counts, want, atol=0.03)


def test_batched_keys_match_solo_draws():
    """(B,) batched keys: each image's Gumbel stream is keyed by its own key
    and image-local counter indices, so draws equal the single-image call —
    for both the logits kernel and the fused head kernel."""
    b, hw, k_classes, c = 3, 128, 16, 32
    keys = jnp.stack([jax.random.PRNGKey(40 + i) for i in range(b)])
    logits = jax.random.normal(jax.random.PRNGKey(0), (b, hw, k_classes))
    batched = gumbel_categorical(keys, logits, 1.0, tile_m=64, interpret=True)
    for i in range(b):
        solo = gumbel_categorical(
            keys[i : i + 1], logits[i : i + 1], 1.0, tile_m=64, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(batched[i]), np.asarray(solo[0]))

    feat = jax.random.normal(jax.random.PRNGKey(1), (b, hw, c), jnp.float32)
    w_out = jax.random.normal(jax.random.PRNGKey(2), (c, k_classes)) * 0.3
    fused = fused_head_categorical(
        keys, feat, None, 0.0, w_out, 1.0, tile_m=64, interpret=True
    )
    for i in range(b):
        solo = fused_head_categorical(
            keys[i : i + 1], feat[i : i + 1], None, 0.0, w_out, 1.0,
            tile_m=64, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(fused[i]), np.asarray(solo[0]))
