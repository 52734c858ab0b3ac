"""Statistical tests for the fused Gumbel-argmax categorical kernel
(interpret mode on CPU): the empirical distribution over many draws must match
softmax(logits / T)."""
import jax
import jax.numpy as jnp
import numpy as np

from paella_tpu.kernels.sampling import gumbel_categorical


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
