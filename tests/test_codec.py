"""Codec tests: quantizer semantics, straight-through gradients, encode/decode
geometry, decode_indices consistency."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paella_tpu.codec import VQModel, VectorQuantize, codebook_lookup
from paella_tpu.config import VQConfig

CFG = VQConfig.tiny()


def test_codebook_lookup_exact():
    cb = jnp.asarray(np.random.default_rng(0).standard_normal((16, 4), dtype=np.float32))
    z = cb[jnp.array([3, 7, 11])] + 0.01  # small perturbation keeps nearest neighbor
    idx = codebook_lookup(z, cb)
    np.testing.assert_array_equal(np.asarray(idx), [3, 7, 11])


def test_quantize_straight_through_gradient():
    vq = VectorQuantize(4, 16)
    params = vq.init(jax.random.PRNGKey(0), jnp.zeros((2, 4)))

    def loss(z):
        zq, _, _ = vq.apply(params, z, method=VectorQuantize.quantize)
        return jnp.sum(zq * 2.0)

    g = jax.grad(loss)(jnp.ones((2, 4)))
    # straight-through: d zq / d z == identity
    np.testing.assert_allclose(np.asarray(g), 2.0 * np.ones((2, 4)), rtol=1e-6)


def test_idx2vq_matches_quantize():
    vq = VectorQuantize(4, 16)
    z = jax.random.normal(jax.random.PRNGKey(1), (3, 5, 5, 4))
    params = vq.init(jax.random.PRNGKey(0), z.reshape(-1, 4))
    zq, (vq_loss, commit_loss), idx = vq.apply(params, z, method=VectorQuantize.quantize)
    emb = vq.apply(params, idx, method=VectorQuantize.idx2vq)
    np.testing.assert_allclose(np.asarray(zq), np.asarray(emb), rtol=1e-5, atol=1e-6)
    assert float(vq_loss) >= 0 and float(commit_loss) >= 0


@pytest.fixture(scope="module")
def vqmodel():
    model = VQModel(CFG)
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables


def test_encode_geometry(vqmodel):
    """256x256x3 -> 64x64 tokens at full scale; here 32 -> 8 with the same f4
    factor (reference: src/vqgan.py:46 'f4', readme latent geometry)."""
    model, variables = vqmodel
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    qe, z, idx, loss = model.apply(variables, x, method=VQModel.encode)
    f = CFG.downscale
    assert f == 4
    assert qe.shape == (2, 8, 8, CFG.c_latent)
    assert idx.shape == (2, 8, 8)
    assert idx.dtype in (jnp.int32, jnp.int64)
    # scale factor is applied on the way out (src/vqgan.py:95)
    assert float(jnp.abs(qe).max()) > 0


def test_decode_geometry(vqmodel):
    model, variables = vqmodel
    z = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, CFG.c_latent))
    img = model.apply(variables, z, method=VQModel.decode)
    assert img.shape == (2, 32, 32, 3)


def test_decode_indices(vqmodel):
    model, variables = vqmodel
    idx = jax.random.randint(jax.random.PRNGKey(3), (2, 8, 8), 0, CFG.codebook_size)
    img = model.apply(variables, idx, method=VQModel.decode_indices)
    assert img.shape == (2, 32, 32, 3)
    assert bool(jnp.all(jnp.isfinite(img)))


def test_encode_decode_indices_consistent(vqmodel):
    """decode(qe) and decode_indices(indices) must agree: idx2vq(indices) equals
    the quantized latents that qe*scale represents (src/vqgan.py:95-107)."""
    model, variables = vqmodel
    x = jax.random.uniform(jax.random.PRNGKey(4), (1, 32, 32, 3))
    qe, _, idx, _ = model.apply(variables, x, method=VQModel.encode)
    img_a = model.apply(variables, qe, method=VQModel.decode)
    img_b = model.apply(variables, idx, method=VQModel.decode_indices)
    np.testing.assert_allclose(np.asarray(img_a), np.asarray(img_b), rtol=1e-4, atol=1e-5)


def test_autoencode_smoke(vqmodel):
    model, variables = vqmodel
    x = jax.random.uniform(jax.random.PRNGKey(5), (1, 32, 32, 3))
    recon, vq_loss = model.apply(variables, x)
    assert recon.shape == x.shape
    assert np.isfinite(float(vq_loss))


def test_batchnorm_train_mode_updates_stats(vqmodel):
    model, variables = vqmodel
    x = jax.random.uniform(jax.random.PRNGKey(6), (2, 32, 32, 3))
    _, mutated = model.apply(
        variables, x, True, method=VQModel.encode, mutable=["batch_stats"]
    )
    before = variables["batch_stats"]["latent_norm"]["mean"]
    after = mutated["batch_stats"]["latent_norm"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))
