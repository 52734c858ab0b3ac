"""Denoiser model tests: shapes, init scheme, masked-conditioning equivalence,
noising process."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paella_tpu.config import PaellaConfig
from paella_tpu.models import Paella, add_noise, get_loss_weight, init_params

CFG = PaellaConfig.tiny()


@pytest.fixture(scope="module")
def model_and_params():
    model = Paella(CFG)
    params = init_params(model, jax.random.PRNGKey(0), latent_hw=(16, 16))
    return model, params


def test_forward_shape(model_and_params):
    model, params = model_and_params
    b, h, w = 2, 16, 16
    x = jnp.zeros((b, h, w), jnp.int32)
    r = jnp.full((b,), 0.5)
    byt5 = jnp.ones((b, 7, CFG.byt5_embd))
    clip = jnp.ones((b, CFG.clip_embd))
    logits = model.apply({"params": params}, x, r, byt5, clip, clip)
    assert logits.shape == (b, h, w, CFG.num_labels)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_out_proj_tied_to_embedding_at_init(model_and_params):
    """reference: src/modules.py:197"""
    _, params = model_and_params
    emb = params["in_embedding"]["embedding"]
    out = params["out_proj"]["kernel"]
    np.testing.assert_array_equal(np.asarray(out), np.asarray(emb).T)


def test_zero_init_layers(model_and_params):
    """clf conv and TimestepBlock mappers are zero-initialized
    (reference: src/modules.py:195, 203-204)."""
    _, params = model_and_params
    assert float(jnp.abs(params["clf_conv"]["kernel"]).max()) == 0.0
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    t_kernels = [v for k, v in flat.items() if "_T" in "/".join(k) and k[-1] == "kernel"]
    assert t_kernels, "no TimestepBlock kernels found"
    for kern in t_kernels:
        assert float(jnp.abs(kern).max()) == 0.0


@pytest.mark.slow
def test_masked_clip_image_equals_absent(model_and_params):
    """A zeroed clip_image with mask=False must produce the same logits as
    clip_image=None — the property that lets CFG run cond+uncond in one batch."""
    from tests._utils import assert_nontrivial, perturb

    model, params = model_and_params
    params = perturb(params, jax.random.PRNGKey(99))
    b, h, w = 2, 16, 16
    key = jax.random.PRNGKey(1)
    x = jax.random.randint(key, (b, h, w), 0, CFG.num_labels)
    r = jnp.full((b,), 0.7)
    byt5 = jax.random.normal(key, (b, 5, CFG.byt5_embd))
    clip = jax.random.normal(key, (b, CFG.clip_embd))
    img = jax.random.normal(key, (b, CFG.clip_embd))

    without = model.apply({"params": params}, x, r, byt5, clip, None)
    assert_nontrivial(without, "logits")
    masked = model.apply(
        {"params": params},
        x,
        r,
        byt5,
        clip,
        img,
        clip_image_mask=jnp.zeros((b,), bool),
    )
    np.testing.assert_allclose(np.asarray(masked), np.asarray(without), rtol=1e-4, atol=1e-4)


def test_x_cat_concatenates_rows(model_and_params):
    """reference: src/modules.py:264-265 concatenates along the H axis."""
    model, params = model_and_params
    b = 1
    x = jnp.zeros((b, 8, 16), jnp.int32)
    x_cat = jnp.ones((b, 8, 16), jnp.int32)
    byt5 = jnp.ones((b, 4, CFG.byt5_embd))
    logits = model.apply({"params": params}, x, jnp.ones((b,)), byt5, x_cat=x_cat)
    assert logits.shape == (b, 16, 16, CFG.num_labels)


def test_add_noise_statistics():
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((4, 32, 32), jnp.int32)
    t = jnp.array([0.0, 0.25, 0.75, 1.0])
    noised, mask = add_noise(key, x, t, num_labels=128)
    rates = np.asarray(mask.mean(axis=(1, 2)))
    # t=0: uniform(0,1) <= 0 never -> no noise; t=1 always
    assert rates[0] == 0.0
    assert rates[3] == 1.0
    assert 0.15 < rates[1] < 0.35 and 0.65 < rates[2] < 0.85
    # un-noised positions keep their tokens
    assert bool(jnp.all(jnp.where(mask == 0, noised == x, True)))


def test_add_noise_with_pinned_inputs():
    key = jax.random.PRNGKey(0)
    x = jnp.arange(16, dtype=jnp.int32).reshape(1, 4, 4)
    random_x = jnp.full_like(x, 99)
    mask = jnp.zeros_like(x).at[0, 0, 0].set(1)
    noised, m = add_noise(key, x, jnp.array([0.5]), 128, mask=mask, random_x=random_x)
    assert int(noised[0, 0, 0]) == 99
    assert bool(jnp.all(noised.at[0, 0, 0].set(x[0, 0, 0]) == x))


def test_loss_weight_formula():
    """reference: src_distributed/modules.py:283-284"""
    t = jnp.array([0.0, 1.0])
    mask = jnp.array([[[0, 1]], [[0, 1]]], jnp.int32)
    w = np.asarray(get_loss_weight(t, mask, min_val=0.3))
    # t=0, clean token -> 0.3 ; noised token -> 1 ; t=1 -> all 1
    np.testing.assert_allclose(w[0, 0], [0.3, 1.0], rtol=1e-6)
    np.testing.assert_allclose(w[1, 0], [1.0, 1.0], rtol=1e-6)


def test_param_count_full_config_is_reference_scale():
    """The reference's default config is the 1B Paella v3 denoiser (readme.md:36:
    'Paella v3 1B'); the default-config param count must land at ~1B."""
    model = Paella(PaellaConfig())
    params = jax.eval_shape(lambda: init_params(model, jax.random.PRNGKey(0), (8, 8)))
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    assert 0.9e9 < n < 1.1e9, f"param count {n/1e6:.1f}M out of expected range"


@pytest.mark.slow
def test_remat_matches_non_remat():
    """remat=True must be numerically identical (it only changes what's stored
    for backward)."""
    import dataclasses

    model_r = Paella(dataclasses.replace(CFG, remat=True))
    params = init_params(Paella(CFG), jax.random.PRNGKey(0), latent_hw=(16, 16))
    x = jax.random.randint(jax.random.PRNGKey(1), (1, 16, 16), 0, CFG.num_labels)
    r = jnp.full((1,), 0.5)
    byt5 = jax.random.normal(jax.random.PRNGKey(2), (1, 4, CFG.byt5_embd))

    base = Paella(CFG).apply({"params": params}, x, r, byt5)
    rem = model_r.apply({"params": params}, x, r, byt5)
    np.testing.assert_allclose(np.asarray(rem), np.asarray(base), rtol=1e-5, atol=1e-5)

    def loss(p):
        return jnp.sum(model_r.apply({"params": p}, x, r, byt5) ** 2)

    g = jax.grad(loss)(params)
    assert np.isfinite(float(jax.tree_util.tree_reduce(lambda a, b: a + jnp.sum(b), g, 0.0)))


def test_multi_image_clip_conditioning(model_and_params):
    """The reference's notebook variant conditions on a LIST of CLIP images
    (utils/modules.py:228-235): (B, K, clip_embd) must yield K*clip_seq_len
    conditioning tokens, with K=1 equal to the single-image path."""
    from tests._utils import assert_nontrivial, perturb

    model, params = model_and_params
    params = perturb(params, jax.random.PRNGKey(99))
    b = 1
    x = jax.random.randint(jax.random.PRNGKey(0), (b, 16, 16), 0, CFG.num_labels)
    r = jnp.full((b,), 0.5)
    byt5 = jax.random.normal(jax.random.PRNGKey(1), (b, 4, CFG.byt5_embd))
    img = jax.random.normal(jax.random.PRNGKey(2), (b, CFG.clip_embd))

    single = model.apply({"params": params}, x, r, byt5, None, img)
    assert_nontrivial(single, "logits")
    as_k1 = model.apply({"params": params}, x, r, byt5, None, img[:, None, :])
    np.testing.assert_allclose(np.asarray(as_k1), np.asarray(single), rtol=1e-5, atol=1e-5)

    # K=3 runs and differs from K=1
    imgs = jax.random.normal(jax.random.PRNGKey(3), (b, 3, CFG.clip_embd))
    multi = model.apply({"params": params}, x, r, byt5, None, imgs)
    assert multi.shape == single.shape
    assert not np.allclose(np.asarray(multi), np.asarray(single), atol=1e-3)

    # masking images 2..3 off == passing only image 1
    mask = jnp.array([[True, False, False]])
    masked = model.apply(
        {"params": params}, x, r, byt5, None, imgs, clip_image_mask=mask
    )
    only_first = model.apply({"params": params}, x, r, byt5, None, imgs[:, :1])
    np.testing.assert_allclose(np.asarray(masked), np.asarray(only_first), rtol=1e-4, atol=1e-4)


def test_cond_cache_matches_uncached(model_and_params):
    """gen_cond_cache + cond_cache= must reproduce the uncached forward
    exactly: LN commutes with the embedding gather, the functional mappers
    follow nn.Dense's op order, and the cached kv projections are the same
    einsum hoisted."""
    from tests._utils import perturb

    model, params = model_and_params
    params = perturb(params, jax.random.PRNGKey(7))
    b = 2
    x = jax.random.randint(jax.random.PRNGKey(0), (b, 16, 16), 0, CFG.num_labels)
    r = jnp.array([0.25, 0.9])
    byt5 = jax.random.normal(jax.random.PRNGKey(1), (b, 5, CFG.byt5_embd))
    clip = jax.random.normal(jax.random.PRNGKey(2), (b, CFG.clip_embd))
    byt5_mask = jnp.array([[True] * 5, [True, True, False, False, False]])

    kw = dict(byt5_mask=byt5_mask)
    want = model.apply({"params": params}, x, r, byt5, clip, clip, **kw)
    cache = model.apply(
        {"params": params}, byt5, clip, clip, byt5_mask=byt5_mask,
        method=type(model).gen_cond_cache,
    )
    got = model.apply(
        {"params": params}, x, r, byt5, clip, clip, cond_cache=cache, **kw
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)
