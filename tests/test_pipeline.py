"""PaellaPipeline end-to-end tests on tiny models: every generation capability."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paella_tpu.config import PaellaConfig, SampleConfig, VQConfig
from paella_tpu.codec import VQModel
from paella_tpu.cond import T5Config, T5Encoder
from paella_tpu.models import Paella, init_params
from paella_tpu.pipeline import PaellaPipeline
from paella_tpu.sampling import sample

S_CFG = SampleConfig(steps=2)


@pytest.fixture(scope="module")
def pipe():
    t5_cfg = T5Config.tiny()
    p_cfg = dataclasses.replace(PaellaConfig.tiny(), byt5_embd=t5_cfg.d_model)
    model = Paella(p_cfg)
    params = init_params(model, jax.random.PRNGKey(0), latent_hw=(16, 16))

    vq = VQModel(VQConfig.tiny())
    vq_vars = vq.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)))

    t5 = T5Encoder(t5_cfg)
    ids0 = jnp.zeros((1, 8), jnp.int32)
    t5_params = t5.init(jax.random.PRNGKey(2), ids0, jnp.ones((1, 8), bool))["params"]
    byt5_fn = jax.jit(lambda ids, mask: t5.apply({"params": t5_params}, ids, mask))

    def clip_text_fn(prompts):
        return jnp.zeros((len(prompts), p_cfg.clip_embd))

    return PaellaPipeline(
        model=model,
        params=params,
        vq=vq,
        vq_vars=vq_vars,
        byt5_encode_fn=byt5_fn,
        clip_text_fn=clip_text_fn,
    )


def test_text_to_image(pipe):
    img = pipe.text_to_image(["a corgi"], jax.random.PRNGKey(0), (64, 64), S_CFG)
    assert img.shape == (1, 64, 64, 3)
    assert float(img.min()) >= 0.0 and float(img.max()) <= 1.0


def test_best_of_rerank(pipe):
    """best-of-N returns the per-prompt argmax-CLIP-score candidate."""
    with pytest.raises(ValueError):
        dataclasses.replace(pipe, clip_text_fn=None).text_to_image_best_of(
            ["a"], jax.random.PRNGKey(0), 2, (64, 64), S_CFG
        )

    d = pipe.model.config.clip_embd
    calls = {}

    def clip_text_cond_fn(prompts):
        # first axis separates text/image so scores vary across candidates
        return jnp.concatenate(
            [jnp.zeros((len(prompts), 1)), jnp.ones((len(prompts), d - 1))], axis=1
        )

    def clip_image_cond_fn(images):
        calls["n"] = images.shape[0]
        m = images.mean(axis=(1, 2, 3))[:, None]
        return jnp.concatenate([m, jnp.ones((images.shape[0], d - 1))], axis=1)

    p = dataclasses.replace(
        pipe, clip_text_fn=clip_text_cond_fn, clip_image_fn=clip_image_cond_fn
    )
    prompts = ["a corgi", "a cat"]
    key = jax.random.PRNGKey(0)
    img, scores = p.text_to_image_best_of(
        prompts, key, 3, (64, 64), S_CFG, return_scores=True
    )
    assert img.shape == (2, 64, 64, 3)
    assert scores.shape == (2, 3)
    assert calls["n"] == 6  # one batched call for all candidates

    # reproduce the batched candidates and check the argmax selection
    from paella_tpu.eval import clip_score

    rep = [q for q in prompts for _ in range(3)]
    cand = p.text_to_image(rep, key, (64, 64), S_CFG)
    want_scores = clip_score(clip_text_cond_fn(rep), clip_image_cond_fn(cand))
    np.testing.assert_allclose(np.asarray(scores).ravel(), np.asarray(want_scores), rtol=1e-6)
    best = np.argmax(np.asarray(scores), axis=1)
    cand = np.asarray(cand).reshape(2, 3, 64, 64, 3)
    np.testing.assert_array_equal(np.asarray(img), cand[np.arange(2), best])


@pytest.mark.slow
def test_inpaint_and_outpaint(pipe):
    base = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    keep = jnp.zeros((1, 16, 16), bool).at[:, :, :8].set(True)
    img = pipe.inpaint(["x"], base, keep, jax.random.PRNGKey(2), S_CFG)
    assert img.shape == (1, 64, 64, 3)

    out = pipe.outpaint(["x"], base, (64, 128), (0, 32), jax.random.PRNGKey(3), S_CFG)
    assert out.shape == (1, 64, 128, 3)


def test_img2img_and_interpolate(pipe):
    base = jax.random.uniform(jax.random.PRNGKey(4), (1, 64, 64, 3))
    img = pipe.img2img(["y"], base, jax.random.PRNGKey(5), strength=0.5, config=S_CFG)
    assert img.shape == (1, 64, 64, 3)

    other = jax.random.uniform(jax.random.PRNGKey(6), (1, 64, 64, 3))
    frames = pipe.interpolate(base[0], other[0], n=3)
    assert frames.shape == (3, 64, 64, 3)
    # endpoints reproduce the (re-quantized) inputs
    ta = pipe.encode_image_tokens(base)
    np.testing.assert_array_equal(
        np.asarray(pipe.interpolate(base[0], other[0], n=3, decode=False)[0]), np.asarray(ta[0])
    )


def test_prompt_bucketing_stable_shapes(pipe):
    """Different prompt lengths within a bucket must produce the same padded
    shape (avoids per-prompt recompilation)."""
    s1, m1 = pipe.encode_text(["short"])
    s2, m2 = pipe.encode_text(["a somewhat longer prompt here"])
    assert s1.shape[1] == s2.shape[1] == 64  # first bucket


def test_negative_prompts(pipe):
    img = pipe.text_to_image(
        ["a corgi"], jax.random.PRNGKey(7), (64, 64), S_CFG, negative_prompts=["blurry"]
    )
    assert img.shape == (1, 64, 64, 3)


def test_optimize_layout_noop_on_tiny(pipe):
    # tiny geometry is not fuse-eligible -> identity (and no config mutation)
    assert pipe.optimize_layout() is pipe


@pytest.mark.slow
def test_optimize_layout_bit_exact():
    """pipeline.optimize_layout applies the split-skip layout atomically
    (config flag + transformed params) and generation is BIT-exact."""
    from tests._utils import perturb

    # smallest fuse-eligible geometry: single-rep levels keep the interpret-
    # mode pallas cost down (stacked-rep split rules are covered at model
    # level by test_layout.py)
    p_cfg = dataclasses.replace(
        PaellaConfig.tiny(),
        c_hidden=(128, 128),
        nhead=(-1, 4),
        blocks=(1, 1),
        level_config=("CT", "CTA"),
        dropout=(0.0, 0.0),
        fused_blocks=True,
    )
    model = Paella(p_cfg)
    params = perturb(
        init_params(model, jax.random.PRNGKey(0), latent_hw=(16, 16)),
        jax.random.PRNGKey(7),
    )
    vq = VQModel(VQConfig.tiny())
    vq_vars = vq.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)))

    def byt5_fn(ids, mask):
        k = jax.random.PRNGKey(3)
        return jax.random.normal(k, (*ids.shape, p_cfg.byt5_embd)) * 0.1

    base = PaellaPipeline(
        model=model, params=params, vq=vq, vq_vars=vq_vars, byt5_encode_fn=byt5_fn
    )
    opt = base.optimize_layout()
    assert opt is not base
    assert opt.model.config.split_skip_levels == (0,)
    # idempotent: a second call is the identity
    assert opt.optimize_layout() is opt

    from jax.experimental.pallas import tpu as pltpu

    cond = base.conditioning(["a corgi"])
    uncond = base.conditioning([""])
    k = jax.random.PRNGKey(5)
    s = SampleConfig(steps=2)
    with pltpu.force_tpu_interpret_mode():  # fused kernels on the CPU backend
        x = jax.random.randint(jax.random.PRNGKey(9), (1, 16, 16), 0, p_cfg.num_labels)
        r = jnp.array([0.5])
        want = base.model.apply(
            {"params": base.params}, x, r, cond.byt5, cond.clip, byt5_mask=cond.byt5_mask
        )
        got = opt.model.apply(
            {"params": opt.params}, x, r, cond.byt5, cond.clip, byt5_mask=cond.byt5_mask
        )
        t_base = sample(base.model, base.params, k, cond, (1, 16, 16), uncond, s)
        t_opt = sample(opt.model, opt.params, k, cond, (1, 16, 16), uncond, s)
    # identical math up to dot summation order (f32 interpret mode)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), rtol=1e-4, atol=1e-4
    )
    mismatch = (np.asarray(t_base) != np.asarray(t_opt)).mean()
    assert mismatch <= 0.02, mismatch


def test_text_conditioning_lru_cache(pipe):
    """encode_text caches prompt->states (frozen encoders are deterministic):
    a repeat prompt skips the ByT5 tower; the LRU evicts oldest-first; and
    text_cache_size=0 disables caching."""
    calls = {"n": 0}
    real_fn = pipe.byt5_encode_fn

    def counting_fn(ids, mask):
        calls["n"] += 1
        return real_fn(ids, mask)

    p = dataclasses.replace(pipe, byt5_encode_fn=counting_fn, text_cache_size=2)

    s1, m1 = p.encode_text(["a corgi"])
    assert calls["n"] == 1
    s1b, m1b = p.encode_text(["a corgi"])  # hit
    assert calls["n"] == 1
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s1b))
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m1b))

    p.encode_text(["a cat"])  # second entry
    assert calls["n"] == 2
    p.encode_text(["a dog"])  # evicts "a corgi" (LRU size 2)
    assert calls["n"] == 3
    p.encode_text(["a cat"])  # still cached
    assert calls["n"] == 3
    p.encode_text(["a corgi"])  # was evicted -> re-encode
    assert calls["n"] == 4

    # batch identity is part of the key (states depend on shared padding)
    p.encode_text(["a corgi", "a cat"])
    assert calls["n"] == 5

    p0 = dataclasses.replace(pipe, byt5_encode_fn=counting_fn, text_cache_size=0)
    calls["n"] = 0
    p0.encode_text(["a corgi"])
    p0.encode_text(["a corgi"])
    assert calls["n"] == 2


def test_conditioning_lru_covers_clip_text(pipe):
    """conditioning() caches the full text bundle (ByT5 + CLIP text) for
    text-only requests; image conditioning bypasses the bundle cache."""
    calls = {"byt5": 0, "clip": 0}
    real_fn = pipe.byt5_encode_fn

    def byt5_fn(ids, mask):
        calls["byt5"] += 1
        return real_fn(ids, mask)

    def clip_fn(prompts):
        calls["clip"] += 1
        return jnp.zeros((len(prompts), pipe.model.config.clip_embd))

    def clip_img_fn(images):
        return jnp.zeros((images.shape[0], pipe.model.config.clip_embd))

    p = dataclasses.replace(
        pipe, byt5_encode_fn=byt5_fn, clip_text_fn=clip_fn,
        clip_image_fn=clip_img_fn, text_cache_size=4,
    )
    c1 = p.conditioning(["a corgi"])
    assert calls == {"byt5": 1, "clip": 1}
    c2 = p.conditioning(["a corgi"])
    assert calls == {"byt5": 1, "clip": 1}  # full-bundle hit
    np.testing.assert_array_equal(np.asarray(c1.byt5), np.asarray(c2.byt5))

    # image conditioning: bundle cache bypassed (fresh clip_image every call),
    # but the byt5 leg still hits encode_text's cache
    img = jnp.ones((1, 8, 8, 3)) * 0.5
    ci = p.conditioning(["a corgi"], images=img)
    assert ci.clip_image is not None
    assert calls["byt5"] == 1 and calls["clip"] == 2
