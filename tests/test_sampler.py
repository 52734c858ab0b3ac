"""Sampler tests: single-jit compilation, determinism, CFG batching equivalence,
inpainting pinning, interpolation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paella_tpu.config import PaellaConfig, SampleConfig
from paella_tpu.models import Paella, init_params
from paella_tpu.sampling import Conditioning, interpolate_latents, merge_cfg_pair, outpaint_canvas, sample

CFG = PaellaConfig.tiny()
B, H, W = 1, 16, 16


@pytest.fixture(scope="module")
def model_and_params():
    model = Paella(CFG)
    params = init_params(model, jax.random.PRNGKey(0), latent_hw=(H, W))
    return model, params


def make_cond(key, with_image=False):
    k1, k2, k3 = jax.random.split(key, 3)
    return Conditioning(
        byt5=jax.random.normal(k1, (B, 5, CFG.byt5_embd)),
        clip=jax.random.normal(k2, (B, CFG.clip_embd)),
        clip_image=jax.random.normal(k3, (B, CFG.clip_embd)) if with_image else None,
    )


SAMPLE_CFG = SampleConfig(steps=3)


def test_sample_shapes_and_determinism(model_and_params):
    model, params = model_and_params
    cond = make_cond(jax.random.PRNGKey(1), with_image=True)
    uncond = make_cond(jax.random.PRNGKey(2), with_image=False)
    out1 = sample(model, params, jax.random.PRNGKey(3), cond, (B, H, W), uncond, SAMPLE_CFG)
    out2 = sample(model, params, jax.random.PRNGKey(3), cond, (B, H, W), uncond, SAMPLE_CFG)
    out3 = sample(model, params, jax.random.PRNGKey(4), cond, (B, H, W), uncond, SAMPLE_CFG)
    assert out1.shape == (B, H, W)
    assert out1.dtype == jnp.int32
    assert int(out1.min()) >= 0 and int(out1.max()) < CFG.num_labels
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert not np.array_equal(np.asarray(out1), np.asarray(out3))


def test_sample_without_cfg(model_and_params):
    model, params = model_and_params
    cond = make_cond(jax.random.PRNGKey(1))
    cfg = SampleConfig(steps=2, cfg=None)
    out = sample(model, params, jax.random.PRNGKey(0), cond, (B, H, W), None, cfg)
    assert out.shape == (B, H, W)


def test_inpainting_pins_fixed_tokens(model_and_params):
    model, params = model_and_params
    cond = make_cond(jax.random.PRNGKey(1))
    uncond = make_cond(jax.random.PRNGKey(2))
    fixed_tokens = jnp.full((B, H, W), 7, jnp.int32)
    fixed_mask = jnp.zeros((B, H, W), bool).at[:, :4, :].set(True)
    out = sample(
        model,
        params,
        jax.random.PRNGKey(5),
        cond,
        (B, H, W),
        uncond,
        SAMPLE_CFG,
        fixed_mask=fixed_mask,
        fixed_tokens=fixed_tokens,
    )
    np.testing.assert_array_equal(np.asarray(out[:, :4, :]), 7)
    assert not np.all(np.asarray(out[:, 4:, :]) == 7)


def test_merged_cfg_matches_separate_forwards(model_and_params):
    """The batched 2B CFG forward must equal two separate forwards — the core
    correctness claim of the TPU sampler design."""
    from tests._utils import assert_nontrivial, perturb

    model, params = model_and_params
    params = perturb(params, jax.random.PRNGKey(99))
    cond = make_cond(jax.random.PRNGKey(1), with_image=True)
    uncond = make_cond(jax.random.PRNGKey(2), with_image=False)
    merged = merge_cfg_pair(cond, uncond)

    x = jax.random.randint(jax.random.PRNGKey(3), (B, H, W), 0, CFG.num_labels)
    t = jnp.full((B,), 0.5)

    def fwd(c: Conditioning, xx, tt):
        return model.apply(
            {"params": params},
            xx,
            tt,
            c.byt5,
            c.clip,
            c.clip_image,
            byt5_mask=c.byt5_mask,
            clip_mask=c.clip_mask,
            clip_image_mask=c.clip_image_mask,
        )

    both = fwd(merged, jnp.concatenate([x, x]), jnp.concatenate([t, t]))
    assert_nontrivial(both, "logits")
    lc, lu = jnp.split(both, 2, axis=0)
    sep_c = fwd(
        Conditioning(cond.byt5, cond.clip, cond.clip_image), x, t
    )
    sep_u = fwd(Conditioning(uncond.byt5, uncond.clip, None), x, t)
    np.testing.assert_allclose(np.asarray(lc), np.asarray(sep_c), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(lu), np.asarray(sep_u), rtol=1e-4, atol=1e-4)


def test_interpolate_latents():
    cb = jax.random.normal(jax.random.PRNGKey(0), (32, 4))
    ia = jax.random.randint(jax.random.PRNGKey(1), (8, 8), 0, 32)
    ib = jax.random.randint(jax.random.PRNGKey(2), (8, 8), 0, 32)
    out = interpolate_latents(ia, ib, cb, jnp.array([0.0, 0.5, 1.0]))
    assert out.shape == (3, 8, 8)
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(ia))
    np.testing.assert_array_equal(np.asarray(out[2]), np.asarray(ib))


def test_outpaint_canvas():
    tokens = jnp.ones((1, 4, 4), jnp.int32)
    canvas, mask = outpaint_canvas(tokens, (8, 8), (2, 2), 128, jax.random.PRNGKey(0))
    assert canvas.shape == (1, 8, 8) and mask.shape == (1, 8, 8)
    np.testing.assert_array_equal(np.asarray(canvas[0, 2:6, 2:6]), 1)
    assert int(mask.sum()) == 16


def test_scalar_cfg_and_conditional_steps(model_and_params):
    """Scalar cfg (simple-sampler form, reference src/utils.py:35) and a
    sampling_conditional_steps cutoff both run and produce valid grids."""
    model, params = model_and_params
    cond = make_cond(jax.random.PRNGKey(1))
    uncond = make_cond(jax.random.PRNGKey(2))
    cfg = SampleConfig(steps=3, cfg=6.0, sampling_conditional_steps=2)
    out = sample(model, params, jax.random.PRNGKey(0), cond, (B, H, W), uncond, cfg)
    assert out.shape == (B, H, W)
    assert int(out.max()) < CFG.num_labels


def test_conditional_steps_cutoff_equivalence(model_and_params):
    """The cutoff splits the scan into a CFG phase and a cond-only phase (the
    uncond forward is skipped, as in src_distributed/utils.py:116). With cfg
    weight 1.0 the mixed logits equal the conditional logits, so ANY cutoff must
    give bit-identical samples — this pins RNG threading and the cond-only
    forward's equivalence to the cond half of the merged batch."""
    from tests._utils import perturb

    model, params = model_and_params
    params = perturb(params, jax.random.PRNGKey(99))
    cond = make_cond(jax.random.PRNGKey(1), with_image=True)
    uncond = make_cond(jax.random.PRNGKey(2), with_image=False)
    key = jax.random.PRNGKey(7)
    full = sample(
        model, params, key, cond, (B, H, W), uncond,
        SampleConfig(steps=3, cfg=1.0, sampling_conditional_steps=3),
    )
    cut = sample(
        model, params, key, cond, (B, H, W), uncond,
        SampleConfig(steps=3, cfg=1.0, sampling_conditional_steps=1),
    )
    np.testing.assert_array_equal(np.asarray(full), np.asarray(cut))


def test_schedule_values_do_not_recompile(model_and_params):
    """cfg weights / temperatures / t-span / renoise_steps are traced operands
    (round-2 VERDICT: serve.py recompiled per distinct cfg value). Only the
    schedule STRUCTURE (steps, cutoff, impl) may key the compile cache."""
    from paella_tpu.sampling import sampler as S

    model, params = model_and_params
    cond = make_cond(jax.random.PRNGKey(1))
    uncond = make_cond(jax.random.PRNGKey(2))

    base = SampleConfig(steps=2, cfg=(8.0, 8.0))
    sample(model, params, jax.random.PRNGKey(0), cond, (B, H, W), uncond, base)
    n0 = S._sample_jit._cache_size()
    for variant in (
        SampleConfig(steps=2, cfg=4.0),
        SampleConfig(steps=2, cfg=(7.0, 1.5), temperature=(1.0, 0.1)),
        SampleConfig(steps=2, cfg=2.0, t_start=0.9, t_end=0.05),
        SampleConfig(steps=2, cfg=2.0, renoise_steps=0),
    ):
        sample(model, params, jax.random.PRNGKey(0), cond, (B, H, W), uncond, variant)
    assert S._sample_jit._cache_size() == n0

    # structural change (steps) legitimately compiles a new program
    sample(
        model, params, jax.random.PRNGKey(0), cond, (B, H, W), uncond,
        SampleConfig(steps=3, cfg=2.0),
    )
    assert S._sample_jit._cache_size() == n0 + 1


@pytest.mark.parametrize("impl", ["threefry2x32", "rbg"])
def test_batched_keys_per_image_determinism(model_and_params, impl):
    """sample() with a (B,) batched key: image i is bit-identical to sampling
    it ALONE with key i — per-image PRNG streams independent of batch
    composition (the serving micro-batching determinism contract). rbg is the
    case that matters in production (serve.py uses fast_key): vmapped
    jax.random draws over rbg keys are NOT per-lane reproducible, which is
    why per-image mode uses counter-hash draws instead."""
    model, params = model_and_params
    nb = 3
    k = jax.random.PRNGKey(9)
    cond = Conditioning(
        byt5=jax.random.normal(k, (nb, 5, CFG.byt5_embd)),
        clip=jax.random.normal(jax.random.fold_in(k, 1), (nb, CFG.clip_embd)),
    )
    uncond = Conditioning(
        byt5=jax.random.normal(jax.random.fold_in(k, 2), (nb, 5, CFG.byt5_embd)),
        clip=jax.random.normal(jax.random.fold_in(k, 3), (nb, CFG.clip_embd)),
    )
    keys = jnp.stack([jax.random.key(100 + i, impl=impl) for i in range(nb)])
    batched = np.asarray(
        sample(model, params, keys, cond, (nb, H, W), uncond, SAMPLE_CFG)
    )

    def slice_cond(c, i):
        return Conditioning(byt5=c.byt5[i : i + 1], clip=c.clip[i : i + 1])

    for i in range(nb):
        solo = sample(
            model, params, keys[i : i + 1], slice_cond(cond, i), (1, H, W),
            slice_cond(uncond, i), SAMPLE_CFG,
        )
        np.testing.assert_array_equal(batched[i], np.asarray(solo)[0])

    # key-count/batch mismatch is rejected
    with pytest.raises(ValueError, match="batched key"):
        sample(model, params, keys[:2], cond, (nb, H, W), uncond, SAMPLE_CFG)
