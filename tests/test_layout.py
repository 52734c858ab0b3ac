"""Even/odd-split skip-level layout (models/layout.py): a pure weight
permutation — the split-layout model must reproduce the standard model's
outputs (same logits, standard space) with the skip blocks' depthwise planes
built from contiguous half-slices instead of strided gathers."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from paella_tpu.config import PaellaConfig
from paella_tpu.models import Paella, init_params
from paella_tpu.models.layout import (
    default_split_levels,
    even_odd_perm,
    merge_skip_params,
    split_skip_params,
)

from tests._utils import perturb

# 3 levels so BOTH skip levels exercise the layout, incl. the level-1
# attention rules (kv_mapper / qkv rows / o cols) — the 1B topology in miniature
BASE = dataclasses.replace(
    PaellaConfig.tiny(),
    c_hidden=(128, 128, 128),
    nhead=(-1, 4, 4),
    blocks=(2, 2, 1),
    level_config=("CT", "CTA", "CTA"),
    dropout=(0.0, 0.0, 0.0),
    fused_blocks=True,
)
SPLIT = dataclasses.replace(BASE, split_skip_levels=(0, 1))


@pytest.fixture(scope="module")
def params():
    model = Paella(BASE)
    return perturb(
        init_params(model, jax.random.PRNGKey(0), latent_hw=(16, 16)),
        jax.random.PRNGKey(7),
    )


def make_inputs():
    x = jax.random.randint(jax.random.PRNGKey(1), (2, 16, 16), 0, BASE.num_labels)
    r = jnp.array([0.3, 0.8])
    byt5 = jax.random.normal(jax.random.PRNGKey(2), (2, 5, BASE.byt5_embd))
    clip = jax.random.normal(jax.random.PRNGKey(3), (2, BASE.clip_embd))
    return x, r, byt5, clip


def test_default_split_levels():
    assert default_split_levels(BASE) == (0, 1)  # deepest level has no skip
    assert default_split_levels(PaellaConfig.v1_byt5_xl()) == (0, 1)
    assert default_split_levels(PaellaConfig.tiny()) == ()  # not tile-aligned


@pytest.mark.slow
def test_split_layout_matches_standard(params):
    x, r, byt5, clip = make_inputs()
    sparams = split_skip_params(params, BASE)
    with pltpu.force_tpu_interpret_mode():
        want = Paella(BASE).apply({"params": params}, x, r, byt5, clip)
        got = Paella(SPLIT).apply({"params": sparams}, x, r, byt5, clip)
    w, g = np.asarray(want, np.float32), np.asarray(got, np.float32)
    assert np.abs(w).max() > 1e-3  # non-vacuous
    # identical math, only dot summation order differs (f32)
    np.testing.assert_allclose(g, w, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_split_layout_with_cond_cache(params):
    """The sampler path: gen_cond_cache hoists kv projections from the
    permuted kv_mapper weights — must match the uncached split forward."""
    x, r, byt5, clip = make_inputs()
    sparams = split_skip_params(params, BASE)
    model = Paella(SPLIT)
    with pltpu.force_tpu_interpret_mode():
        cache = model.apply(
            {"params": sparams}, byt5, clip, method=Paella.gen_cond_cache
        )
        got = model.apply({"params": sparams}, x, r, byt5, clip, cond_cache=cache)
        want = model.apply({"params": sparams}, x, r, byt5, clip)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), rtol=1e-5, atol=1e-5
    )


@pytest.mark.slow
def test_split_layout_with_w8a8(params):
    """The layout composes with int8 quantization (kernel_scale columns must
    permute with their fc2 kernels)."""
    from paella_tpu.quant import quantize_paella_int8

    x, r, byt5, clip = make_inputs()
    qparams = quantize_paella_int8(params, levels=(0, 1, 2), include_first=True)
    sq = split_skip_params(qparams, BASE)
    cfg_aq = dataclasses.replace(BASE, act_quant=True)
    with pltpu.force_tpu_interpret_mode():
        want = Paella(cfg_aq).apply({"params": qparams}, x, r, byt5, clip)
        got = Paella(
            dataclasses.replace(cfg_aq, split_skip_levels=(0, 1))
        ).apply({"params": sq}, x, r, byt5, clip)
    w, g = np.asarray(want, np.float32), np.asarray(got, np.float32)
    # The f32 pre-quant ops (LN/GRN stats) sum in permuted order, and a
    # last-ulp input difference can flip an s8 activation code by one step —
    # so a tiny fraction of outputs may differ by ~a couple 1/127 row-scale
    # steps (observed: 1/65536 elements, max |delta| 0.021). Bound that tail,
    # not bits.
    np.testing.assert_allclose(g, w, rtol=0.05, atol=0.03)
    assert (np.abs(g - w) > 0.03).mean() < 1e-4
    np.testing.assert_allclose(np.median(np.abs(g - w)), 0.0, atol=2e-3)


def test_split_merge_roundtrip(params):
    sp = split_skip_params(params, BASE)
    back = merge_skip_params(sp, BASE)
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(back)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the transform is not the identity
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(flat_a, jax.tree_util.tree_leaves(sp))
    )
    assert changed


def test_split_layout_requires_fused_inference(params):
    x, r, byt5, clip = make_inputs()
    sparams = split_skip_params(params, BASE)
    bad = dataclasses.replace(SPLIT, fused_blocks=False)
    with pytest.raises(ValueError, match="split_skip_levels"):
        Paella(bad).apply({"params": sparams}, x, r, byt5, clip)
    with pytest.raises(ValueError, match="split_skip_levels"):
        Paella(SPLIT).apply(
            {"params": sparams}, x, r, byt5, clip, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(0)},
        )


def test_even_odd_perm():
    E = even_odd_perm(8)
    np.testing.assert_array_equal(E, [0, 2, 4, 6, 1, 3, 5, 7])
    v = np.arange(8)
    assert (v[E][:4] == v[0::2]).all() and (v[E][4:] == v[1::2]).all()
