"""Structural-editing (attention reweighting) tests — parity with the semantics of
the reference's CustomMultiheadAttention path (utils/alter_attention.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from paella_tpu.config import PaellaConfig, SampleConfig
from paella_tpu.models import Paella, init_params
from paella_tpu.sampling import (
    Conditioning,
    build_cond_reweight,
    phrase_byte_span,
    reweight_for_phrase,
    sample,
)

CFG = PaellaConfig.tiny()


def test_phrase_byte_span():
    assert phrase_byte_span("a red car", "red") == (2, 5)
    assert phrase_byte_span("héllo red", "red") == (7, 10)  # é is 2 utf-8 bytes
    assert phrase_byte_span("abc", "zzz") is None


def test_build_cond_reweight_layout():
    w = build_cond_reweight(6, [(1, 3, 2.0)], clip_seq_len=4, has_clip=True)
    assert w.shape == (1, 10)
    np.testing.assert_allclose(w[0, :6], [1, 2, 2, 1, 1, 1])
    np.testing.assert_allclose(w[0, 6:], 1.0)


def test_reweight_changes_output_ones_is_identity():
    from tests._utils import assert_nontrivial, perturb

    model = Paella(CFG)
    params = init_params(model, jax.random.PRNGKey(0), (16, 16))
    params = perturb(params, jax.random.PRNGKey(99))
    x = jax.random.randint(jax.random.PRNGKey(1), (1, 16, 16), 0, CFG.num_labels)
    r = jnp.full((1,), 0.5)
    byt5 = jax.random.normal(jax.random.PRNGKey(2), (1, 6, CFG.byt5_embd))
    clip = jax.random.normal(jax.random.PRNGKey(3), (1, CFG.clip_embd))

    base = model.apply({"params": params}, x, r, byt5, clip)
    assert_nontrivial(base, "logits")
    ones = jnp.ones((1, 6 + CFG.clip_seq_len))
    with_ones = model.apply({"params": params}, x, r, byt5, clip, cond_reweight=ones)
    np.testing.assert_allclose(np.asarray(with_ones), np.asarray(base), rtol=1e-5, atol=1e-5)

    boosted = jnp.asarray(build_cond_reweight(6, [(0, 6, 4.0)], has_clip=True))
    with_boost = model.apply({"params": params}, x, r, byt5, clip, cond_reweight=boosted)
    assert not np.allclose(np.asarray(with_boost), np.asarray(base), rtol=1e-3, atol=1e-3)


def test_reweight_threads_through_sampler():
    model = Paella(CFG)
    params = init_params(model, jax.random.PRNGKey(0), (16, 16))
    cond = Conditioning(
        byt5=jax.random.normal(jax.random.PRNGKey(1), (1, 6, CFG.byt5_embd)),
        clip=jax.random.normal(jax.random.PRNGKey(2), (1, CFG.clip_embd)),
    )
    w = jnp.asarray(reweight_for_phrase("a red car", "red", 3.0, byt5_len=6, has_clip=True))
    out = sample(
        model,
        params,
        jax.random.PRNGKey(3),
        cond,
        (1, 16, 16),
        None,
        SampleConfig(steps=2, cfg=None),
        cond_reweight=w,
    )
    assert out.shape == (1, 16, 16)
