"""Codec (VQGAN) pretraining step: losses finite, recon improves, discriminator
spectral-norm state updates."""
import jax
import pytest
import numpy as np

from paella_tpu.codec import Discriminator, VQModel
from paella_tpu.codec.trainer import (
    CodecTrainConfig,
    create_codec_train_state,
    make_codec_train_step,
)
from paella_tpu.config import VQConfig


@pytest.mark.slow
def test_codec_train_step_improves_recon():
    vq = VQModel(VQConfig.tiny())
    disc = Discriminator(c_hidden=32, depth=4)
    cfg = CodecTrainConfig(lr=3e-3, adv_weight=0.05)
    state = create_codec_train_state(vq, disc, jax.random.PRNGKey(0), image_size=32, cfg=cfg)
    step = jax.jit(make_codec_train_step(vq, disc, cfg))

    images = jax.random.uniform(jax.random.PRNGKey(1), (4, 32, 32, 3))
    losses = []
    for _ in range(5):
        state, metrics = step(state, images)
        losses.append(float(metrics["recon_l1"]))
        for k, v in metrics.items():
            assert np.isfinite(float(v)), f"{k} not finite"
    assert int(state.step) == 5
    assert losses[-1] < losses[0], f"recon did not improve: {losses}"
    assert 0.0 <= float(metrics["d_real"]) <= 1.0


@pytest.mark.slow
def test_dead_code_revival_resurrects_unused_codes():
    """Codes unused for `revive_after` steps are re-seeded to batch latents
    (and the codebook is exempt from AdamW decay, so live codes keep scale).
    Without revival the measured hardware run collapsed to 8/8192 codes."""
    import jax.numpy as jnp

    vq = VQModel(VQConfig.tiny())
    disc = Discriminator(c_hidden=32, depth=4)
    cfg = CodecTrainConfig(lr=1e-3, adv_weight=0.0, revive_after=2)
    state = create_codec_train_state(vq, disc, jax.random.PRNGKey(0), image_size=32, cfg=cfg)
    step = jax.jit(make_codec_train_step(vq, disc, cfg))

    K = vq.config.codebook_size
    images = jax.random.uniform(jax.random.PRNGKey(1), (4, 32, 32, 3))
    # a 32x32 batch has 4*8*8=256 positions; usage per batch << K, so most
    # codes age out and must be revived within a few steps
    revived_total = 0
    for _ in range(4):
        state, metrics = step(state, images)
        revived_total += int(metrics["codes_revived"])
        assert 0 < int(metrics["codes_used_batch"]) <= K
    assert revived_total > 0, "no code was ever revived"
    # revived codes sit at real latent coordinates, not the tiny +-1/K init box
    cb = np.asarray(state.gen_vars["params"]["vquantizer"]["codebook"])
    assert float(np.abs(cb).max()) > 10.0 / K
    assert np.isfinite(cb).all()


@pytest.mark.slow
def test_revival_off_keeps_codebook_shape_semantics():
    vq = VQModel(VQConfig.tiny())
    disc = Discriminator(c_hidden=32, depth=4)
    cfg = CodecTrainConfig(lr=1e-3, adv_weight=0.0, revive_after=0)
    state = create_codec_train_state(vq, disc, jax.random.PRNGKey(0), image_size=32, cfg=cfg)
    step = jax.jit(make_codec_train_step(vq, disc, cfg))
    images = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    state, metrics = step(state, images)
    assert int(metrics["codes_revived"]) == 0
    assert int(state.code_age.sum()) == 0  # ages untouched when disabled
