"""Codec (VQGAN) pretraining step: losses finite, recon improves, discriminator
spectral-norm state updates."""
import jax
import numpy as np

from paella_tpu.codec import Discriminator, VQModel
from paella_tpu.codec.trainer import (
    CodecTrainConfig,
    create_codec_train_state,
    make_codec_train_step,
)
from paella_tpu.config import VQConfig


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
