"""End-to-end generative correctness: train a tiny denoiser to memorize a token
grid, then the sampler must reproduce it from pure noise.

This closes the loop the unit tests can't: training signal -> weights -> iterative
renoising inference, all through the public APIs.
"""
import dataclasses

import jax
import jax.numpy as jnp
import optax
import pytest

from paella_tpu.config import PaellaConfig, SampleConfig
from paella_tpu.models import Paella, add_noise, get_loss_weight, init_params
from paella_tpu.sampling import Conditioning, sample
from paella_tpu.train import smoothed_weighted_ce

CFG = dataclasses.replace(
    PaellaConfig.tiny(), num_labels=32, dropout=(0.0, 0.0, 0.0)
)
H = W = 16


@pytest.mark.slow
def test_overfit_then_sample_reproduces_target():
    model = Paella(CFG)
    params = init_params(model, jax.random.PRNGKey(0), latent_hw=(H, W))

    target = jax.random.randint(jax.random.PRNGKey(1), (1, H, W), 0, CFG.num_labels)
    byt5 = jax.random.normal(jax.random.PRNGKey(2), (1, 3, CFG.byt5_embd))

    tx = optax.adam(3e-3)
    opt_state = tx.init(params)

    def loss_fn(p, key):
        k1, k2 = jax.random.split(key)
        t = jax.random.uniform(k1, (1,), minval=0.001, maxval=1.0)
        noised, mask = add_noise(k2, target, t, CFG.num_labels)
        logits = model.apply({"params": p}, noised, t, byt5)
        w = get_loss_weight(t, mask)
        return smoothed_weighted_ce(logits, target, w, 0.0)

    @jax.jit
    def step(p, o, key):
        loss, g = jax.value_and_grad(loss_fn)(p, key)
        updates, o = tx.update(g, o, p)
        return optax.apply_updates(p, updates), o, loss

    key = jax.random.PRNGKey(3)
    first = last = None
    for i in range(300):
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, k)
        if i == 0:
            first = float(loss)
    last = float(loss)
    assert last < first * 0.25, f"training did not converge: {first} -> {last}"

    out = sample(
        model,
        params,
        jax.random.PRNGKey(4),
        Conditioning(byt5=byt5),
        (1, H, W),
        None,
        SampleConfig(steps=8, cfg=None, temperature=(0.3, 0.1)),
    )
    agreement = float(jnp.mean((out == target).astype(jnp.float32)))
    assert agreement > 0.9, f"sampler reproduced only {agreement:.2%} of the memorized grid"
