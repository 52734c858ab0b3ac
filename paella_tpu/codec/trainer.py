"""VQGAN codec pretraining: reconstruction + codebook + adversarial losses.

The reference ships a patch Discriminator (src/vqgan.py:115-140) but contains no
codec training loop — its VQGAN arrives pretrained (SURVEY.md §2 component 16).
This module supplies that missing capability TPU-natively: one jit'd step updates
the autoencoder (L1 + L2 recon, VQ + commitment, non-saturating GAN loss) and the
spectral-norm discriminator (hinge loss), threading the codec's BatchNorm
batch_stats and the discriminator's power-iteration state through the step.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct


from .vqgan import Discriminator, VQModel

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class CodecTrainConfig:
    lr: float = 1e-4
    disc_lr: float = 1e-4
    recon_l1_weight: float = 1.0
    recon_l2_weight: float = 1.0
    vq_weight: float = 1.0  # applied to (vq_loss + 0.25 * commit), src/vqgan.py:95
    adv_weight: float = 0.1
    disc_start: int = 0  # steps before adversarial loss kicks in
    grad_clip: float = 1.0
    # Dead-code revival (0 disables): a code unused for `revive_after`
    # consecutive steps is re-seeded to a random encoder latent from the
    # current batch. Gradient-based VQ collapses without it — the codebook
    # init is tiny relative to the BatchNorm'd latent space, so a handful of
    # early winners absorb all gradient while AdamW weight-decay shrinks the
    # rest toward the origin (measured: 8/8192 codes after 1k steps on the
    # synthetic shards). Revival is in-jit and deterministic (PRNG folded
    # from the step counter).
    revive_after: int = 100


class CodecTrainState(struct.PyTreeNode):
    step: Array
    gen_vars: Any  # {'params', 'batch_stats'} of VQModel
    gen_opt: Any
    disc_vars: Any  # {'params', 'batch_stats'} of Discriminator (spectral-norm u/v)
    disc_opt: Any
    code_age: Array  # (K,) int32: consecutive steps each code went unused
    gen_tx: optax.GradientTransformation = struct.field(pytree_node=False)
    disc_tx: optax.GradientTransformation = struct.field(pytree_node=False)


def create_codec_train_state(
    vq: VQModel, disc: Discriminator, rng: Array, image_size: int = 256, cfg: CodecTrainConfig = CodecTrainConfig()
) -> CodecTrainState:
    k1, k2 = jax.random.split(rng)
    x = jnp.zeros((1, image_size, image_size, 3))
    gen_vars = jax.jit(lambda k: vq.init(k, x))(k1)
    disc_vars = jax.jit(lambda k: disc.init(k, x))(k2)

    def _no_decay_codebook(params):
        # AdamW weight decay shrinks codes that receive no gradient toward the
        # origin — on an embedding table that actively drives codebook collapse
        return jax.tree_util.tree_map_with_path(
            lambda path, _: not any(
                getattr(p, "key", None) == "codebook" for p in path
            ),
            params,
        )

    gen_tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(cfg.lr, mask=_no_decay_codebook),
    )
    disc_tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), optax.adamw(cfg.disc_lr))
    return CodecTrainState(
        step=jnp.zeros((), jnp.int32),
        gen_vars=gen_vars,
        gen_opt=gen_tx.init(gen_vars["params"]),
        disc_vars=disc_vars,
        disc_opt=disc_tx.init(disc_vars["params"]),
        code_age=jnp.zeros((vq.config.codebook_size,), jnp.int32),
        gen_tx=gen_tx,
        disc_tx=disc_tx,
    )


def make_codec_train_step(vq: VQModel, disc: Discriminator, cfg: CodecTrainConfig = CodecTrainConfig()):
    """Returns jittable step(state, images) -> (state, metrics)."""

    def gen_loss_fn(gen_params, state: CodecTrainState, images: Array):
        variables = {"params": gen_params, "batch_stats": state.gen_vars["batch_stats"]}
        (qe, z, idx, vq_loss), new_model_state = vq.apply(
            variables, images, True, method=VQModel.encode, mutable=["batch_stats"]
        )
        recon = vq.apply(variables, qe, method=VQModel.decode)
        l1 = jnp.mean(jnp.abs(recon - images))
        l2 = jnp.mean(jnp.square(recon - images))
        loss = cfg.recon_l1_weight * l1 + cfg.recon_l2_weight * l2 + cfg.vq_weight * vq_loss

        d_fake = disc.apply(state.disc_vars, recon, update_stats=False)
        # non-saturating generator loss on the sigmoid patch map
        g_adv = -jnp.mean(jnp.log(d_fake + 1e-6))
        adv_on = (state.step >= cfg.disc_start).astype(jnp.float32)
        loss = loss + cfg.adv_weight * adv_on * g_adv
        aux = {
            "recon_l1": l1,
            "recon_l2": l2,
            "vq_loss": vq_loss,
            "g_adv": g_adv,
            "recon": recon,
            "batch_stats": new_model_state["batch_stats"],
            # for dead-code revival: which codes this batch used, and the
            # BatchNorm-space latents (encode returns z / scale_factor)
            "idx": idx,
            "z_bn": jax.lax.stop_gradient(z) * vq.config.scale_factor,
        }
        return loss, aux

    def disc_loss_fn(disc_params, state: CodecTrainState, images: Array, recon: Array):
        variables = {"params": disc_params, **{k: v for k, v in state.disc_vars.items() if k != "params"}}
        d_real, new_state = disc.apply(
            variables, images, update_stats=True, mutable=["batch_stats"]
        )
        d_fake = disc.apply(variables, jax.lax.stop_gradient(recon), update_stats=False)
        # hinge on logits is standard; the reference discriminator ends in sigmoid
        # (src/vqgan.py:131), so use BCE on the patch probabilities
        loss = -jnp.mean(jnp.log(d_real + 1e-6)) - jnp.mean(jnp.log(1.0 - d_fake + 1e-6))
        return loss, (new_state, jnp.mean(d_real), jnp.mean(d_fake))

    def step(state: CodecTrainState, images: Array):
        (g_loss, aux), g_grads = jax.value_and_grad(gen_loss_fn, has_aux=True)(
            state.gen_vars["params"], state, images
        )
        g_updates, gen_opt = state.gen_tx.update(g_grads, state.gen_opt, state.gen_vars["params"])
        gen_params = optax.apply_updates(state.gen_vars["params"], g_updates)

        # --- dead-code revival --------------------------------------------
        K = vq.config.codebook_size
        used = jnp.zeros((K,), jnp.int32).at[aux["idx"].reshape(-1)].set(1)
        if cfg.revive_after > 0:
            age = jnp.where(used > 0, 0, state.code_age + 1)
            revive = age >= cfg.revive_after
            zf = aux["z_bn"].reshape(-1, vq.config.c_latent).astype(jnp.float32)
            key = jax.random.fold_in(jax.random.PRNGKey(0x5EED), state.step)
            rows = jax.random.randint(key, (K,), 0, zf.shape[0])
            cb = gen_params["vquantizer"]["codebook"]
            new_cb = jnp.where(revive[:, None], zf[rows].astype(cb.dtype), cb)
            gen_params = {
                **gen_params,
                "vquantizer": {**gen_params["vquantizer"], "codebook": new_cb},
            }
            code_age = jnp.where(revive, 0, age)
            n_revived = jnp.sum(revive)
        else:
            code_age = state.code_age
            n_revived = jnp.zeros((), jnp.int32)
        gen_vars = {"params": gen_params, "batch_stats": aux["batch_stats"]}

        (d_loss, (disc_state, d_real, d_fake)), d_grads = jax.value_and_grad(
            disc_loss_fn, has_aux=True
        )(state.disc_vars["params"], state, images, aux["recon"])
        d_updates, disc_opt = state.disc_tx.update(d_grads, state.disc_opt, state.disc_vars["params"])
        disc_params = optax.apply_updates(state.disc_vars["params"], d_updates)
        disc_vars = {"params": disc_params, **disc_state}

        new_state = state.replace(
            step=state.step + 1,
            gen_vars=gen_vars,
            gen_opt=gen_opt,
            disc_vars=disc_vars,
            disc_opt=disc_opt,
            code_age=code_age,
        )
        metrics = {
            "g_loss": g_loss,
            "d_loss": d_loss,
            "recon_l1": aux["recon_l1"],
            "vq_loss": aux["vq_loss"],
            "d_real": d_real,
            "d_fake": d_fake,
            "codes_used_batch": jnp.sum(used),
            "codes_revived": n_revived,
        }
        return new_state, metrics

    return step
