"""Shared case builder for the cross-process train-step test: the SAME global
computation (tiny Paella + frozen codec, dp x fsdp mesh, one real train step)
built identically by the 2-process workers and the single-process reference,
so the losses are directly comparable (GSPMD semantics are topology-free).

Everything device-resident is created INSIDE one jit from constants: in a
multi-controller run, host-local committed arrays cannot be fed to a global-
mesh jit, and building params/state on-device also mirrors how a real pod job
avoids materializing the full model per host.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def build_case(n_devices: int):
    """Returns (mesh, run(batch) -> (loss, step), batch_np)."""
    from paella_tpu.codec import VQModel
    from paella_tpu.config import PaellaConfig, TrainConfig, VQConfig
    from paella_tpu.models import Paella
    from paella_tpu.parallel import make_mesh, param_shardings
    from paella_tpu.train import Batch, NullCond, create_train_state, make_train_step

    fsdp = 2 if (n_devices % 2 == 0 and n_devices >= 4) else 1
    mesh = make_mesh(fsdp=fsdp, devices=jax.devices()[:n_devices])

    p_cfg = PaellaConfig.tiny()
    v_cfg = VQConfig.tiny()
    model, vq = Paella(p_cfg), VQModel(v_cfg)
    t_cfg = TrainConfig(warmup_updates=1)
    img, b = 32, n_devices

    # IDENTICAL examples: the global batch is order-invariant, so the loss is
    # insensitive to how processes map local rows to global positions
    g = np.random.default_rng(0)
    one_img = g.uniform(size=(1, img, img, 3)).astype(np.float32)
    one_byt5 = g.standard_normal((1, 4, p_cfg.byt5_embd)).astype(np.float32)
    one_clip = g.standard_normal((1, p_cfg.clip_embd)).astype(np.float32)
    batch_np = Batch(
        images=np.repeat(one_img, b, 0),
        byt5=np.repeat(one_byt5, b, 0),
        byt5_mask=np.ones((b, 4), bool),
        clip=np.repeat(one_clip, b, 0),
        clip_image=np.repeat(one_clip, b, 0),
    )

    def _init(k):
        x = jnp.zeros((1, img // 4, img // 4), jnp.int32)
        r = jnp.ones((1,), jnp.float32)
        byt5 = jnp.zeros((1, 4, p_cfg.byt5_embd), jnp.float32)
        clip = jnp.zeros((1, p_cfg.clip_embd), jnp.float32)
        return model.init(k, x, r, byt5, clip, clip, deterministic=True)["params"]

    shardings = param_shardings(
        jax.eval_shape(_init, jax.random.PRNGKey(0)), mesh, min_size=2**10
    )
    step_fn = make_train_step(model, vq, t_cfg)

    def run(batch):
        @jax.jit
        def fn(batch):
            params = _init(jax.random.PRNGKey(0))
            params = jax.tree_util.tree_map(
                jax.lax.with_sharding_constraint, params, shardings
            )
            state = create_train_state(params, t_cfg)
            vq_vars = vq.init(jax.random.PRNGKey(1), jnp.zeros((1, img, img, 3)))
            null = NullCond(
                byt5=jnp.zeros((1, 2, p_cfg.byt5_embd)),
                byt5_mask=jnp.ones((1, 2), bool),
                clip=jnp.zeros((1, p_cfg.clip_embd)),
            )
            new_state, metrics = step_fn(state, vq_vars, batch, null, jax.random.PRNGKey(3))
            return metrics["loss"], new_state.step

        loss, step = fn(batch)
        return float(loss), int(step)

    return mesh, run, batch_np


def build_sample_case(n_devices: int):
    """Same-global-computation builder for the cross-process SAMPLING test:
    the single-jit sampler (lax.scan, batched CFG) over a dp(xfsdp) mesh.
    Returns (mesh, run(cond_batch) -> tokens, cond_np). Params are built and
    PERTURBED inside one jit from constants (the zero-init head would make
    token parity vacuous — every arm would sample pure gumbel noise), exactly
    mirroring the multi-chip generation dryrun (__graft_entry__.py:123-146)."""
    from paella_tpu.config import PaellaConfig, SampleConfig
    from paella_tpu.models import Paella
    from paella_tpu.parallel import make_mesh, param_shardings
    from paella_tpu.sampling import Conditioning, sample

    fsdp = 2 if (n_devices % 2 == 0 and n_devices >= 4) else 1
    mesh = make_mesh(fsdp=fsdp, devices=jax.devices()[:n_devices])

    p_cfg = PaellaConfig.tiny()
    model = Paella(p_cfg)
    b, hw = n_devices, 8

    g = np.random.default_rng(0)
    cond_np = {
        "byt5": np.repeat(
            g.standard_normal((1, 4, p_cfg.byt5_embd)).astype(np.float32), b, 0
        ),
        "byt5_mask": np.ones((b, 4), bool),
        "clip": np.repeat(
            g.standard_normal((1, p_cfg.clip_embd)).astype(np.float32), b, 0
        ),
    }

    def _init(k):
        x = jnp.zeros((1, hw, hw), jnp.int32)
        r = jnp.ones((1,), jnp.float32)
        byt5 = jnp.zeros((1, 4, p_cfg.byt5_embd), jnp.float32)
        clip = jnp.zeros((1, p_cfg.clip_embd), jnp.float32)
        return model.init(k, x, r, byt5, clip, clip, deterministic=True)["params"]

    shardings = param_shardings(
        jax.eval_shape(_init, jax.random.PRNGKey(0)), mesh, min_size=2**10
    )

    def run(cond_batch):
        @jax.jit
        def make_params():
            params = _init(jax.random.PRNGKey(0))
            leaves, treedef = jax.tree_util.tree_flatten(params)
            keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
            leaves = [
                l + 0.02 * jax.random.normal(k, l.shape, l.dtype)
                for l, k in zip(leaves, keys)
            ]
            params = jax.tree_util.tree_unflatten(treedef, leaves)
            return jax.tree_util.tree_map(
                jax.lax.with_sharding_constraint, params, shardings
            )

        params = make_params()
        cond = Conditioning(
            byt5=cond_batch["byt5"],
            byt5_mask=cond_batch["byt5_mask"],
            clip=cond_batch["clip"],
        )
        uncond = Conditioning(
            byt5=jnp.zeros((b, 2, p_cfg.byt5_embd)),
            byt5_mask=jnp.ones((b, 2), bool),
            clip=jnp.zeros((b, p_cfg.clip_embd)),
        )
        return sample(
            model, params, jax.random.PRNGKey(5), cond, (b, hw, hw), uncond,
            SampleConfig(steps=3),
        )

    return mesh, run, cond_np
