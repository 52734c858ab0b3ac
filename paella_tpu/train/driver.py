"""Training driver: the end-to-end loop the reference runs per-GPU-process
(reference: src_distributed/train.py:33-189), as one mesh-wide program.

What the reference does per iteration — fetch batch, frozen-encode conditioning,
VQGAN-encode, noise, UNet fwd/bwd under AMP, clip, AdamW step, warmup, every 2000
steps checkpoint + sample an eval grid + log — happens here with the compute
under ONE pjit'd train_step, frozen text/image encoders invoked outside it, Orbax
checkpoints, JSONL metrics, and eval images decoded through the codec.

Multi-process TPU pods: call jax.distributed.initialize() before run_training —
that single call replaces the reference's ddp_setup + mp.spawn + SLURM rank math
(src_distributed/utils.py:85-94, train.py:186-189, run/run.sh).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, Iterator, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..codec.vqgan import VQModel
from ..config import SampleConfig, TrainConfig
from ..models.denoiser import Paella, init_params
from ..parallel.mesh import batch_sharding, make_mesh, replicated, shard_params
from ..sampling.sampler import Conditioning, sample
from .checkpoints import CheckpointManager
from .trainer import Batch, NullCond, TrainState, create_train_state, make_train_step

Array = jax.Array
EncodeFn = Callable[[np.ndarray, Sequence[str]], Batch]


@dataclasses.dataclass
class DriverConfig:
    workdir: str = "runs/paella"
    total_steps: int = 1_500_000  # reference: updates=1.5M (src_distributed/train.py:14)
    log_every: int = 50
    eval_every: int = 2000  # reference: print_every (src_distributed/train.py:19)
    eval_prompts: Tuple[str, ...] = (
        "a photo of a corgi wearing a top hat",
        "an oil painting of a lighthouse in a storm",
    )
    eval_steps: int = 8
    fsdp: int = 1
    max_keep: int = 3


def run_training(
    model: Paella,
    vq: VQModel,
    vq_vars: Any,
    data_iter: Iterator[Tuple[np.ndarray, Sequence[str]]],
    encode_batch: EncodeFn,
    null_cond: NullCond,
    train_cfg: TrainConfig = TrainConfig(),
    driver_cfg: DriverConfig = DriverConfig(),
    params: Any = None,
    mesh=None,
    sample_eval: bool = True,
) -> TrainState:
    """Run (or resume) training. Returns the final TrainState.

    data_iter yields (images NHWC [0,1] numpy, captions); encode_batch runs the
    frozen conditioning encoders (ByT5/CLIP) and assembles a Batch.
    """
    workdir = driver_cfg.workdir
    os.makedirs(workdir, exist_ok=True)
    from ..utils.logging import MetricLogger, StepTimer, save_image_grid

    mesh = mesh if mesh is not None else make_mesh(fsdp=driver_cfg.fsdp)
    logger = MetricLogger(workdir, print_every=driver_cfg.log_every)
    ckpt = CheckpointManager(
        os.path.join(workdir, "checkpoints"),
        max_to_keep=driver_cfg.max_keep,
        save_interval=driver_cfg.eval_every,
    )

    # init or resume (reference restores model/optimizer/scheduler/scaler,
    # src_distributed/train.py:60-67 — here the whole TrainState round-trips)
    f = vq.config.downscale
    if params is None:
        params = init_params(model, jax.random.PRNGKey(train_cfg.seed), latent_hw=(64 // f * f, 64))
    state = create_train_state(params, train_cfg)
    if driver_cfg.fsdp > 1:
        sharded = shard_params(state.params, mesh)
        state = state.replace(params=sharded, opt_state=state.tx.init(sharded))
    # commit every leaf to the mesh (replicated unless already fsdp-sharded) so
    # both fresh and checkpoint-restored runs feed consistently-placed arrays
    from jax.sharding import NamedSharding

    rep = replicated(mesh)
    state = jax.tree_util.tree_map(
        lambda x: x
        if isinstance(getattr(x, "sharding", None), NamedSharding)
        else jax.device_put(x, rep),
        state,
    )
    restored, _ = ckpt.restore(state)
    if restored is not None:
        # orbax restores onto the default device; re-place every leaf onto the
        # sharding of the (mesh-placed) template so the jitted step sees
        # consistently-sharded inputs
        state = jax.tree_util.tree_map(
            lambda r, t: jax.device_put(r, t.sharding) if hasattr(t, "sharding") else r,
            restored,
            state,
        )
        print(f"[driver] resumed at step {int(state.step)}")

    step_fn = jax.jit(make_train_step(model, vq, train_cfg))
    rng = jax.random.PRNGKey(train_cfg.seed + 1)
    bsh = batch_sharding(mesh)
    timer = StepTimer()

    start = int(state.step)
    with mesh:
        n_data = mesh.shape["dp"] * mesh.shape["fsdp"]
        for it in range(start, driver_cfg.total_steps):
            images, captions = next(data_iter)
            if images.shape[0] % n_data:
                raise ValueError(
                    f"batch size {images.shape[0]} must be divisible by the mesh's "
                    f"data extent dp*fsdp={n_data}"
                )
            batch = encode_batch(images, captions)
            batch = jax.tree_util.tree_map(lambda x: jax.device_put(x, bsh), batch)
            state, metrics = step_fn(state, vq_vars, batch, null_cond, rng)
            timer.tick()

            step = int(state.step)
            if step % driver_cfg.log_every == 0:
                metrics = {k: float(v) for k, v in metrics.items()}
                metrics["steps_per_sec"] = timer.steps_per_sec
                metrics["images_per_sec"] = timer.steps_per_sec * images.shape[0]
                logger.log(step, metrics)

            if step % driver_cfg.eval_every == 0 or step == driver_cfg.total_steps:
                ckpt.save(step, state)
                if sample_eval:
                    _eval_grid(
                        model, state.params, vq, vq_vars, encode_batch, driver_cfg, step, workdir
                    )
    ckpt.wait()
    logger.close()
    return state


def _eval_grid(model, params, vq, vq_vars, encode_batch, driver_cfg, step, workdir):
    """Sample an eval image grid (the reference's per-checkpoint collage,
    src_distributed/train.py:140-180)."""
    from ..utils.logging import save_image_grid

    prompts = list(driver_cfg.eval_prompts)
    b = len(prompts)
    dummy_images = np.zeros((b, 256, 256, 3), np.float32)
    batch = encode_batch(dummy_images, prompts)
    uncond_batch = encode_batch(dummy_images, [""] * b)
    cond = Conditioning(byt5=batch.byt5, byt5_mask=batch.byt5_mask, clip=batch.clip)
    uncond = Conditioning(
        byt5=uncond_batch.byt5, byt5_mask=uncond_batch.byt5_mask, clip=uncond_batch.clip
    )
    f = vq.config.downscale
    latent = (b, 256 // f, 256 // f)
    tokens = sample(
        model,
        params,
        jax.random.PRNGKey(step),
        cond,
        latent,
        uncond,
        SampleConfig(steps=driver_cfg.eval_steps),
    )
    images = vq.apply(vq_vars, tokens, method=VQModel.decode_indices)
    out = os.path.join(workdir, f"eval_{step:07d}.jpg")
    if save_image_grid(out, np.asarray(jnp.clip(images, 0, 1))):
        print(f"[driver] wrote {out}")


def make_synthetic_encode_fn(
    byt5_embd: int, clip_embd: int, seq_len: int = 16
) -> tuple[EncodeFn, NullCond]:
    """Deterministic hash-based 'encoders' for smoke tests without real ByT5/CLIP:
    caption -> pseudo-embeddings. Stable across calls for the same caption."""

    def embed_text(caption: str) -> np.ndarray:
        seed = abs(hash(caption)) % (2**31)
        rng = np.random.default_rng(seed)
        return rng.standard_normal((seq_len, byt5_embd), dtype=np.float32) * 0.1

    def encode(images: np.ndarray, captions: Sequence[str]) -> Batch:
        b = images.shape[0]
        byt5 = np.stack([embed_text(c) for c in captions])
        clip = byt5[:, 0, : min(clip_embd, byt5_embd)]
        if clip.shape[1] < clip_embd:
            clip = np.pad(clip, ((0, 0), (0, clip_embd - clip.shape[1])))
        return Batch(
            images=jnp.asarray(images),
            byt5=jnp.asarray(byt5),
            byt5_mask=jnp.ones((b, seq_len), bool),
            clip=jnp.asarray(clip),
            clip_image=jnp.zeros((b, clip_embd), jnp.float32),
        )

    null = NullCond(
        byt5=jnp.asarray(embed_text(""))[None],
        byt5_mask=jnp.ones((1, seq_len), bool),
        clip=jnp.zeros((1, clip_embd), jnp.float32),
    )
    return encode, null
