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
from ..parallel.mesh import batch_sharding, make_mesh, param_shardings, replicated, shard_params
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
    # save a final checkpoint and return cleanly on SIGTERM/SIGINT — the
    # preemption contract of managed TPU pools (the reference loses up to
    # print_every=2000 steps of work on preemption; here at most one step)
    graceful_preemption: bool = True
    # overlap the NEXT batch's conditioning encodes with the current train
    # step: a producer thread pulls batch N+1, runs the frozen-encoder
    # dispatches (tunnel round-trips release the GIL), and device_puts —
    # while step N executes. 0 = synchronous (the pre-round-5 behavior).
    # This is the role torch DataLoader workers play for the reference
    # (src_distributed/utils.py:62) extended to the ENCODER dispatches.
    encode_prefetch: int = 1


class _PreemptionGuard:
    """Converts SIGTERM/SIGINT into a cooperative stop flag for the training
    loop. Managed TPU pools deliver SIGTERM with a grace window before
    killing the host; the loop checks `stop_requested` each iteration, saves
    a final checkpoint, and returns. A SECOND signal restores the previous
    handler and re-delivers, so a stuck step (first-compile minutes, blocked
    data iterator) can still be killed with a repeated Ctrl-C/SIGTERM instead
    of requiring SIGKILL. No-ops when not on the main thread (signal.signal
    raises there)."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.stop_requested = False
        self._prev = {}

    def __enter__(self):
        if not self.enabled:
            return self
        import signal

        def handler(signum, frame):
            if self.stop_requested:  # second signal: give up on gracefulness
                signal.signal(signum, self._prev.get(signum, signal.SIG_DFL))
                os.kill(os.getpid(), signum)
                return
            self.stop_requested = True
            print(f"[driver] caught signal {signum}: finishing step, saving, exiting")

        try:
            for sig in (signal.SIGTERM, signal.SIGINT):
                self._prev[sig] = signal.signal(sig, handler)
        except ValueError:  # not the main thread
            self._prev = {}
        return self

    def __exit__(self, *exc):
        import signal

        for sig, prev in self._prev.items():
            signal.signal(sig, prev)
        return False


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
    from jax.sharding import NamedSharding

    rep = replicated(mesh)
    latest = ckpt.latest_step()
    if latest is not None:
        # Resume path: the template is ABSTRACT (jax.eval_shape) and carries the
        # target shardings, so orbax restores every leaf straight onto its mesh
        # placement. Materializing a concrete template first would hold TWO
        # generations of the state in HBM during restore — at 662M (5.3 GB
        # state) next to the 4.6 GB frozen towers that OOMs a 16 GB v5e.
        def _build_state():
            p = params
            if p is None:
                p = init_params(
                    model, jax.random.PRNGKey(train_cfg.seed), latent_hw=(64 // f * f, 64)
                )
            return create_train_state(p, train_cfg)

        abstract = jax.eval_shape(_build_state)
        if driver_cfg.fsdp > 1:
            # param_shardings' rules are shape/path-based, so applying them over
            # the WHOLE state shards the Adam moments exactly like their params
            # (mirroring what eager tx.init(sharded) produces on the fresh path)
            shardings = param_shardings(abstract, mesh)
        else:
            shardings = jax.tree_util.tree_map(lambda _: rep, abstract)
        template = jax.tree_util.tree_map(
            lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
            abstract,
            shardings,
        )
        state, _ = ckpt.restore(template, step=latest)
        print(f"[driver] resumed at step {int(state.step)}")
    else:
        if params is None:
            params = init_params(
                model, jax.random.PRNGKey(train_cfg.seed), latent_hw=(64 // f * f, 64)
            )
        state = create_train_state(params, train_cfg)
        if driver_cfg.fsdp > 1:
            sharded = shard_params(state.params, mesh)
            state = state.replace(params=sharded, opt_state=state.tx.init(sharded))
        # commit every leaf to the mesh (replicated unless already fsdp-sharded) so
        # fresh runs feed consistently-placed arrays
        state = jax.tree_util.tree_map(
            lambda x: x
            if isinstance(getattr(x, "sharding", None), NamedSharding)
            else jax.device_put(x, rep),
            state,
        )

    # donate the TrainState: params + Adam moments are the dominant HBM residents
    # (12 GB f32 at 1B) and the old state is dead once the step returns — without
    # donation XLA must hold both generations live across every update
    step_fn = jax.jit(make_train_step(model, vq, train_cfg), donate_argnums=(0,))
    rng = jax.random.PRNGKey(train_cfg.seed + 1)
    bsh = batch_sharding(mesh)
    timer = StepTimer()

    start = int(state.step)
    with mesh, _PreemptionGuard(driver_cfg.graceful_preemption) as guard:
        n_data = mesh.shape["dp"] * mesh.shape["fsdp"]

        def _encoded_batches():
            """(images, captions, ready-to-step Batch) stream. Run through a
            background thread (encode_prefetch>0) this does batch N+1's host
            decode, tokenization, encoder dispatches and device_puts while
            step N runs — JAX dispatch is async and thread-safe, and the
            arrays are only consumed next iteration. Eval batches are drawn
            from THIS stream too (single consumer of data_iter; a raw
            next(data_iter) in the eval path would race the producer)."""
            for images, captions in data_iter:
                if images.shape[0] % n_data:
                    raise ValueError(
                        f"batch size {images.shape[0]} must be divisible by the "
                        f"mesh's data extent dp*fsdp={n_data}"
                    )
                batch = encode_batch(images, captions)
                batch = jax.tree_util.tree_map(
                    lambda x: jax.device_put(x, bsh), batch
                )
                yield images, captions, batch

        from ..data.prefetch import background_iterator as _bg

        enc_iter = (
            _bg(_encoded_batches(), depth=driver_cfg.encode_prefetch)
            if driver_cfg.encode_prefetch > 0
            else _encoded_batches()
        )
        for it in range(start, driver_cfg.total_steps):
            images, captions, batch = next(enc_iter)
            state, metrics = step_fn(state, vq_vars, batch, null_cond, rng)
            timer.tick()

            step = int(state.step)
            if step % driver_cfg.log_every == 0:
                metrics = {k: float(v) for k, v in metrics.items()}
                metrics["steps_per_sec"] = timer.steps_per_sec
                metrics["images_per_sec"] = timer.steps_per_sec * images.shape[0]
                logger.log(step, metrics)

            if guard.stop_requested:
                ckpt.save(step, state, force=True)
                print(f"[driver] preemption checkpoint saved at step {step}")
                break

            if step % driver_cfg.eval_every == 0 or step == driver_cfg.total_steps:
                # force at total_steps: Orbax's save_interval gate otherwise
                # silently skips the FINAL checkpoint whenever total_steps
                # isn't a multiple of eval_every (observed on the real-chip
                # 500-step run: last save rotated out at 450)
                ckpt.save(step, state, force=(step == driver_cfg.total_steps))
                if sample_eval:
                    eval_images, eval_captions, _ = next(enc_iter)
                    _eval_grid(
                        model, state.params, vq, vq_vars, encode_batch, driver_cfg,
                        step, workdir, images=eval_images, captions=eval_captions,
                        logger=logger,
                    )
    ckpt.wait()
    logger.close()
    return state


# Cached jits for the eval collage: eager flax `.apply` is fine on local CPU
# but on a tunneled TPU backend every primitive is a host round-trip — a single
# eager 280M forward is thousands of dispatches (minutes). Keyed by object id:
# the model/codec instances live for the whole run.
_EVAL_JIT_CACHE: dict = {}


def _eval_jit(tag, model, vq, make):
    key = (tag, id(model), id(vq))
    if key not in _EVAL_JIT_CACHE:
        _EVAL_JIT_CACHE[key] = make()
    return _EVAL_JIT_CACHE[key]


def _make_diag_fn(model, vq):
    """One jit for the diagnostic rows: codec encode -> noise -> single forward
    -> soft-argmax re-quantize -> decode noised + reconstructed images."""
    from ..codec.quantize import codebook_lookup
    from ..models.noise import add_noise

    @jax.jit
    def diag(params, vq_vars, images, byt5, clip, clip_image, byt5_mask, key):
        b = images.shape[0]
        k_t, k_noise = jax.random.split(key)
        latents = vq.apply(vq_vars, images, method=VQModel.encode)[2]
        t = jnp.clip(1.0 - jax.random.uniform(k_t, (b,)) + 0.001, 0.001, 1.0)
        noised, _ = add_noise(k_noise, latents, t, model.config.num_labels)
        logits = model.apply(
            {"params": params}, noised, t, byt5, clip, clip_image,
            byt5_mask=byt5_mask, deterministic=True,
        )
        codebook = vq_vars["params"]["vquantizer"]["codebook"]
        soft = jax.nn.softmax(logits.astype(jnp.float32) / 0.1, axis=-1) @ codebook
        pred_tokens = codebook_lookup(soft, codebook)
        noised_img = vq.apply(vq_vars, noised, method=VQModel.decode_indices)
        pred_img = vq.apply(vq_vars, pred_tokens, method=VQModel.decode_indices)
        return noised_img, pred_img

    return diag


def _eval_grid(
    model, params, vq, vq_vars, encode_batch, driver_cfg, step, workdir,
    images=None, captions=None, logger=None,
):
    """The reference's per-checkpoint eval collage (src_distributed/train.py:140-183):
    five rows — originals / noised inputs / single-forward soft-argmax
    reconstruction / sampled (with CLIP image conditioning) / sampled without it
    — written as one jpg, plus a wandb image table when logging is wired.

    With no `images` supplied falls back to sampling driver_cfg.eval_prompts
    only (the two sampled rows). The reference reconstructs the previous TRAIN
    batch's noised latents against the NEW eval batch's embeddings (a latent
    mismatch); here all rows use the same eval batch.
    """
    from ..utils.logging import save_image_grid

    if images is None:
        captions = list(driver_cfg.eval_prompts)
        images = np.zeros((len(captions), 256, 256, 3), np.float32)
        with_diag_rows = False
    else:
        captions = list(captions)
        with_diag_rows = True
    b, res = len(captions), images.shape[1]

    batch = encode_batch(np.asarray(images, np.float32), captions)
    uncond_batch = encode_batch(np.zeros_like(np.asarray(images, np.float32)), [""] * b)
    cond = Conditioning(
        byt5=batch.byt5, byt5_mask=batch.byt5_mask, clip=batch.clip,
        clip_image=batch.clip_image if with_diag_rows else None,
    )
    cond_noimg = Conditioning(byt5=batch.byt5, byt5_mask=batch.byt5_mask, clip=batch.clip)
    uncond = Conditioning(
        byt5=uncond_batch.byt5, byt5_mask=uncond_batch.byt5_mask, clip=uncond_batch.clip
    )

    f = vq.config.downscale
    latent = (b, res // f, res // f)
    s_cfg = SampleConfig(steps=driver_cfg.eval_steps)
    key = jax.random.PRNGKey(step)

    decode = _eval_jit(
        "decode", model, vq,
        lambda: jax.jit(lambda v, tok: vq.apply(v, tok, method=VQModel.decode_indices)),
    )
    rows, names = [], []
    table = {}
    if with_diag_rows:
        # originals + noised + argmax-reconstruction (the cheapest training
        # sanity signal: one forward, soft-argmax through the codebook and
        # decode). DELIBERATE delta from the reference: src_distributed/
        # train.py:155-157 takes a HARD argmax over the logits; here a T=0.1
        # softmax @ codebook then nearest-neighbor re-quantize — visually
        # smoother early in training, converges to the same picture as logits
        # sharpen. Diagnostics-only; no training/sampling math depends on it.
        diag = _eval_jit("diag", model, vq, lambda: _make_diag_fn(model, vq))
        noised_img, pred_img = diag(
            params, vq_vars, jnp.asarray(images), batch.byt5, batch.clip,
            batch.clip_image, batch.byt5_mask, jax.random.fold_in(key, 1),
        )
        rows += [np.asarray(images), np.asarray(noised_img), np.asarray(pred_img)]
        names += ["orig", "noised", "reconstructed"]

    tokens = sample(model, params, key, cond, latent, uncond, s_cfg)
    sampled = np.asarray(decode(vq_vars, tokens))
    rows.append(sampled)
    names.append("sampled")
    if with_diag_rows:
        tokens_noimg = sample(model, params, key, cond_noimg, latent, uncond, s_cfg)
        sampled_noimg = np.asarray(decode(vq_vars, tokens_noimg))
        rows.append(sampled_noimg)
        names.append("sampled_noimg")
        table = {"Sampled": sampled, "Sampled NoImg": sampled_noimg, "Orig": rows[0]}
    else:
        table = {"Sampled": sampled}

    out = os.path.join(workdir, f"eval_{step:07d}.jpg")
    if save_image_grid(out, [np.clip(r, 0, 1) for r in rows]):
        print(f"[driver] wrote {out} (rows: {', '.join(names)})")
    if logger is not None:
        logger.log_images(step, table, captions=captions)
    return names


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
