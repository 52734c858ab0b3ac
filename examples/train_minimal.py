"""Minimal single-host training example — the counterpart of the reference's
pedagogical trainer (reference: src/train.py, with its two known bugs fixed per
SURVEY.md §2 component 17: the unreduced loss and the missing optimizer step).

Runs the tiny config on synthetic data out of the box:
    python examples/train_minimal.py --steps 20

Point it at real WebDataset shards + converted checkpoints for actual training:
    python examples/train_minimal.py --shards 'data/{00000..00099}.tar' \
        --vqgan vqgan_f4.pt --byt5 byt5_xl.pt --batch 64
"""
from __future__ import annotations

import argparse
import glob

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--shards", default=None)
    ap.add_argument("--vqgan", default=None)
    ap.add_argument("--byt5", default=None)
    ap.add_argument("--workdir", default="runs/minimal")
    ap.add_argument("--fsdp", type=int, default=1)
    args = ap.parse_args()

    from paella_tpu.config import PaellaConfig, TrainConfig, VQConfig
    from paella_tpu.codec import VQModel
    from paella_tpu.data import SyntheticDataset, WebDatasetLoader
    from paella_tpu.models import Paella
    from paella_tpu.train.driver import (
        DriverConfig,
        make_synthetic_encode_fn,
        run_training,
    )

    if args.vqgan:
        from paella_tpu.cond.loader import load_vqgan

        vq, vq_vars = load_vqgan(args.vqgan)
        p_cfg = PaellaConfig.v1_byt5_xl()
        image_size = 256
    else:
        p_cfg = PaellaConfig.tiny()
        vq = VQModel(VQConfig.tiny())
        image_size = 64
        vq_vars = vq.init(jax.random.PRNGKey(0), jnp.zeros((1, image_size, image_size, 3)))

    model = Paella(p_cfg)

    if args.byt5:
        from paella_tpu.cond import T5Config, byt5_batch_encode, pad_bucket
        from paella_tpu.cond.loader import load_byt5
        from paella_tpu.train import Batch, NullCond
        import numpy as np

        byt5_encode = load_byt5(args.byt5, T5Config.byt5_xl())

        def encode(images, captions):
            ids, mask = byt5_batch_encode(captions, max_length=768, pad_to=pad_bucket(1))
            states = byt5_encode(jnp.asarray(ids), jnp.asarray(mask))
            b = images.shape[0]
            return Batch(
                images=jnp.asarray(images),
                byt5=states,
                byt5_mask=jnp.asarray(mask),
                clip=jnp.zeros((b, p_cfg.clip_embd), jnp.float32),
                clip_image=jnp.zeros((b, p_cfg.clip_embd), jnp.float32),
            )

        ids0, mask0 = byt5_batch_encode([""])
        null = NullCond(
            byt5=byt5_encode(jnp.asarray(ids0), jnp.asarray(mask0)),
            byt5_mask=jnp.asarray(mask0),
            clip=jnp.zeros((1, p_cfg.clip_embd), jnp.float32),
        )
    else:
        encode, null = make_synthetic_encode_fn(p_cfg.byt5_embd, p_cfg.clip_embd)

    if args.shards:
        data = iter(WebDatasetLoader(sorted(glob.glob(args.shards)), args.batch, image_size))
    else:
        data = iter(SyntheticDataset(args.batch, image_size))

    run_training(
        model,
        vq,
        vq_vars,
        data,
        encode,
        null,
        TrainConfig(warmup_updates=min(100, args.steps)),
        DriverConfig(
            workdir=args.workdir,
            total_steps=args.steps,
            log_every=1,
            eval_every=max(args.steps // 2, 1),
            fsdp=args.fsdp,
        ),
        sample_eval=False,
    )


if __name__ == "__main__":
    main()
