"""Text-to-image / inpaint / outpaint / interpolation / structural-editing demos.

The reference shipped these capabilities in a (now-stripped) Colab notebook
(reference: readme.md:39-41, paella_inference.ipynb in .MISSING_LARGE_BLOBS).
This script exercises every one through PaellaPipeline.

With converted reference checkpoints:
    python examples/generate.py --vqgan vqgan_f4.pt --denoiser paella_v3.pt \
        --byt5 byt5_xl.pt --prompt "a corgi wearing a top hat"

Without checkpoints it runs the tiny demo config with random weights (useful to
see the full API and timing; images are noise).
"""
from __future__ import annotations

import argparse
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np


def build_pipeline(args):
    from paella_tpu import PaellaConfig, VQConfig
    from paella_tpu.cond import T5Config, T5Encoder
    from paella_tpu.codec import VQModel
    from paella_tpu.models import Paella, init_params
    from paella_tpu.pipeline import PaellaPipeline

    if args.denoiser:
        from paella_tpu.convert import convert_paella, load_torch_state_dict
        from paella_tpu.cond.loader import load_byt5, load_vqgan

        p_cfg = PaellaConfig.v1_byt5_xl_inference()
        model = Paella(p_cfg)
        params = jax.tree_util.tree_map(
            jnp.asarray, convert_paella(load_torch_state_dict(args.denoiser), p_cfg)
        )
        vq, vq_vars = load_vqgan(args.vqgan)
        byt5_encode = load_byt5(args.byt5, T5Config.byt5_xl())
    else:
        print("[demo] no checkpoints given - tiny random-weight demo")
        p_cfg = dataclasses.replace(PaellaConfig.tiny(), byt5_embd=32)
        model = Paella(p_cfg)
        params = init_params(model, jax.random.PRNGKey(0), latent_hw=(16, 16))
        vq_cfg = VQConfig.tiny()
        vq = VQModel(vq_cfg)
        vq_vars = vq.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)))
        t5 = T5Encoder(T5Config.tiny())
        ids0 = jnp.zeros((1, 8), jnp.int32)
        t5_params = t5.init(jax.random.PRNGKey(2), ids0, jnp.ones((1, 8), bool))["params"]
        byt5_encode = jax.jit(lambda ids, mask: t5.apply({"params": t5_params}, ids, mask))

    return PaellaPipeline(
        model=model, params=params, vq=vq, vq_vars=vq_vars, byt5_encode_fn=byt5_encode
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompt", default="a painting of a corgi wearing a top hat")
    ap.add_argument("--vqgan", default=None)
    ap.add_argument("--denoiser", default=None)
    ap.add_argument("--byt5", default=None)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--size", type=int, default=None, help="image size (default: 256 full / 64 demo)")
    ap.add_argument("--out", default="out")
    args = ap.parse_args()

    from paella_tpu.config import SampleConfig
    from paella_tpu.sampling import fast_key, reweight_for_phrase
    from paella_tpu.utils import save_image_grid

    pipe = build_pipeline(args)
    size = args.size or (256 if args.denoiser else 64)
    cfg = SampleConfig(steps=args.steps)
    key = fast_key(42)

    # 1. text-to-image
    t0 = time.perf_counter()
    img = pipe.text_to_image([args.prompt], key, (size, size), cfg)
    img.block_until_ready()
    print(f"text_to_image: {img.shape} in {time.perf_counter()-t0:.2f}s (incl. compile)")
    save_image_grid(f"{args.out}_t2i.jpg", np.asarray(img))

    # 2. inpaint the right half of that image
    f = pipe.vq.config.downscale
    keep = jnp.zeros((1, size // f, size // f), bool).at[:, :, : size // f // 2].set(True)
    img2 = pipe.inpaint([args.prompt + ", sunset"], img, keep, fast_key(1), cfg)
    print("inpaint:", img2.shape)
    save_image_grid(f"{args.out}_inpaint.jpg", np.asarray(img2))

    # 3. outpaint onto a double-width canvas
    img3 = pipe.outpaint([args.prompt], img, (size, size * 2), (0, size // 2), fast_key(2), cfg)
    print("outpaint:", img3.shape)
    save_image_grid(f"{args.out}_outpaint.jpg", np.asarray(img3))

    # 4. img2img at reduced strength
    img4 = pipe.img2img([args.prompt + ", watercolor"], img, fast_key(3), strength=0.6, config=cfg)
    print("img2img:", img4.shape)

    # 5. latent interpolation between two samples
    imgB = pipe.text_to_image([args.prompt + " at night"], fast_key(4), (size, size), cfg)
    frames = pipe.interpolate(img[0], imgB[0], n=5)
    print("interpolate:", frames.shape)
    save_image_grid(f"{args.out}_interp.jpg", np.asarray(frames))

    # 6. structural editing: boost attention to one phrase
    phrase = args.prompt.split()[-1]
    ids_len = len(args.prompt.encode("utf-8")) + 1
    from paella_tpu.cond.tokenizers import pad_bucket

    w = reweight_for_phrase(args.prompt, phrase, 3.0, pad_bucket(ids_len), has_clip=False)
    img5 = pipe.text_to_image([args.prompt], fast_key(5), (size, size), cfg,
                              cond_reweight=jnp.asarray(np.concatenate([w, w], 0)))
    print("edited (boosted", repr(phrase), "):", img5.shape)


if __name__ == "__main__":
    main()
