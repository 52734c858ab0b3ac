"""Production-driver end-to-end run on the real chip (round-3 VERDICT item 1).

Exercises the reference's actual production artifact — the long-running
per-process trainer (reference: src_distributed/train.py:74-183) — as the full
paella_tpu production path, all on ONE chip:

    WebDataset tar shards -> metadata filter -> native JPEG decode/resize/crop
    -> frozen ByT5-XL + CLIP ViT-H (text+vision) conditioning encodes
    -> donated pjit train step (codec encode + denoiser fwd/bwd + AdamW)
    -> Orbax checkpoints at interval -> eval collages
    -> graceful SIGTERM preemption -> crash-restart resume.

Encoder weights are synthetic (this box has no network egress and no released
checkpoints) at the REAL production geometries (T5Config.byt5_xl,
CLIPText/VisionConfig.vit_h_14); every code path is the production one.

Protocol (what the round-4 artifact records):

    python scripts/run_driver_e2e.py --steps 500 &      # phase A
    kill -TERM <pid>                                    # mid-run preemption
    python scripts/run_driver_e2e.py --steps 500        # phase B: resume to 500

Prints one JSON summary line with the TRUE steady-state images/sec — data
pipeline + conditioning encoders + train step together, the number the
step-only scripts/train_bench.py cannot see.

--smoke shrinks every model to test geometry and runs on CPU (CI path:
tests/test_driver_e2e_script.py).
"""
from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import dataclasses
import io
import json
import os
import time

import numpy as np


CAPTION_OBJECTS = (
    "corgi", "lighthouse", "teapot", "mountain", "sailboat", "violin",
    "cactus", "library", "waterfall", "bicycle", "lantern", "fox",
)
CAPTION_STYLES = (
    "a photo of", "an oil painting of", "a watercolor of", "a sketch of",
    "a macro shot of", "a studio portrait of",
)


def make_geometry(name: str):
    """(PaellaConfig, VQConfig) for a named production-shaped geometry.

    Shared with scripts/run_eval_e2e.py so eval restores checkpoints at the
    exact geometry the driver trained them (reference production config:
    src_distributed/train.py:32,48).
    """
    from paella_tpu.config import PaellaConfig, VQConfig

    if name == "mid":
        # flagship DEPTH (blocks 6/16/6) and head count at 80% width: the 1B
        # config's training working set (f32 params + f32 grads + bf16 moments
        # = 3x params) plus the 4.6 GB frozen towers exceeds one v5e's 16 GB
        # at ANY batch (runs/driver_e2e_1b/oom_batch{8,4,2}.log) — this is the
        # production-shaped config that DOES fit next to the towers
        p_cfg = dataclasses.replace(
            PaellaConfig.v1_byt5_xl(),
            c_hidden=(512, 1024, 1024),
            dtype="bfloat16",
            remat=True,
        )
    elif name == "1b":
        # the FLAGSHIP: the reference's production 1B config verbatim
        # (src_distributed/train.py:32,48 — c_hidden=[640,1280,1280],
        # blocks=[6,16,6], byt5_embd=2560)
        p_cfg = dataclasses.replace(
            PaellaConfig.v1_byt5_xl(), dtype="bfloat16", remat=True
        )
    else:
        assert name == "small", name
        # scripts/train_bench.py's "small" geometry: half width / half
        # depth of the flagship, ByT5-XL conditioning widths
        p_cfg = dataclasses.replace(
            PaellaConfig.v1_byt5_xl(),
            c_hidden=(320, 640, 640),
            nhead=(-1, 8, 8),
            blocks=(4, 12, 4),
            dtype="bfloat16",
            remat=True,
        )
    return p_cfg, dataclasses.replace(VQConfig(), dtype="bfloat16")


def synth_image(rng: np.ndarray, size: int) -> np.ndarray:
    """Low-frequency random image: 8x8 color field upsampled to size — JPEG
    compresses it sanely and the codec/eval collage gets real structure."""
    base = rng.uniform(0.0, 1.0, (8, 8, 3)).astype(np.float32)
    img = np.kron(base, np.ones((size // 8, size // 8, 1), np.float32))
    # a couple of rectangles so crops differ
    for _ in range(3):
        y, x = rng.integers(0, size - 16, 2)
        h, w = rng.integers(8, size // 3, 2)
        img[y : y + h, x : x + w] = rng.uniform(0, 1, 3)
    return np.clip(img, 0.0, 1.0)


def make_shards(shard_dir: str, n_shards: int, per_shard: int, size: int, seed: int = 0):
    """Write WebDataset-layout tar shards (jpg + txt + json) that pass the
    production SampleFilter thresholds."""
    from PIL import Image

    from paella_tpu.data import write_tar_shard

    os.makedirs(shard_dir, exist_ok=True)
    paths = []
    for s in range(n_shards):
        path = os.path.join(shard_dir, f"shard-{s:04d}.tar")
        paths.append(path)
        if os.path.exists(path):
            continue
        rng = np.random.default_rng(seed + s)

        def samples():
            for i in range(per_shard):
                img = synth_image(rng, size)
                buf = io.BytesIO()
                Image.fromarray((img * 255 + 0.5).astype(np.uint8)).save(
                    buf, format="JPEG", quality=92
                )
                cap = (
                    f"{CAPTION_STYLES[int(rng.integers(len(CAPTION_STYLES)))]} a "
                    f"{CAPTION_OBJECTS[int(rng.integers(len(CAPTION_OBJECTS)))]}"
                )
                meta = {
                    "original_width": size * 2,
                    "original_height": size * 2,
                    "pwatermark": 0.1,
                    "aesthetic": 6.0,
                    "punsafe": 0.0,
                }
                yield f"{s:04d}{i:06d}", {
                    "jpg": buf.getvalue(),
                    "txt": cap.encode(),
                    "json": json.dumps(meta).encode(),
                }

        write_tar_shard(path, samples())
        print(f"[shards] wrote {path}")
    return paths


def build_encoders(args, jax, jnp):
    """Frozen conditioning encoders at production geometry, synthetic weights.

    Returns (encode_batch, null_cond, byt5_embd, clip_embd). Weights init on
    device under jit (eager flax init on the tunneled TPU is the known
    round-trip bomb) and are cast to bf16 — the frozen encoders' serving dtype.
    """
    from paella_tpu.cond.clip import (
        CLIPTextConfig,
        CLIPTextEncoder,
        CLIPVisionConfig,
        CLIPVisionEncoder,
        clip_preprocess,
    )
    from paella_tpu.cond.t5 import T5Config, T5Encoder
    from paella_tpu.cond.tokenizers import byt5_batch_encode
    from paella_tpu.train import Batch, NullCond

    if args.smoke:
        t5_cfg = T5Config.tiny()
        txt_cfg = CLIPTextConfig.tiny()
        vis_cfg = CLIPVisionConfig.tiny()
    else:
        t5_cfg = T5Config.byt5_xl()
        txt_cfg = CLIPTextConfig.vit_h_14()
        vis_cfg = CLIPVisionConfig.vit_h_14()
    if args.byt5 == "w8a8":
        # true W8A8 (int8 weights + per-row int8 activations, quant.w8a8_dot):
        # same 2.6 GB residency as int8 weight-only, and the s8 dot path was
        # measured FASTER than bf16 at every bucket (docs/quantization.md)
        t5_cfg = dataclasses.replace(t5_cfg, act_quant=True)

    bf16 = jnp.bfloat16
    cast = lambda p: jax.tree_util.tree_map(
        lambda x: x.astype(bf16) if jnp.issubdtype(x.dtype, jnp.floating) else x, p
    )
    free = jax.jit(cast, donate_argnums=0)  # frees the f32 tree as it converts

    t5 = T5Encoder(t5_cfg)
    ids0 = jnp.zeros((1, 8), jnp.int32)
    t0 = time.time()
    t5_params = free(
        jax.jit(t5.init)(jax.random.PRNGKey(10), ids0, jnp.ones((1, 8), bool))["params"]
    )
    n_t5 = sum(x.size for x in jax.tree_util.tree_leaves(t5_params))
    print(f"[encoders] byt5 d_model={t5_cfg.d_model} params={n_t5/1e9:.2f}B "
          f"init {time.time()-t0:.0f}s", flush=True)
    if args.byt5 in ("int8", "w8a8"):
        from paella_tpu.quant import quantize_t5_int8

        t5_params = jax.jit(quantize_t5_int8, donate_argnums=0)(t5_params)
        print(f"[encoders] byt5 weights quantized to int8 (2.6 GB residency, "
              f"mode={args.byt5})")

    tm = CLIPTextEncoder(txt_cfg)
    txt_params = free(
        jax.jit(tm.init)(
            jax.random.PRNGKey(11), jnp.zeros((1, txt_cfg.context_length), jnp.int32)
        )["params"]
    )
    vm = CLIPVisionEncoder(vis_cfg)
    vis_params = free(
        jax.jit(vm.init)(
            jax.random.PRNGKey(12),
            jnp.zeros((1, vis_cfg.image_size, vis_cfg.image_size, 3), jnp.float32),
        )["params"]
    )
    n_clip = sum(
        x.size
        for t in (txt_params, vis_params)
        for x in jax.tree_util.tree_leaves(t)
    )
    print(f"[encoders] clip text+vision params={n_clip/1e6:.0f}M", flush=True)

    # encode jits: params as ARGS, not closures. Closure-jitting the XL tree
    # captures 5.23 GB of device arrays as HLO constants, and the tunneled
    # remote-compile service dies on that program (observed: 45 min then
    # "Broken pipe" at 127.0.0.1:8093/remote_compile). Arg-form keeps the HLO
    # small; per-call cost is only the buffer-handle marshal (~7 ms measured
    # on the 1B tree — noise at training's ~125 ms/step cadence).
    _byt5_fn = jax.jit(lambda p, ids, mask: t5.apply({"params": p}, ids, mask))
    _clip_txt_fn = jax.jit(lambda p, ids: tm.apply({"params": p}, ids))
    _clip_img_fn = jax.jit(
        lambda p, images: vm.apply(
            {"params": p}, clip_preprocess(images, vis_cfg.image_size)
        )
    )

    def byt5_encode(ids, mask):
        return _byt5_fn(t5_params, ids, mask)

    def clip_text_encode(ids):
        return _clip_txt_fn(txt_params, ids)

    def clip_image_encode(images):
        return _clip_img_fn(vis_params, images)

    # stand-in CLIP tokenizer: the real byte-BPE needs the public merge-table
    # file (cond/tokenizers.py::CLIPTokenizer) which zero-egress CI cannot
    # ship. Byte ids keep the encoder's cost/shape identical; EOT = highest id
    # preserves the argmax-EOT convention (cond/clip.py:159).
    sot, eot = txt_cfg.vocab_size - 2, txt_cfg.vocab_size - 1
    ctx = txt_cfg.context_length

    def clip_tokenize(prompts):
        ids = np.zeros((len(prompts), ctx), np.int32)
        for i, p in enumerate(prompts):
            body = [1 + (b % (sot - 1)) for b in p.encode("utf-8")[: ctx - 2]]
            seq = [sot] + body + [eot]
            ids[i, : len(seq)] = seq
        return ids

    byt5_bucket = args.byt5_bucket

    def encode_batch(images: np.ndarray, captions) -> Batch:
        ids, mask = byt5_batch_encode(list(captions), pad_to=byt5_bucket)
        imgs = jnp.asarray(images, jnp.float32)
        return Batch(
            images=imgs,
            byt5=byt5_encode(jnp.asarray(ids), jnp.asarray(mask)),
            byt5_mask=jnp.asarray(mask),
            clip=clip_text_encode(jnp.asarray(clip_tokenize(list(captions)))),
            clip_image=clip_image_encode(imgs),
        )

    def encode_text(captions):
        """Text-only conditioning (byt5 states, byt5 mask, clip text embd) —
        the generation-time subset of encode_batch (scripts/run_eval_e2e.py)."""
        ids, mask = byt5_batch_encode(list(captions), pad_to=byt5_bucket)
        return (
            byt5_encode(jnp.asarray(ids), jnp.asarray(mask)),
            jnp.asarray(mask),
            clip_text_encode(jnp.asarray(clip_tokenize(list(captions)))),
        )

    encode_batch.encode_text = encode_text

    # null conditioning = the frozen encoders' empty-string outputs
    # (reference recomputes per batch, src_distributed/train.py:79-91)
    nid, nmask = byt5_batch_encode([""], pad_to=byt5_bucket)
    null = NullCond(
        byt5=byt5_encode(jnp.asarray(nid), jnp.asarray(nmask)),
        byt5_mask=jnp.asarray(nmask),
        clip=clip_text_encode(jnp.asarray(clip_tokenize([""]))),
    )
    return encode_batch, null, t5_cfg.d_model, txt_cfg.embed_dim


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="runs/driver_e2e")
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--image", type=int, default=256)
    ap.add_argument("--log-every", type=int, default=25)
    ap.add_argument("--eval-every", type=int, default=150)
    ap.add_argument("--shards", type=int, default=2)
    ap.add_argument("--per-shard", type=int, default=512)
    ap.add_argument("--byt5", default="bf16", choices=["bf16", "int8", "w8a8"],
                    help="frozen ByT5-XL residency: int8/w8a8 free 2.6 GB HBM; "
                         "w8a8 additionally runs the s8 dot path (faster, "
                         "docs/quantization.md)")
    ap.add_argument("--geometry", default="small", choices=["small", "mid", "1b"],
                    help="denoiser geometry: 'small' = the ~280M half-width/"
                         "half-depth rehearsal; 'mid' = flagship depth at 80% "
                         "width (~645M, the largest that fits one v5e next to "
                         "the frozen towers); '1b' = the reference's FLAGSHIP "
                         "production config (src_distributed/train.py:32,48)")
    ap.add_argument("--adam-moments", default="f32", choices=["f32", "bf16"],
                    help="Adam moment dtype; bf16 is what fits 1B on one v5e "
                         "(f32 moments exceed HBM by 237 MB, CLAUDE.md r3b)")
    ap.add_argument("--byt5-bucket", type=int, default=64,
                    help="fixed byte-token pad length (avoids per-batch recompiles)")
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--encode-prefetch", type=int, default=1,
                    help="overlap batch N+1's conditioning encodes with step N "
                         "(DriverConfig.encode_prefetch; 0 = synchronous)")
    ap.add_argument("--codec", default=None,
                    help="codec_vars.npz from scripts/run_codec_pretrain.py: "
                         "train the denoiser against a TRAINED codec instead "
                         "of the random-init one")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny geometry on CPU: CI rehearsal of this exact script")
    args = ap.parse_args()

    import jax

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
        args.image = 64
        args.batch = 4
        args.per_shard = 24
        args.byt5_bucket = 16
    else:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"[driver-e2e] device: {dev}", flush=True)

    from paella_tpu.codec import VQModel
    from paella_tpu.config import PaellaConfig, TrainConfig, VQConfig
    from paella_tpu.data import SampleFilter, WebDatasetLoader, background_iterator
    from paella_tpu.models import Paella, count_params, init_params
    from paella_tpu.train.driver import DriverConfig, run_training

    shard_paths = make_shards(
        os.path.join(args.workdir, "shards"), args.shards, args.per_shard, args.image
    )
    loader = WebDatasetLoader(
        shards=shard_paths,
        batch_size=args.batch,
        image_size=args.image,
        shuffle_buffer=64,
        filter=SampleFilter(min_size=args.image),
        num_workers=args.workers,
        shard_offset=0,
        shard_stride=1,
    )
    data_iter = background_iterator(iter(loader), depth=2)

    if args.smoke:
        p_cfg = dataclasses.replace(
            PaellaConfig.tiny(), byt5_embd=32, clip_embd=24, dtype="bfloat16", remat=True
        )
        vq_cfg = VQConfig.tiny()
    else:
        p_cfg, vq_cfg = make_geometry(args.geometry)

    encode_batch, null, byt5_embd, clip_embd = build_encoders(args, jax, jnp)
    assert byt5_embd == p_cfg.byt5_embd and clip_embd == p_cfg.clip_embd, (
        byt5_embd, clip_embd, p_cfg.byt5_embd, p_cfg.clip_embd,
    )

    vq = VQModel(vq_cfg)
    if args.codec:
        from paella_tpu.train.checkpoints import load_params_npz

        vq_vars = jax.device_put(load_params_npz(args.codec))
        print(f"[driver-e2e] loaded trained codec vars from {args.codec}", flush=True)
    else:
        vq_vars = jax.jit(vq.init)(
            jax.random.PRNGKey(1), jnp.zeros((1, args.image, args.image, 3))
        )
    model = Paella(p_cfg)
    f = vq_cfg.downscale
    hw = args.image // f
    # Only materialize init params on a FRESH run: on resume run_training
    # restores through an abstract template, and a concrete init here would
    # sit dead in HBM next to the restored state (OOMs the mid/1b geometries).
    ckpt_dir = os.path.join(args.workdir, "checkpoints")
    resuming = os.path.isdir(ckpt_dir) and any(
        s.isdigit() for s in os.listdir(ckpt_dir)
    )
    if resuming:
        params = None
        n_abs = count_params(
            jax.eval_shape(lambda: init_params(model, jax.random.PRNGKey(0), latent_hw=(hw, hw)))
        )
        print(f"denoiser params: {n_abs/1e6:.0f}M (resuming — init skipped)", flush=True)
    else:
        params = init_params(model, jax.random.PRNGKey(0), latent_hw=(hw, hw))
        print(f"denoiser params: {count_params(params)/1e6:.0f}M", flush=True)

    t_cfg = TrainConfig(
        warmup_updates=100,
        batch_size=args.batch,
        adam_moment_dtype="bfloat16" if args.adam_moments == "bf16" else "float32",
    )
    d_cfg = DriverConfig(
        workdir=args.workdir,
        total_steps=args.steps,
        log_every=args.log_every,
        eval_every=args.eval_every,
        eval_steps=8,
        max_keep=3,
        encode_prefetch=args.encode_prefetch,
    )

    t0 = time.time()
    state = run_training(
        model, vq, vq_vars, data_iter, encode_batch, null,
        train_cfg=t_cfg, driver_cfg=d_cfg, params=params,
    )
    wall = time.time() - t0
    final_step = int(state.step)

    # steady-state e2e rate from the run's own metrics (rolling-window
    # images_per_sec of the last logged rows, excluding compile-heavy step 0s)
    rates = []
    with open(os.path.join(args.workdir, "metrics.jsonl")) as fh:
        for line in fh:
            row = json.loads(line)
            if row.get("images_per_sec") and row["step"] % args.eval_every > args.log_every:
                rates.append(row["images_per_sec"])
    steady = float(np.median(rates[-6:])) if rates else None

    summary = {
        "metric": "driver e2e (data + frozen encoders + train step, one chip)",
        "final_step": final_step,
        "wall_s": round(wall, 1),
        "steady_state_images_per_sec": round(steady, 2) if steady else None,
        "batch": args.batch,
        "image": args.image,
        "byt5": args.byt5,
        "geometry": args.geometry,
        "adam_moments": args.adam_moments,
        "device": str(dev),
    }
    print(json.dumps(summary), flush=True)
    with open(os.path.join(args.workdir, "summary.json"), "w") as fh:
        json.dump(summary, fh, indent=1)


if __name__ == "__main__":
    main()
