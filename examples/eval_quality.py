"""Quality-evaluation workflow: CLIP score + (CLIP-)FID for a prompt set.

BASELINE.md's parity bar is FID/CLIP-score parity with the released PyTorch
checkpoints; the reference ships no evaluation code. This is the harness you
run once converted weights are on disk:

    python examples/eval_quality.py --ckpt /path/paella_v3.pt \
        --vq /path/vqgan.pt --clip /path/open_clip_h.pt \
        --prompts prompts.txt --real-images real_dir/

With no arguments it runs the full workflow on tiny random-weight models as a
CPU smoke test (scores are meaningless, the plumbing is real).

--w8a8-proxy prints the W8A8 quantization quality-proxy table (logits KL +
argmax token-flip rate vs the bf16 path, across noise levels t) and the
go/no-go recommendation against the documented thresholds
(docs/quantization.md). Without --ckpt it runs on a synthetic fuse-eligible
model — the gate that can run TODAY; with real weights the same command is
the first half of the act_quant default decision (real-checkpoint FID is the
second).

    python examples/eval_quality.py --w8a8-proxy
"""
from __future__ import annotations

import argparse
import dataclasses
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def tiny_demo():
    # tiny models: CPU is faster than paying tunnel round-trips to the TPU
    jax.config.update("jax_platforms", "cpu")
    from paella_tpu.config import PaellaConfig, SampleConfig, VQConfig
    from paella_tpu.codec import VQModel
    from paella_tpu.cond import T5Config, T5Encoder
    from paella_tpu.cond.clip import (
        CLIPTextConfig,
        CLIPTextEncoder,
        CLIPVisionConfig,
        CLIPVisionEncoder,
    )
    from paella_tpu.eval import (
        clip_image_features,
        clip_score,
        features_over_batches,
        fid_from_features,
    )
    from paella_tpu.models import Paella, init_params
    from paella_tpu.pipeline import PaellaPipeline

    prompts = ["a corgi wearing a top hat", "an oil painting of a lighthouse"]

    t5_cfg = T5Config.tiny()
    p_cfg = dataclasses.replace(PaellaConfig.tiny(), byt5_embd=t5_cfg.d_model)
    model = Paella(p_cfg)
    params = init_params(model, jax.random.PRNGKey(0), latent_hw=(16, 16))
    vq = VQModel(VQConfig.tiny())
    vq_vars = vq.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)))
    t5 = T5Encoder(t5_cfg)
    ids0 = jnp.zeros((1, 8), jnp.int32)
    t5_params = t5.init(jax.random.PRNGKey(2), ids0, jnp.ones((1, 8), bool))["params"]

    pipe = PaellaPipeline(
        model=model,
        params=params,
        vq=vq,
        vq_vars=vq_vars,
        byt5_encode_fn=jax.jit(lambda i, m: t5.apply({"params": t5_params}, i, m)),
    )
    images = pipe.text_to_image(
        prompts, jax.random.PRNGKey(3), (64, 64), SampleConfig(steps=4)
    )

    # CLIP towers (real weights: cond/clip.py::convert_open_clip_* on a ckpt)
    tm = CLIPTextEncoder(CLIPTextConfig.tiny())
    vm = CLIPVisionEncoder(CLIPVisionConfig.tiny())
    # tiny tokenizer stand-in: mod-vocab byte ids (real path:
    # cond/tokenizers.py::CLIPTokenizer with a user-supplied vocab file)
    ids = np.stack(
        [np.pad(np.frombuffer(p.encode()[:16], np.uint8) % 64, (0, 16))[:16] for p in prompts]
    ).astype(np.int32)
    tp = jax.jit(tm.init)(jax.random.PRNGKey(4), jnp.asarray(ids))["params"]
    vp = jax.jit(vm.init)(jax.random.PRNGKey(5), jnp.zeros((1, 32, 32, 3)))["params"]

    text_feats = tm.apply({"params": tp}, jnp.asarray(ids))
    extract = clip_image_features(vm, vp)
    img_feats = extract(images)
    scores = clip_score(text_feats, img_feats)
    print("CLIP scores:", np.round(np.asarray(scores), 2))

    # CLIP-FID: generated vs a stand-in "real" set (here: noised copies)
    gen_feats = features_over_batches(extract, [np.asarray(images)])
    real = np.clip(
        np.asarray(images) + np.random.default_rng(0).normal(0, 0.05, images.shape), 0, 1
    ).astype(np.float32)
    real_feats = features_over_batches(extract, [real])
    print("CLIP-FID (gen vs noised-gen):", round(fid_from_features(real_feats, gen_feats), 4))


def w8a8_proxy_demo(ckpt: str | None):
    from paella_tpu.config import PaellaConfig
    from paella_tpu.models import Paella, init_params
    from paella_tpu.quant import w8a8_proxy_verdict, w8a8_quality_proxy

    if ckpt is not None:
        # flagship geometry on real converted weights (run on the TPU)
        from paella_tpu.convert import convert_paella, load_torch_state_dict

        cfg = dataclasses.replace(PaellaConfig.v1_byt5_xl(), dtype="bfloat16")
        params = jax.tree_util.tree_map(
            jnp.asarray, convert_paella(load_torch_state_dict(ckpt), cfg)
        )
        latent_hw = (64, 64)
    else:
        # synthetic stand-in: smallest fuse-eligible geometry; CPU interpret
        jax.config.update("jax_platforms", "cpu")
        cfg = dataclasses.replace(
            PaellaConfig.tiny(),
            c_hidden=(128, 128),
            nhead=(-1, 4),
            blocks=(2, 3),
            level_config=("CT", "CTA"),
            dropout=(0.0, 0.0),
        )
        model = Paella(dataclasses.replace(cfg, fused_blocks=True))
        params = init_params(model, jax.random.PRNGKey(0), latent_hw=(16, 16))
        # zero-init head/FiLM leaves would make the comparison vacuous
        leaves, treedef = jax.tree_util.tree_flatten(params)
        keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
        params = jax.tree_util.tree_unflatten(
            treedef,
            [
                l + 0.02 * jax.random.normal(k, l.shape, l.dtype)
                for l, k in zip(leaves, keys)
            ],
        )
        latent_hw = (16, 16)

    rows = w8a8_quality_proxy(cfg, params, jax.random.PRNGKey(2), latent_hw=latent_hw)
    print(f"{'t':>5}  {'KL nats/tok':>12}  {'argmax flip':>12}  {'rel |dlogit|':>12}")
    for r in rows:
        print(f"{r['t']:5.2f}  {r['kl']:12.5f}  {r['flip']:12.3%}  {r['rel']:12.4f}")
    ok, msg = w8a8_proxy_verdict(rows)
    print(msg)
    return ok


def byt5_w8a8_proxy_demo(stress: bool = False, geometry: str = "tiny"):
    """Downstream proxy for the ByT5 act_quant flag on synthetic weights:
    float vs W8A8 text encode -> SAME denoiser -> logits drift table.

    --stress adds an outlier-injected arm (quant.inject_weight_outliers on the
    T5 tree: 2% of reduction-axis channels scaled 12x, the LLM.int8() failure
    mode). The encoder is FROZEN in training (src_distributed/train.py — only
    the denoiser gets gradients), so unlike the denoiser proxy there are no
    "trained" ByT5 weights to re-gate on: the checkpoint-day weights ARE
    pretrained HF weights with real outlier channels, and the stress arm is
    the rehearsable adversarial bound for them. --geometry small runs at
    byt5_small_like (1472-wide, 12 layers) — big enough for channel statistics
    to mean something; runs on the TPU when available."""
    if geometry == "tiny":
        jax.config.update("jax_platforms", "cpu")
    from paella_tpu.config import PaellaConfig
    from paella_tpu.cond import T5Config, T5Encoder
    from paella_tpu.models import Paella, init_params
    from paella_tpu.quant import (
        inject_weight_outliers,
        t5_w8a8_quality_proxy,
        w8a8_proxy_verdict,
    )

    t5_cfg = T5Config.tiny() if geometry == "tiny" else T5Config.byt5_small_like()
    cfg = dataclasses.replace(PaellaConfig.tiny(), byt5_embd=t5_cfg.d_model)
    params = init_params(Paella(cfg), jax.random.PRNGKey(0), latent_hw=(16, 16))
    # zero-init head would make the logits comparison vacuous
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef,
        [l + 0.02 * jax.random.normal(k, l.shape, l.dtype) for l, k in zip(leaves, keys)],
    )
    t5 = T5Encoder(t5_cfg)
    ids = jnp.zeros((1, 5), jnp.int32)
    # jitted init: unjitted flax init on the tunneled TPU is thousands of
    # eager round-trips (CLAUDE.md)
    t5_params = jax.jit(t5.init)(jax.random.PRNGKey(2), ids, jnp.ones((1, 5), bool))[
        "params"
    ]

    arms = {"synthetic": t5_params}
    if stress:
        arms["synthetic_outliers"] = inject_weight_outliers(
            t5_params, jax.random.PRNGKey(4)
        )

    ok_all = True
    for name, arm_params in arms.items():
        rows = t5_w8a8_quality_proxy(t5_cfg, arm_params, cfg, params, jax.random.PRNGKey(3))
        print(f"\n== {name} ({geometry}) ==")
        print(f"{'t':>5}  {'KL nats/tok':>12}  {'argmax flip':>12}  {'rel |dlogit|':>12}")
        for r in rows:
            print(f"{r['t']:5.2f}  {r['kl']:12.5f}  {r['flip']:12.3%}  {r['rel']:12.4f}")
        ok, msg = w8a8_proxy_verdict(rows)
        ok_all = ok_all and ok
        print("byt5 act_quant:", msg)
    return ok_all


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None, help="converted denoiser checkpoint")
    ap.add_argument(
        "--w8a8-proxy", action="store_true",
        help="print the W8A8 quality-proxy table + recommendation",
    )
    ap.add_argument(
        "--byt5-w8a8-proxy", action="store_true",
        help="print the ByT5 act_quant downstream quality-proxy table",
    )
    ap.add_argument(
        "--stress", action="store_true",
        help="add an outlier-injected arm to the ByT5 proxy",
    )
    ap.add_argument(
        "--geometry", default="tiny", choices=("tiny", "small"),
        help="ByT5 proxy geometry: tiny (CPU) or byt5_small_like (TPU-sized)",
    )
    args, _ = ap.parse_known_args()
    if args.byt5_w8a8_proxy:
        byt5_w8a8_proxy_demo(stress=args.stress, geometry=args.geometry)
    elif args.w8a8_proxy:
        w8a8_proxy_demo(args.ckpt)
    elif args.ckpt is None:
        tiny_demo()
    else:
        raise SystemExit(
            "real-weights evaluation: load converters from paella_tpu.convert, "
            "build PaellaPipeline, then follow tiny_demo()'s metric calls"
        )
