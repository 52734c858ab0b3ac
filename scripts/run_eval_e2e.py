"""Classic-FID eval pipeline executed end-to-end on the real chip.

The parity half of the north star — FID vs the released checkpoints
(reference: readme.md:6) — is environmentally blocked: this box has zero
network egress, so neither the Paella weights nor the standard
`pt_inception-2015-12-05` featurizer can exist here. What IS rehearsable is
the full eval pipeline at production geometry, which this script executes on
the v5e:

    restore the production-driver run's trained denoiser checkpoint
    -> frozen ByT5-XL + CLIP ViT-H text conditioning (synthetic weights at
       the real geometry, same construction as scripts/run_driver_e2e.py)
    -> production sampler (single-jit lax.scan, batched CFG, 8 steps)
    -> f4 VQGAN decode_indices -> uint8 images
    -> classic InceptionV3 pool3 features (eval/inception.py, "fid" variant)
       over the generated set AND over real images streamed from the run's
       own WebDataset tar shards
    -> host-float64 Frechet distance (eval/metrics.py)

The featurizer weights are synthetic (tests/test_inception.py's state-dict
builder), so THE FID VALUE IS MEANINGLESS as a quality claim — the artifact
is that every checkpoint-day eval code path executes together on hardware;
FID day is a weight swap (load_inception(path) instead of the synthetic
tree). Reference eval surface: readme.md:6 FID table; sampling defaults
src_distributed/utils.py:97-126.

    python scripts/run_eval_e2e.py --workdir runs/driver_e2e --n 256

Writes <workdir>/eval_fid.json and prints it.

`--trend` evaluates SEVERAL denoiser states against the same real set and
featurizer — the untrained init (zero-init head => uniform code sampling)
plus each requested checkpoint step — and writes eval_fid_trend.json. Even
under a synthetic featurizer the Frechet distance is a valid distance in a
random feature space (a random-projection FID), so the trend demonstrates
the metric machinery *tracks training progress*, not merely that it runs.
"""
from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import argparse
import dataclasses
import importlib.util
import json
import os
import time
import types

import numpy as np


def _load_synth_inception():
    """tests/test_inception.py's synthetic torch-layout state dict builder —
    the zero-egress stand-in for pt_inception-2015-12-05."""
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "test_inception.py",
    )
    spec = importlib.util.spec_from_file_location("_ti", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.synth_inception_state_dict


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="runs/driver_e2e")
    ap.add_argument("--n", type=int, default=256, help="images per set")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--image", type=int, default=256)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--cfg", default="8,8",
                    help="CFG schedule 'start,end' (production default 8,8; "
                         "'0,0' disables CFG — on an undertrained denoiser "
                         "whose uncond arm saw only the 5%% cond-dropout "
                         "batches, heavy CFG amplifies garbage)")
    ap.add_argument("--byt5-bucket", type=int, default=64)
    ap.add_argument("--byt5", default="w8a8", choices=["bf16", "int8", "w8a8"],
                    help="frozen ByT5-XL mode (run_driver_e2e.build_encoders). "
                         "Default w8a8: matches the mid driver run's training "
                         "conditioning AND frees 2.6 GB HBM — the bf16 tower "
                         "next to the 662M f32 init OOMed the 16 GB chip")
    ap.add_argument("--geometry", default="small", choices=["small", "mid", "1b"],
                    help="denoiser geometry of the workdir's checkpoints "
                         "(run_driver_e2e.make_geometry)")
    ap.add_argument("--adam-moments", default="f32", choices=["f32", "bf16"],
                    help="Adam moment dtype the checkpoints were saved with "
                         "(the restore template must match the saved tree)")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny geometry on CPU, synthetic denoiser (CI path)")
    ap.add_argument("--trend", action="store_true",
                    help="FID per denoiser state (untrained init + checkpoints)")
    ap.add_argument("--trend-steps", default="all",
                    help="comma-separated checkpoint steps for --trend (default: all)")
    ap.add_argument("--real-recon", action="store_true",
                    help="score against the codec's encode->decode reconstruction "
                         "of the real set instead of the raw images. Under a "
                         "synthetic (random-init) codec the raw-image FID is "
                         "dominated by the decoder itself and is blind to token "
                         "quality (measured: flat across a loss 6.9->1.4 training "
                         "run); reconstruction puts both sets in the same codec "
                         "image space so FID reflects the denoiser's token "
                         "distribution. With trained codec weights recon==real "
                         "up to codec distortion.")
    ap.add_argument("--space", choices=("image", "tokens"), default="image",
                    help="'tokens' scores distributions in TOKEN space (no "
                         "decoder/featurizer in the loop): Frechet over "
                         "[random-projected code histogram | codebook-embedding "
                         "field stats] + marginal Jensen-Shannon, generated "
                         "tokens vs encode(real). The quality-bearing space "
                         "under a random-init codec: measured on the 500-step "
                         "run, image-space FID is flat (raw: decoder-dominated; "
                         "recon: decoder contracts token differences to ~0) "
                         "while training moved loss 6.9->1.4.")
    ap.add_argument("--codec", default=None,
                    help="codec_vars.npz from scripts/run_codec_pretrain.py: "
                         "score against the TRAINED codec (the image-space FID "
                         "chain is only quality-bearing with one — see --space)")
    ap.add_argument("--w8a8", action="store_true",
                    help="add a true-W8A8 twin of every --trend arm: the SAME "
                         "restored params int8-quantized (fuse-eligible levels "
                         "+ first/skip reps, mirroring w8a8_quality_proxy) and "
                         "sampled with act_quant=True. The full-sampling-loop "
                         "quality evidence for the act_quant default flip: the "
                         "stage-1 proxy bounds single-forward logit drift; this "
                         "measures the 8-step loop's compounded effect on the "
                         "generated token DISTRIBUTION (same seeds as the bf16 "
                         "twin). Gate: twin Frechet/JS to real within noise of "
                         "bf16's, twin-to-twin JS ~ seed-resample floor.")
    args = ap.parse_args()
    token_space = args.space == "tokens"
    assert not (token_space and args.real_recon), "--real-recon is an image-space option"
    assert not (args.w8a8 and not args.trend), "--w8a8 is a --trend mode option"
    if args.smoke:
        args.n, args.batch, args.image, args.byt5_bucket = 8, 4, 64, 16
    assert args.n % args.batch == 0, "n must be a multiple of batch"

    import jax

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir", os.path.join(repo_root, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import run_driver_e2e as drv
    from paella_tpu.codec import VQModel
    from paella_tpu.config import PaellaConfig, SampleConfig, TrainConfig, VQConfig
    from paella_tpu.data import SampleFilter, WebDatasetLoader
    from paella_tpu.eval import (
        convert_inception,
        features_over_batches,
        fid_from_features,
        inception_features,
    )
    from paella_tpu.models import Paella, init_params
    from paella_tpu.sampling import Conditioning, fast_key, sample
    from paella_tpu.train import create_train_state
    from paella_tpu.train.checkpoints import CheckpointManager

    dev = jax.devices()[0]
    print(f"[eval] device: {dev}", flush=True)

    # --- models at the production-driver run's exact geometry -------------
    if args.smoke:
        p_cfg = dataclasses.replace(
            PaellaConfig.tiny(), byt5_embd=32, clip_embd=24, dtype="bfloat16"
        )
        vq_cfg = VQConfig.tiny()
    else:
        p_cfg, vq_cfg = drv.make_geometry(args.geometry)
    model = Paella(p_cfg)
    model_q = q_levels = None
    if args.w8a8:
        from paella_tpu.quant import fuse_eligible_levels, quantize_paella_int8

        # identical recipe to quant.w8a8_quality_proxy (the stage-1 gate):
        # quantize the fuse-eligible levels' fc stacks + first/skip reps,
        # apply with act_quant=True. At the driver-e2e geometry (320,640,640)
        # the eligible levels are (1, 2) — level 0's 320 channels miss the
        # kernel's 128-alignment, so it stays bf16, exactly as it would in
        # production serving.
        q_levels = fuse_eligible_levels(p_cfg)
        # fused_blocks=True is REQUIRED (matching quant.w8a8_quality_proxy):
        # quantize_paella_int8's int8 kernels are only valid on the fused
        # Pallas path — the denoiser's hazard guard (models/denoiser.py)
        # raises on the XLA path. At smoke geometry nothing is eligible, so
        # the twin traces the identical program either way.
        model_q = Paella(
            dataclasses.replace(p_cfg, act_quant=True, fused_blocks=True)
        )
        if not args.smoke:
            assert q_levels, (
                f"--w8a8 at geometry {p_cfg.c_hidden} quantizes nothing — "
                "no fuse-eligible level (c % 128 == 0)"
            )

        def _quantize(p):
            return quantize_paella_int8(p, levels=q_levels, include_first=True)
    vq = VQModel(vq_cfg)
    if args.codec:
        from paella_tpu.train.checkpoints import load_params_npz

        vq_vars = jax.device_put(load_params_npz(args.codec))
        print(f"[eval] loaded trained codec vars from {args.codec}", flush=True)
    else:
        vq_vars = jax.jit(vq.init)(
            jax.random.PRNGKey(1), jnp.zeros((1, args.image, args.image, 3))
        )
    hw = args.image // vq_cfg.downscale

    # NOTE: `init` (f32, 2.6 GB at the mid geometry) is built AFTER the frozen
    # towers are freed (below) — building it first OOMed the 16 GB chip next
    # to the bf16 ByT5-XL during the conditioning precompute
    init = None

    def _perturbed(tree, scale=0.02, seed=5):
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
        return jax.tree_util.tree_unflatten(
            treedef,
            [l + scale * jax.random.normal(k, l.shape, l.dtype) for l, k in zip(leaves, keys)],
        )

    mgr = None
    if not args.smoke:
        mgr = CheckpointManager(os.path.join(args.workdir, "checkpoints"))

    def restore_step(step=None):
        # ABSTRACT restore template (jax.eval_shape + sharded ShapeDtypeStructs,
        # mirroring train/driver.py's resume path): a concrete template would
        # hold a second full train state (params + both Adam moments, ~2x
        # params bytes) in HBM during restore — at the 662M mid geometry that
        # OOMed the 16 GB v5e next to `init` and the conditioning arrays
        from jax.sharding import SingleDeviceSharding

        t_cfg = TrainConfig(
            warmup_updates=100, batch_size=args.batch,
            adam_moment_dtype=(
                "bfloat16" if args.adam_moments == "bf16" else "float32"
            ),
        )
        abstract = jax.eval_shape(lambda: create_train_state(init, t_cfg))
        sh = SingleDeviceSharding(dev)
        template = jax.tree_util.tree_map(
            lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh), abstract
        )
        restored, _ = mgr.restore(template, step=step)
        del template
        if restored is None:
            raise SystemExit(
                f"no checkpoint under {args.workdir} — run run_driver_e2e.py first"
            )
        p, s = restored.params, int(restored.step)
        del restored  # drop the optimizer moments; only params sample
        print(f"[eval] restored step-{s} denoiser", flush=True)
        return p, s

    # --- frozen conditioning encoders (identical build to the driver run) -
    enc_args = types.SimpleNamespace(smoke=args.smoke, byt5=args.byt5, byt5_bucket=args.byt5_bucket)
    encode_batch, null, byt5_embd, clip_embd = drv.build_encoders(enc_args, jax, jnp)
    encode_text = encode_batch.encode_text
    assert byt5_embd == p_cfg.byt5_embd and clip_embd == p_cfg.clip_embd

    # text-only conditioning for generation (the collage's cond_noimg form,
    # train/driver.py:285): byt5 states + CLIP text embedding, no clip_image
    prompts = [
        f"{s} a {o}"
        for s in drv.CAPTION_STYLES
        for o in drv.CAPTION_OBJECTS
    ]
    prompts = (prompts * (args.n // len(prompts) + 1))[: args.n]

    b = args.batch
    uncond = Conditioning(
        byt5=jnp.tile(null.byt5, (b, 1, 1)),
        byt5_mask=jnp.tile(null.byt5_mask, (b, 1)),
        clip=jnp.tile(null.clip, (b, 1)),
    )

    cfg_sched = tuple(float(v) for v in args.cfg.split(","))
    assert len(cfg_sched) == 2, "--cfg wants 'start,end'"
    s_cfg = SampleConfig(steps=args.steps,
                         cfg=None if cfg_sched == (0.0, 0.0) else cfg_sched)
    decode = jax.jit(lambda v, t: jnp.clip(
        vq.apply(v, t, method=VQModel.decode_indices), 0.0, 1.0
    ))
    t0_all = time.time()

    # precompute every batch's text conditioning ONCE (the states are ~84 MB
    # total), then drop the closures so the 7+ GB frozen towers free before
    # any checkpoint restore — encoders and train states never coexist
    conds = []
    for i in range(args.n // b):
        byt5, mask, clip_vec = encode_text(prompts[i * b : (i + 1) * b])
        conds.append(Conditioning(byt5=byt5, byt5_mask=mask, clip=clip_vec))
    del encode_batch, encode_text
    import gc

    gc.collect()  # the tunnel backend defers frees; drop tower refs eagerly

    init = init_params(model, jax.random.PRNGKey(0), latent_hw=(hw, hw))

    # --- real set: stream from the run's own tar shards -------------------
    shard_dir = os.path.join(args.workdir, "shards")
    if args.smoke and not os.path.isdir(shard_dir):
        drv.make_shards(shard_dir, 1, 16, args.image)
    shards = sorted(
        os.path.join(shard_dir, s) for s in os.listdir(shard_dir) if s.endswith(".tar")
    )
    loader = WebDatasetLoader(
        shards=shards, batch_size=b, image_size=args.image,
        shuffle_buffer=64, filter=SampleFilter(min_size=args.image),
        shard_offset=0, shard_stride=1,
    )
    real_batches = []
    for images, _caps in loader:
        real_batches.append(images)
        if len(real_batches) * b >= args.n:
            break
    n_real = len(real_batches) * b
    assert n_real == args.n, (
        f"shards under {shard_dir} yielded only {n_real} of the requested "
        f"{args.n} real images — Frechet floors would be computed over "
        "mismatched sets; lower --n or add shards"
    )
    if args.real_recon:
        recon = jax.jit(lambda v, x: jnp.clip(
            vq.apply(v, vq.apply(v, x, method=VQModel.encode)[2],
                     method=VQModel.decode_indices), 0.0, 1.0))
        real_batches = [np.asarray(recon(vq_vars, jnp.asarray(im))) for im in real_batches]

    half = args.n // 2
    t_feat = [0.0]
    if token_space:
        # --- token-space featurizer: no decoder, no inception ----------------
        encode_tokens = jax.jit(lambda v, x: vq.apply(v, x, method=VQModel.encode)[2])
        codebook = np.asarray(vq_vars["params"]["vquantizer"]["codebook"], np.float32)
        K = codebook.shape[0]
        R = np.random.default_rng(7).standard_normal((K, 64)).astype(np.float32)
        R /= np.sqrt(64.0)

        def token_stats(tok_batches):
            """Per-image features: random-projected code histogram (64) |
            codebook-embedding field mean/std (2c) | 2x2 quadrant means (4c).
            Returns (features, mean marginal histogram)."""
            toks = np.concatenate(tok_batches, 0)
            B, H, W = toks.shape
            hist = np.zeros((B, K), np.float32)
            for bi in range(B):
                hist[bi] = np.bincount(toks[bi].ravel(), minlength=K)
            hist /= float(H * W)
            emb = codebook[toks]
            h2, w2 = H // 2, W // 2
            quads = [emb[:, :h2, :w2], emb[:, :h2, w2:], emb[:, h2:, :w2], emb[:, h2:, w2:]]
            feats = np.concatenate(
                [hist @ R, emb.mean((1, 2)), emb.std((1, 2))]
                + [q.mean((1, 2)) for q in quads], -1)
            return feats.astype(np.float64), hist.mean(0)

        def js_div(p, q, eps=1e-10):
            p = np.asarray(p, np.float64) + eps
            q = np.asarray(q, np.float64) + eps
            p, q = p / p.sum(), q / q.sum()
            m = 0.5 * (p + q)
            kl = lambda a, c: float(np.sum(a * np.log(a / c)))
            return 0.5 * kl(p, m) + 0.5 * kl(q, m)

        t0 = time.time()
        real_tok = [np.asarray(encode_tokens(vq_vars, jnp.asarray(im))) for im in real_batches]
        real_feats, real_hist = token_stats(real_tok)
        t_feat[0] += time.time() - t0
        floor = fid_from_features(real_feats[:half], real_feats[half:])
        js_floor = js_div(token_stats(real_tok[: len(real_tok) // 2])[1],
                          token_stats(real_tok[len(real_tok) // 2 :])[1])
    else:
        # --- classic InceptionV3 pool3 featurizer (built once, shared by arms)
        sd = _load_synth_inception()(seed=0)
        extract = inception_features(convert_inception(sd), variant="fid")
        t0 = time.time()
        real_feats = features_over_batches(extract, real_batches)
        t_feat[0] += time.time() - t0
        # sanity anchor: FID of the real set against itself split in half — the
        # small-N noise floor the gen-vs-real numbers sit on
        floor = fid_from_features(real_feats[:half], real_feats[half:])

    def gen_features(params, m=None):
        """Sample n images under `params`, decode, featurize. Same treedef and
        shapes each call => the sampler/decode jits compile once across arms."""
        m = m or model
        gen_batches = []
        t_sample = 0.0
        for i in range(args.n // b):
            t0 = time.time()
            tokens = sample(m, params, fast_key(1000 + i), conds[i], (b, hw, hw), uncond, s_cfg)
            imgs = np.asarray(decode(vq_vars, tokens))  # fetch == sync (timing gotcha)
            t_sample += time.time() - t0
            gen_batches.append(imgs)
            print(f"[eval] gen batch {i + 1}/{args.n // b}", flush=True)
        t0 = time.time()
        feats = features_over_batches(extract, gen_batches)
        t_feat[0] += time.time() - t0
        return feats, args.n / t_sample

    def gen_token_stats(params, m=None):
        """Sample n token grids under `params` — tokens fetched directly, the
        decoder never runs."""
        m = m or model
        tok_batches = []
        t_sample = 0.0
        for i in range(args.n // b):
            t0 = time.time()
            tokens = sample(m, params, fast_key(1000 + i), conds[i], (b, hw, hw), uncond, s_cfg)
            tok_batches.append(np.asarray(tokens))  # fetch == sync (timing gotcha)
            t_sample += time.time() - t0
            print(f"[eval] gen batch {i + 1}/{args.n // b}", flush=True)
        t0 = time.time()
        feats, hist = token_stats(tok_batches)
        t_feat[0] += time.time() - t0
        return feats, hist, args.n / t_sample, np.concatenate(tok_batches, 0)

    arm_hists = {}
    arm_tokens = {}  # raw token grids (n x H x W int32, ~4 MB/arm) for twin flip rate

    def eval_arm(params, m=None, label=None):
        """Returns (metric fields, sampling rate, headline Frechet value)."""
        if token_space:
            feats, hist, rate, toks = gen_token_stats(params, m)
            if label is not None:
                arm_hists[label] = hist
                arm_tokens[label] = toks
            fr = float(fid_from_features(real_feats, feats))
            return {"token_frechet": round(fr, 4),
                    "token_js_to_real": round(js_div(hist, real_hist), 4)}, rate, fr
        feats, rate = gen_features(params, m)
        fr = float(fid_from_features(real_feats, feats))
        return {"fid_synthetic_featurizer": round(fr, 4)}, rate, fr

    if args.trend:
        # arm specs materialize params lazily (one denoiser resident at a time
        # next to the 5+ GB frozen encoders)
        if args.smoke:
            specs = [("init", 0, lambda: init),
                     ("perturbed-init", 0, lambda: _perturbed(init))]
        else:
            steps = (mgr.all_steps() if args.trend_steps == "all"
                     else [int(s) for s in args.trend_steps.split(",")])
            specs = [("init", 0, lambda: init)] + [
                (f"step-{s}", s, lambda s=s: restore_step(s)[0]) for s in steps
            ]
        arms = []
        frechets = []  # bf16 arms only — the training-trend monotone check
        for label, s, make in specs:
            params = make()
            vals, rate, fr = eval_arm(params, label=label)
            frechets.append(fr)
            arms.append({
                "arm": label, "denoiser_step": s, **vals,
                "sampling_images_per_sec": round(rate, 2),
            })
            print(f"[eval] {label}: {vals}", flush=True)
            if args.w8a8:
                # twin arm: same restored params int8-quantized, same seeds
                qlabel = label + "-w8a8"
                qvals, qrate, _ = eval_arm(_quantize(params), model_q, qlabel)
                if token_space and label in arm_hists:
                    qvals["token_js_to_bf16_twin"] = round(
                        js_div(arm_hists[qlabel], arm_hists[label]), 6)
                    # raw per-position disagreement between the twins (same
                    # seeds): distinguishes "tiny distributional drift" from
                    # "the quantized program never diverged at all"
                    qvals["token_flip_to_bf16_twin"] = round(float(
                        (arm_tokens[qlabel] != arm_tokens[label]).mean()), 6)
                arms.append({
                    "arm": qlabel, "denoiser_step": s, **qvals,
                    "sampling_images_per_sec": round(qrate, 2),
                })
                print(f"[eval] {qlabel}: {qvals}", flush=True)
            del params
        if token_space:
            out = {
                "metric": "token-space Frechet + marginal JS vs training step "
                          "(generated tokens vs encode(real))",
                "note": "the quality-bearing eval under a random-init codec — "
                        "image-space FID measured flat across this training run "
                        "(see eval_fid_trend_rawreal/recon.json)",
                "token_frechet_floor_real_vs_real": round(float(floor), 4),
                "token_js_floor_real_vs_real": round(js_floor, 4),
            }
            path = os.path.join(args.workdir, "eval_token_trend.json")
        else:
            out = {
                "metric": "FID vs training step (sample -> decode -> inception pool3 -> FID)",
                "caveat": "synthetic featurizer: a random-projection FID — values are "
                          "comparable ACROSS arms (same featurizer + real set), not to "
                          "literature numbers",
                "real_set": "codec-recon" if args.real_recon else "jpeg",
                "fid_noise_floor_real_vs_real": round(float(floor), 4),
            }
            path = os.path.join(args.workdir, "eval_fid_trend.json")
        if args.w8a8:
            out["w8a8"] = {
                "levels": list(q_levels), "include_first": True,
                "note": "per-step '-w8a8' twin = same restored params "
                        "quantized, act_quant=True sampling, same seeds",
            }
            path = path.replace(".json", "_w8a8.json")
        if args.codec:
            path = path.replace(".json", "_trainedcodec.json")
        out.update({
            "device": str(dev),
            "codec": args.codec or "random-init",
            "n_per_set": args.n,
            "image": args.image,
            "sampler_steps": args.steps,
            "cfg": args.cfg,
            "arms": arms,
            "monotone_improving": bool(
                all(a > c for a, c in zip(frechets, frechets[1:]))),
            "featurize_wall_s": round(t_feat[0], 1),
            "total_wall_s": round(time.time() - t0_all, 1),
        })
    else:
        if args.smoke:
            # synthetic denoiser, perturbed so the zero-init head isn't degenerate
            params, step = _perturbed(init), 0
        else:
            params, step = restore_step()
        vals, gen_rate, _fr = eval_arm(params)
        if token_space:
            out = {
                "metric": "token-space eval on hardware (sample -> token Frechet/JS vs encode(real))",
                "token_frechet_floor_real_vs_real": round(float(floor), 4),
                "token_js_floor_real_vs_real": round(js_floor, 4),
            }
            path = os.path.join(args.workdir, "eval_token.json")
        else:
            out = {
                "metric": "eval pipeline e2e on hardware (sample -> decode -> inception pool3 -> FID)",
                "caveat": "synthetic featurizer + 500-step checkpoint: the FID value is "
                          "an execution proof, not a quality claim",
                "real_set": "codec-recon" if args.real_recon else "jpeg",
                "fid_noise_floor_real_vs_real": round(float(floor), 4),
            }
            path = os.path.join(args.workdir, "eval_fid.json")
        out.update({
            "device": str(dev),
            "codec": args.codec or "random-init",
            "denoiser_step": step,
            "n_per_set": args.n,
            "image": args.image,
            "sampler_steps": args.steps,
            "cfg": args.cfg,
            **vals,
            "sampling_images_per_sec": round(gen_rate, 2),
            "featurize_wall_s": round(t_feat[0], 1),
            "total_wall_s": round(time.time() - t0_all, 1),
        })
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out), flush=True)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
