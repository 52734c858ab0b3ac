"""A/B the CE-loss formulation inside the full train step, in ONE process.

A = materialized log_softmax (the pre-r3 form: autodiff saves a full f32
    (B,H,W,K) softmax residual for the backward — 2.15 GB at batch-16 256^2
    with the 8192-entry codebook, traced at 4.9 ms/step as fusion.2818)
B = logsumexp form under jax.checkpoint (rematerializes the reductions from
    the bf16 logits in the backward; no (B,H,W,K) f32 residual)

Prints, for each arm: XLA's compiled peak-memory analysis and the
steady-state step time (pipelined total-wall over N, per the timing rules in
train_bench.py), plus a value-level loss/grad-norm agreement check.

    python scripts/ab_ce_loss.py --config small --batch 16 --iters 10
"""
from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import dataclasses
import json
import time

import numpy as np


def materialized_ce(logits, labels, weight, smoothing):
    """The pre-r3 form: log_softmax residual saved for backward."""
    import jax
    import jax.numpy as jnp

    lsm = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(lsm, labels[..., None], axis=-1)[..., 0]
    smooth = -jnp.mean(lsm, axis=-1)
    loss = (1.0 - smoothing) * nll + smoothing * smooth
    per_image = jnp.sum(loss * weight, axis=(1, 2)) / jnp.sum(weight, axis=(1, 2))
    return jnp.mean(per_image)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="small", choices=["small", "1b"])
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--image", type=int, default=256)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument(
        "--compile-only", action="store_true",
        help="stop after compile + memory analysis per arm (no execution; the "
        "1B step without donation does not fit for execution on one 16 GB chip)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from paella_tpu.config import PaellaConfig, TrainConfig, VQConfig
    from paella_tpu.codec import VQModel
    from paella_tpu.models import Paella, count_params, init_params
    from paella_tpu.train import Batch, NullCond, create_train_state, make_train_step
    from paella_tpu.train import trainer as trainer_mod

    if args.config == "1b":
        p_cfg = dataclasses.replace(PaellaConfig.v1_byt5_xl(), dtype="bfloat16", remat=True)
    else:
        p_cfg = dataclasses.replace(
            PaellaConfig.v1_byt5_xl(),
            c_hidden=(320, 640, 640),
            nhead=(-1, 8, 8),
            blocks=(4, 12, 4),
            dtype="bfloat16",
            remat=True,
        )
    vq = VQModel(dataclasses.replace(VQConfig(), dtype="bfloat16"))

    f = 4
    hw = args.image // f
    params = init_params(model := Paella(p_cfg), jax.random.PRNGKey(0), latent_hw=(hw, hw))
    print(f"denoiser params: {count_params(params)/1e6:.0f}M")
    vq_vars = jax.jit(lambda k: vq.init(k, jnp.zeros((1, args.image, args.image, 3))))(
        jax.random.PRNGKey(1)
    )
    t_cfg = TrainConfig(warmup_updates=10)
    state = create_train_state(params, t_cfg)

    b = args.batch
    k = jax.random.PRNGKey(2)
    batch = Batch(
        images=jax.random.uniform(k, (b, args.image, args.image, 3)),
        byt5=jax.random.normal(k, (b, 16, p_cfg.byt5_embd)),
        byt5_mask=jnp.ones((b, 16), bool),
        clip=jax.random.normal(k, (b, p_cfg.clip_embd)),
        clip_image=jax.random.normal(k, (b, p_cfg.clip_embd)),
    )
    null = NullCond(
        byt5=jnp.zeros((1, 2, p_cfg.byt5_embd)),
        byt5_mask=jnp.ones((1, 2), bool),
        clip=jnp.zeros((1, p_cfg.clip_embd)),
    )
    rng = jax.random.key(3, impl="rbg")

    remat_ce = trainer_mod.smoothed_weighted_ce  # current (checkpointed) form
    arms = {"A_materialized": materialized_ce, "B_remat_logsumexp": remat_ce}
    results = {}
    for name, ce in arms.items():
        trainer_mod.smoothed_weighted_ce = ce
        step = jax.jit(make_train_step(model, vq, t_cfg))
        lowered = step.lower(state, vq_vars, batch, null, rng)
        t0 = time.perf_counter()
        compiled = lowered.compile()
        compile_s = time.perf_counter() - t0
        mem = compiled.memory_analysis()
        if args.compile_only:
            results[name] = {
                "peak_temp_mb": round(mem.temp_size_in_bytes / 2**20, 1),
                "argument_mb": round(mem.argument_size_in_bytes / 2**20, 1),
                "compile_s": round(compile_s, 1),
            }
            print(name, json.dumps(results[name]), flush=True)
            del step, lowered, compiled
            import gc

            gc.collect()
            continue
        s, m = compiled(state, vq_vars, batch, null, rng)  # warm
        loss0 = float(m["loss"])
        t0 = time.perf_counter()
        s2 = s
        for _ in range(args.iters):
            s2, m = compiled(s2, vq_vars, batch, null, rng)
        lossN = float(m["loss"])
        wall = time.perf_counter() - t0
        results[name] = {
            "peak_temp_mb": round(mem.temp_size_in_bytes / 2**20, 1),
            "argument_mb": round(mem.argument_size_in_bytes / 2**20, 1),
            "step_ms": round(wall / args.iters * 1000, 2),
            "loss_step1": round(loss0, 6),
            "loss_stepN": round(lossN, 6),
            "compile_s": round(compile_s, 1),
        }
        print(name, json.dumps(results[name]), flush=True)
        del step, lowered, compiled, s, s2, m
        import gc

        gc.collect()
    trainer_mod.smoothed_weighted_ce = remat_ce

    da = results["A_materialized"]
    db = results["B_remat_logsumexp"]
    summary = {
        "metric": f"{args.config} train step CE A/B, batch-{b} {args.image}^2",
        "peak_temp_saving_mb": round(da["peak_temp_mb"] - db["peak_temp_mb"], 1),
    }
    if not args.compile_only:
        summary.update(
            step_ms_delta=round(db["step_ms"] - da["step_ms"], 2),
            loss_agree_step1=abs(da["loss_step1"] - db["loss_step1"]) < 1e-3,
            loss_agree_stepN=abs(da["loss_stepN"] - db["loss_stepN"]) < 1e-2,
        )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
