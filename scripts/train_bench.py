"""Training-throughput benchmark on one chip: full train step (frozen codec
encode + denoiser fwd/bwd + AdamW) over synthetic data.

    python scripts/train_bench.py --config small --batch 16
    python scripts/train_bench.py --config 1b --batch 8

Prints one JSON line with steps/sec and images/sec/chip.
"""
from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import dataclasses
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="small", choices=["small", "1b"])
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--image", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument(
        "--no-remat", action="store_true",
        help="disable per-block rematerialization (stores all activations; "
        "fits at the small config on one 16 GB chip and skips the recompute)",
    )
    ap.add_argument(
        "--remat-levels", default=None,
        help="comma list of 0/1 per UNet level, e.g. 1,0,0 = recompute only "
        "level 0 and store levels 1-2 (overrides --no-remat for the scans)",
    )
    ap.add_argument(
        "--adam-moment-dtype", default="float32", choices=["float32", "bfloat16"],
        help="storage dtype for both Adam moments (bfloat16 halves optimizer "
        "state: lets the 1B step take batch 8+ on one 16 GB chip)",
    )
    ap.add_argument(
        "--trace", default=None,
        help="capture a jax.profiler trace of 3 steps to this dir "
        "(analyze with scripts/trace_summary.py)",
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

    remat_levels = (
        tuple(bool(int(x)) for x in args.remat_levels.split(","))
        if args.remat_levels
        else None
    )
    if args.config == "1b":
        p_cfg = dataclasses.replace(
            PaellaConfig.v1_byt5_xl(), dtype="bfloat16", remat=not args.no_remat,
            remat_levels=remat_levels,
        )
    else:
        # ~280M-parameter geometry: half width, half depth of the flagship
        p_cfg = dataclasses.replace(
            PaellaConfig.v1_byt5_xl(),
            c_hidden=(320, 640, 640),
            nhead=(-1, 8, 8),
            blocks=(4, 12, 4),
            dtype="bfloat16",
            remat=not args.no_remat,
            remat_levels=remat_levels,
        )
    vq = VQModel(dataclasses.replace(VQConfig(), dtype="bfloat16"))

    f = 4
    hw = args.image // f
    params = init_params(model := Paella(p_cfg), jax.random.PRNGKey(0), latent_hw=(hw, hw))
    print(f"denoiser params: {count_params(params)/1e6:.0f}M")
    vq_vars = jax.jit(lambda k: vq.init(k, jnp.zeros((1, args.image, args.image, 3))))(
        jax.random.PRNGKey(1)
    )
    t_cfg = TrainConfig(warmup_updates=10, adam_moment_dtype=args.adam_moment_dtype)
    state = create_train_state(params, t_cfg)
    step_jit = jax.jit(make_train_step(model, vq, t_cfg), donate_argnums=(0,))

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

    # AOT compile for the peak-memory analysis; FLOPs come from the
    # jaxpr-walking counter (XLA's cost_analysis does not descend into the
    # scan while-bodies and undercounts this model ~5x)
    from paella_tpu.utils.flops import count_flops

    flops = count_flops(step_jit, state, vq_vars, batch, null, rng)
    compiled = step_jit.lower(state, vq_vars, batch, null, rng).compile()
    peak_mb = None
    try:
        peak_mb = compiled.memory_analysis().temp_size_in_bytes / 2**20
    except Exception:
        pass
    step = compiled

    state, metrics = step(state, vq_vars, batch, null, rng)  # warm
    print("loss after 1 step:", float(metrics["loss"]))

    if args.trace:
        from paella_tpu.utils import trace

        with trace(args.trace) as path:
            for _ in range(3):
                state, metrics = step(state, vq_vars, batch, null, rng)
            jax.block_until_ready(state.params)
            float(metrics["loss"])  # fetch: real completion barrier
        print(f"trace written to {path}")

    # steady-state pipelined throughput: enqueue N steps, one final fetch
    # (block_until_ready on the tunneled backend acks before execution, so
    # per-step timing under-reports; total-wall over N is the honest number)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, metrics = step(state, vq_vars, batch, null, rng)
    loss = float(metrics["loss"])
    wall = time.perf_counter() - t0
    per_step = wall / args.iters
    out = {
        "metric": f"{args.config} train step, batch-{b} {args.image}^2",
        "steady_state_step_ms": round(per_step * 1000, 2),
        "images_per_sec_per_chip": round(b / per_step, 2),
        "loss": round(loss, 4),
        "device": str(jax.devices()[0]),
    }
    if flops:
        # jaxpr-walked matmul+conv flops / wall. v5e bf16 peak is 197 TFLOP/s;
        # with per-block remat the count includes the recompute, so this is
        # hardware utilization, not model MFU.
        out["tflops_per_sec"] = round(flops / per_step / 1e12, 1)
        out["hw_util_pct_vs_v5e_peak"] = round(flops / per_step / 197e12 * 100, 1)
    if peak_mb is not None:
        out["peak_temp_mb"] = round(peak_mb, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
