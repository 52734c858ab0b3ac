"""A/B per-level remat policies for the train step in ONE process.

Arms (small config, batch 16 unless overridden):
  all   = remat every level's scanned reps (the previous default behavior)
  100   = recompute only level 0, store levels 1-2 (the FLOP-dense ones)
  110   = store only level 2
Full no-remat at batch 16 does not compile on one chip (stored level-0
activations blow HBM), so it is not an arm.

    python scripts/ab_remat.py --config small --batch 16 --iters 20
"""
from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import dataclasses
import gc
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="small", choices=["small", "1b"])
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--image", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--adam-moment-dtype", default="float32")
    ap.add_argument(
        "--arm", default=None,
        help="run only this arm (all|100|110) — buffer frees on the tunneled "
        "backend are deferred enough that later arms can OOM spuriously; "
        "single-arm fresh processes give the clean per-arm verdicts",
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

    base = PaellaConfig.v1_byt5_xl()
    if args.config != "1b":
        base = dataclasses.replace(
            base, c_hidden=(320, 640, 640), nhead=(-1, 8, 8), blocks=(4, 12, 4)
        )
    base = dataclasses.replace(base, dtype="bfloat16", remat=True)
    vq = VQModel(dataclasses.replace(VQConfig(), dtype="bfloat16"))

    f = 4
    hw = args.image // f
    params = init_params(
        Paella(base), jax.random.PRNGKey(0), latent_hw=(hw, hw)
    )
    print(f"denoiser params: {count_params(params)/1e6:.0f}M")
    vq_vars = jax.jit(lambda k: vq.init(k, jnp.zeros((1, args.image, args.image, 3))))(
        jax.random.PRNGKey(1)
    )
    t_cfg = TrainConfig(warmup_updates=10, adam_moment_dtype=args.adam_moment_dtype)

    b = args.batch
    k = jax.random.PRNGKey(2)
    batch = Batch(
        images=jax.random.uniform(k, (b, args.image, args.image, 3)),
        byt5=jax.random.normal(k, (b, 16, base.byt5_embd)),
        byt5_mask=jnp.ones((b, 16), bool),
        clip=jax.random.normal(k, (b, base.clip_embd)),
        clip_image=jax.random.normal(k, (b, base.clip_embd)),
    )
    null = NullCond(
        byt5=jnp.zeros((1, 2, base.byt5_embd)),
        byt5_mask=jnp.ones((1, 2), bool),
        clip=jnp.zeros((1, base.clip_embd)),
    )
    rng = jax.random.key(3, impl="rbg")

    arms = {
        "all": None,
        "100": (True, False, False),
        "110": (True, True, False),
    }
    if args.arm:
        arms = {args.arm: arms[args.arm]}
    def run_arm(levels):
        """All per-arm device buffers live and die inside this frame."""
        p_cfg = dataclasses.replace(base, remat_levels=levels)
        model = Paella(p_cfg)
        step = jax.jit(make_train_step(model, vq, t_cfg), donate_argnums=(0,))
        # donation consumes state.params — give each arm its own copy of the
        # shared init params
        state = create_train_state(jax.tree_util.tree_map(jnp.copy, params), t_cfg)
        t0 = time.perf_counter()
        compiled = step.lower(state, vq_vars, batch, null, rng).compile()
        compile_s = time.perf_counter() - t0
        peak = compiled.memory_analysis().temp_size_in_bytes / 2**20
        s, m = compiled(state, vq_vars, batch, null, rng)
        float(m["loss"])  # full sync before the timed window
        t0 = time.perf_counter()
        for _ in range(args.iters):
            s, m = compiled(s, vq_vars, batch, null, rng)
        loss = float(m["loss"])
        wall = time.perf_counter() - t0
        return {
            "step_ms": round(wall / args.iters * 1000, 2),
            "peak_temp_mb": round(peak, 1),
            "loss": round(loss, 4),
            "compile_s": round(compile_s, 1),
        }

    results = {}
    for name, levels in arms.items():
        try:
            results[name] = run_arm(levels)
        except Exception as e:  # OOM arms report instead of aborting the A/B
            results[name] = {"error": type(e).__name__, "detail": str(e)[:120]}
        print(name, json.dumps(results[name]), flush=True)
        gc.collect()

    print(json.dumps({"metric": f"{args.config} remat-policy A/B, batch-{b}", **results}))


if __name__ == "__main__":
    main()
