"""Capture a jax.profiler trace of the flagship sampler for xprof/TensorBoard.

    python scripts/profile_sampler.py --steps 8 --out /tmp/paella_trace

The reference has no profiling support at all (SURVEY.md §5); this is the
block_until_ready + trace harness for TPU performance work.
"""
from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import dataclasses
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--out", default="/tmp/paella_trace")
    ap.add_argument("--attention", default="xla", choices=["xla", "pallas"])
    ap.add_argument("--fused", action="store_true", help="fused ResBlock Pallas kernel")
    ap.add_argument("--split", action="store_true", help="even/odd-split skip layout")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from paella_tpu.config import PaellaConfig, SampleConfig
    from paella_tpu.models import Paella, init_params
    from paella_tpu.sampling import Conditioning, fast_key, sample
    from paella_tpu.utils import trace

    p_cfg = dataclasses.replace(
        PaellaConfig.v1_byt5_xl(),
        dtype="bfloat16",
        attention_impl=args.attention,
        fused_blocks=args.fused,
        split_skip_levels=(0, 1) if args.split else (),
    )
    model = Paella(dataclasses.replace(p_cfg, split_skip_levels=()))
    params = init_params(model, jax.random.PRNGKey(0), latent_hw=(64, 64))
    # match bench.py: bf16 inference weights, otherwise every sampler call
    # re-converts the full stacked f32 weights on device (~0.9 ms x4 traced)
    params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)
    model = Paella(p_cfg)
    if args.split:
        from paella_tpu.models.layout import split_skip_params

        params = jax.jit(lambda p: split_skip_params(p, p_cfg))(params)
    k = jax.random.PRNGKey(2)
    cond = Conditioning(
        byt5=jax.random.normal(k, (1, 64, p_cfg.byt5_embd), jnp.bfloat16),
        clip=jax.random.normal(k, (1, p_cfg.clip_embd), jnp.bfloat16),
        clip_image=jax.random.normal(k, (1, p_cfg.clip_embd), jnp.bfloat16),
    )
    uncond = Conditioning(
        byt5=jax.random.normal(k, (1, 2, p_cfg.byt5_embd), jnp.bfloat16),
        clip=jax.random.normal(k, (1, p_cfg.clip_embd), jnp.bfloat16),
    )
    s_cfg = SampleConfig(steps=args.steps, categorical_impl="pallas")  # as bench.py

    # compile outside the trace
    np.asarray(sample(model, params, fast_key(0), cond, (1, 64, 64), uncond, s_cfg))

    with trace(args.out) as path:
        for i in range(args.iters):
            t0 = time.perf_counter()
            np.asarray(sample(model, params, fast_key(i), cond, (1, 64, 64), uncond, s_cfg))
            print(f"iter {i}: {(time.perf_counter()-t0)*1000:.1f} ms")
    print(f"trace written to {path} — view with `tensorboard --logdir {args.out}`")


if __name__ == "__main__":
    main()
