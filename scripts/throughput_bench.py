"""Serving-throughput benchmark: batch-N 8-step 256x256 generation, images/sec/chip.

Complements bench.py's batch-1 latency headline with the production-serving
number (the BASELINE.json metric names both).

    python scripts/throughput_bench.py --batch 8
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
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from paella_tpu.config import PaellaConfig, SampleConfig, VQConfig
    from paella_tpu.codec import VQModel
    from paella_tpu.models import Paella, init_params
    from paella_tpu.sampling import Conditioning, fast_key, sample

    b = args.batch
    p_cfg = PaellaConfig.v1_byt5_xl_inference()
    model = Paella(p_cfg)
    params = init_params(model, jax.random.PRNGKey(0), latent_hw=(64, 64))
    params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)
    vq = VQModel(dataclasses.replace(VQConfig(), dtype="bfloat16"))
    vq_vars = jax.jit(lambda k: vq.init(k, jnp.zeros((1, 256, 256, 3))))(jax.random.PRNGKey(1))
    vq_vars = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p, vq_vars
    )

    k = jax.random.PRNGKey(2)
    cond = Conditioning(
        byt5=jax.random.normal(k, (b, 64, p_cfg.byt5_embd), jnp.bfloat16),
        clip=jax.random.normal(k, (b, p_cfg.clip_embd), jnp.bfloat16),
        clip_image=jax.random.normal(k, (b, p_cfg.clip_embd), jnp.bfloat16),
    )
    uncond = Conditioning(
        byt5=jax.random.normal(k, (b, 2, p_cfg.byt5_embd), jnp.bfloat16),
        clip=jax.random.normal(k, (b, p_cfg.clip_embd), jnp.bfloat16),
    )
    s_cfg = SampleConfig(steps=args.steps, categorical_impl="pallas")
    decode = jax.jit(
        lambda ix: (
            jnp.clip(vq.apply(vq_vars, ix, method=VQModel.decode_indices), 0, 1) * 255
        ).astype(jnp.uint8)
    )

    def gen(key):
        return decode(sample(model, params, key, cond, (b, 64, 64), uncond, s_cfg))

    np.asarray(gen(fast_key(0)))  # compile
    times = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        np.asarray(gen(fast_key(i)))
        times.append(time.perf_counter() - t0)
    times.sort()
    p50 = times[len(times) // 2]
    print(
        json.dumps(
            {
                "metric": f"batch-{b} {args.steps}-step 256x256 generation throughput",
                "images_per_sec_per_chip": round(b / p50, 3),
                "p50_batch_latency_ms": round(p50 * 1000, 2),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
