"""A/B the batch-8 sampler regression suspects in one process.

README documents 11.6 img/s at batch-8 (throughput_bench, commit aa547ef);
after the round-2 batch-2-tuned optimizations it measures 10.87. This toggles
the config-gated suspects interleaved: the fused head+CFG+categorical kernel
(categorical_impl) and the cond cache.

    python scripts/ab_batch8.py --iters 12
"""
from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from paella_tpu.config import PaellaConfig, SampleConfig
    from paella_tpu.models import Paella, init_params
    from paella_tpu.sampling import Conditioning, fast_key, sample

    b = args.batch
    p_cfg = PaellaConfig.v1_byt5_xl_inference()
    model = Paella(p_cfg)
    params = init_params(model, jax.random.PRNGKey(0), latent_hw=(64, 64))
    params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)
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

    variants = {}
    for name, cat, cache in (
        ("pallas+cache", "pallas", True),
        ("xla+cache", "xla", True),
        ("pallas-nocache", "pallas", False),
    ):
        s_cfg = SampleConfig(
            steps=args.steps, categorical_impl=cat, cond_cache=cache
        )

        def run(i, s_cfg=s_cfg):
            return np.asarray(
                sample(model, params, fast_key(i), cond, (b, 64, 64), uncond, s_cfg)
            )

        print(f"compiling {name}...", flush=True)
        run(0)
        variants[name] = run

    times = {name: [] for name in variants}
    for i in range(args.iters):
        for name, f in variants.items():
            t0 = time.perf_counter()
            f(i)
            times[name].append((time.perf_counter() - t0) * 1000)
    for name, ts in times.items():
        ts = np.array(ts)
        print(
            f"{name:15s}: p50 {np.percentile(ts, 50):7.1f} ms  "
            f"p10 {np.percentile(ts, 10):7.1f}  min {ts.min():7.1f}"
        )


if __name__ == "__main__":
    main()
