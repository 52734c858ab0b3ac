"""A/B (one process, interleaved): even/odd-split skip layout on the FULL
flagship denoiser forward (standard vs split_skip_levels=(0,1)), CFG batch 2.

The isolated-block A/B (scripts/ab_skip_layout.py) measured +125 us at up-0
and +41 us at up-1 per forward; this confirms the win survives inside the
whole program (fusion boundaries can eat isolated-block wins).

    python scripts/ab_split_e2e.py --iters 30 --reps 10
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("device:", jax.devices()[0], flush=True)

    from paella_tpu.config import PaellaConfig
    from paella_tpu.models import Paella, init_params
    from paella_tpu.models.layout import split_skip_params

    p_cfg = PaellaConfig.v1_byt5_xl_inference()
    model_a = Paella(p_cfg)
    params = init_params(model_a, jax.random.PRNGKey(0), latent_hw=(64, 64))
    params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)
    model_b = Paella(dataclasses.replace(p_cfg, split_skip_levels=(0, 1)))
    sparams = jax.jit(lambda p: split_skip_params(p, p_cfg))(params)

    k = jax.random.PRNGKey(2)
    b = 2  # CFG-batched shape
    x = jax.random.randint(jax.random.PRNGKey(1), (b, 64, 64), 0, p_cfg.num_labels)
    r = jnp.full((b,), 0.6, jnp.float32)
    byt5 = jax.random.normal(k, (b, 64, p_cfg.byt5_embd), jnp.bfloat16)
    clip = jax.random.normal(k, (b, p_cfg.clip_embd), jnp.bfloat16)

    def chain(model):
        def fwd(params, x, r, byt5, clip):
            def body(acc, i):
                f = model.apply(
                    {"params": params}, x, r + i.astype(jnp.float32) * 1e-3,
                    byt5, clip, clip, deterministic=True, return_features=True,
                )
                # |f| mean: the raw mean of LN'd features is ~0 (vacuous)
                return acc + jnp.abs(f.astype(jnp.float32)).mean(), None

            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(args.reps))
            return acc

        return jax.jit(fwd)

    fa, fb = chain(model_a), chain(model_b)
    print("compiling A (standard)...", flush=True)
    va = float(fa(params, x, r, byt5, clip))
    print("compiling B (split)...", flush=True)
    vb = float(fb(sparams, x, r, byt5, clip))
    # same math, different summation order: the scan-summed feature means
    # must agree closely
    print(f"parity: A={va:.6f} B={vb:.6f} |delta|={abs(va - vb):.2e}", flush=True)
    assert abs(va - vb) < 5e-2 * max(1.0, abs(va)), (va, vb)

    ta, tb = [], []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fa(params, x, r, byt5, clip))
        ta.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.block_until_ready(fb(sparams, x, r, byt5, clip))
        tb.append(time.perf_counter() - t0)
    ms_a = np.array(ta) * 1e3 / args.reps
    ms_b = np.array(tb) * 1e3 / args.reps
    print(f"A standard: per-forward p50 {np.percentile(ms_a, 50):7.3f} ms  p10 {np.percentile(ms_a, 10):7.3f}")
    print(f"B split   : per-forward p50 {np.percentile(ms_b, 50):7.3f} ms  p10 {np.percentile(ms_b, 10):7.3f}")
    print(f"delta p50 : {np.percentile(ms_a, 50) - np.percentile(ms_b, 50):+.3f} ms/forward (positive = split faster)")


if __name__ == "__main__":
    main()
