"""A/B true W8A8 (act_quant) vs bf16 on the real TPU, one process.

Both the scan-amortized CFG-shaped forward (on-chip dominated) and the
full 8-step sampler e2e p50.

    python scripts/ab_w8a8.py --iters 20 --reps 10
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
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--steps", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from paella_tpu.config import PaellaConfig, SampleConfig
    from paella_tpu.models import Paella, init_params
    from paella_tpu.quant import quantize_paella_int8
    from paella_tpu.sampling import Conditioning, fast_key, sample

    p_cfg = PaellaConfig.v1_byt5_xl_inference()
    model = Paella(p_cfg)
    model_q = Paella(dataclasses.replace(p_cfg, act_quant=True))
    params_f32 = init_params(model, jax.random.PRNGKey(0), latent_hw=(64, 64))

    def to_bf16(tree):
        return jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p, tree
        )

    params = to_bf16(params_f32)
    import flax

    qtree = quantize_paella_int8(params_f32, levels=(0, 1, 2), include_first=True)
    # bf16 everything except the int8 codes and their f32 scales
    flat = flax.traverse_util.flatten_dict(flax.core.unfreeze(qtree))
    qparams = flax.traverse_util.unflatten_dict(
        {
            k: (v if (v.dtype == jnp.int8 or k[-1] == "kernel_scale") else v.astype(jnp.bfloat16))
            for k, v in flat.items()
        }
    )
    del params_f32, qtree

    k = jax.random.PRNGKey(2)
    b = 2
    x = jax.random.randint(jax.random.PRNGKey(1), (b, 64, 64), 0, p_cfg.num_labels)
    r = jnp.full((b,), 0.6, jnp.float32)
    byt5 = jax.random.normal(k, (b, 64, p_cfg.byt5_embd), jnp.bfloat16)
    clip = jax.random.normal(k, (b, p_cfg.clip_embd), jnp.bfloat16)

    def fwd_fn(m):
        def fwd(params, x, r, byt5, clip):
            def body(acc, i):
                f = m.apply(
                    {"params": params}, x, r + i.astype(jnp.float32) * 1e-3,
                    byt5, clip, clip, deterministic=True, return_features=True,
                )
                return acc + f.astype(jnp.float32).mean(), None

            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(args.reps))
            return acc

        return jax.jit(fwd)

    variants = {
        "bf16": (fwd_fn(model), params),
        "w8a8": (fwd_fn(model_q), qparams),
    }
    for name, (f, p) in variants.items():
        print(f"compiling fwd {name}...", flush=True)
        print(f"  first value: {float(np.asarray(f(p, x, r, byt5, clip))):.4f}")

    times = {n: [] for n in variants}
    for _ in range(args.iters):
        for name, (f, p) in variants.items():
            t0 = time.perf_counter()
            jax.block_until_ready(f(p, x, r, byt5, clip))
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        ms = np.array(ts) * 1e3 / args.reps
        print(f"fwd {name}: per-forward p50 {np.percentile(ms, 50):7.3f} ms  p10 {np.percentile(ms, 10):7.3f}")

    # --- full sampler e2e ---
    cond = Conditioning(
        byt5=jax.random.normal(k, (1, 64, p_cfg.byt5_embd), jnp.bfloat16),
        clip=jax.random.normal(k, (1, p_cfg.clip_embd), jnp.bfloat16),
        clip_image=jax.random.normal(k, (1, p_cfg.clip_embd), jnp.bfloat16),
    )
    uncond = Conditioning(
        byt5=jax.random.normal(k, (1, 2, p_cfg.byt5_embd), jnp.bfloat16),
        clip=jax.random.normal(k, (1, p_cfg.clip_embd), jnp.bfloat16),
    )
    s_cfg = SampleConfig(steps=args.steps, categorical_impl="pallas")
    sv = {"bf16": (model, params), "w8a8": (model_q, qparams)}
    for name, (m, p) in sv.items():
        print(f"compiling sampler {name}...", flush=True)
        np.asarray(sample(m, p, fast_key(0), cond, (1, 64, 64), uncond, s_cfg))
    st = {n: [] for n in sv}
    for i in range(args.iters):
        for name, (m, p) in sv.items():
            t0 = time.perf_counter()
            np.asarray(sample(m, p, fast_key(i), cond, (1, 64, 64), uncond, s_cfg))
            st[name].append((time.perf_counter() - t0) * 1000)
    for name, ts in st.items():
        ts = np.array(ts)
        print(f"sampler {name}: p50 {np.percentile(ts, 50):7.1f} ms  p10 {np.percentile(ts, 10):7.1f}  min {ts.min():7.1f}")


if __name__ == "__main__":
    main()
