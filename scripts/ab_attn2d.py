"""A/B (one process, interleaved): 2D vs batched-3D attention q/kv/o matmuls
in the scanned CTA repetitions.

The round-3 trace shows XLA relayouting the (B, S, C) operands of the scanned
attention's batched dots ({2,1,0} -> {1,2,0} copies, ~166 us/step total in
the level-1 scans). attn_qkvo_2d reshapes those projections to (B*S, C) 2D
matmuls, which take row-major operands as produced.

    python scripts/ab_attn2d.py --iters 30 --reps 10
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
    from paella_tpu.models import Paella, init_params, split_skip_params

    base = dataclasses.replace(
        PaellaConfig.v1_byt5_xl_inference(), split_skip_levels=(0, 1)
    )
    model_a = Paella(base)
    model_b = Paella(dataclasses.replace(base, attn_qkvo_2d=True))
    params = init_params(
        Paella(PaellaConfig.v1_byt5_xl_inference()), jax.random.PRNGKey(0),
        latent_hw=(64, 64),
    )
    params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)
    params = jax.jit(lambda p: split_skip_params(p, base))(params)

    k = jax.random.PRNGKey(2)
    b = 2
    x = jax.random.randint(jax.random.PRNGKey(1), (b, 64, 64), 0, base.num_labels)
    r = jnp.full((b,), 0.6, jnp.float32)
    byt5 = jax.random.normal(k, (b, 64, base.byt5_embd), jnp.bfloat16)
    clip = jax.random.normal(k, (b, base.clip_embd), jnp.bfloat16)

    def chain(model):
        def fwd(params, x, r, byt5, clip):
            def body(acc, i):
                f = model.apply(
                    {"params": params}, x, r + i.astype(jnp.float32) * 1e-3,
                    byt5, clip, clip, deterministic=True, return_features=True,
                )
                return acc + jnp.abs(f.astype(jnp.float32)).mean(), None

            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(args.reps))
            return acc

        return jax.jit(fwd)

    fa, fb = chain(model_a), chain(model_b)
    print("compiling A (batched-3D qkvo)...", flush=True)
    va = float(fa(params, x, r, byt5, clip))
    print("compiling B (2D qkvo)...", flush=True)
    vb = float(fb(params, x, r, byt5, clip))
    print(f"parity: A={va:.6f} B={vb:.6f} |delta|={abs(va - vb):.2e}", flush=True)
    assert abs(va - vb) < 1e-2 * max(1.0, abs(va)), (va, vb)

    ta, tb = [], []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fa(params, x, r, byt5, clip))
        ta.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.block_until_ready(fb(params, x, r, byt5, clip))
        tb.append(time.perf_counter() - t0)
    ms_a = np.array(ta) * 1e3 / args.reps
    ms_b = np.array(tb) * 1e3 / args.reps
    print(f"A 3D qkvo: per-forward p50 {np.percentile(ms_a, 50):7.3f} ms  p10 {np.percentile(ms_a, 10):7.3f}")
    print(f"B 2D qkvo: per-forward p50 {np.percentile(ms_b, 50):7.3f} ms  p10 {np.percentile(ms_b, 10):7.3f}")
    print(f"delta p50: {np.percentile(ms_a, 50) - np.percentile(ms_b, 50):+.3f} ms/forward (positive = 2D faster)")


if __name__ == "__main__":
    main()
