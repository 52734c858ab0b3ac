"""A/B (one process, interleaved): the fastest-known opt-in config —
split-skip layout + true W8A8 — vs the bench default (split + bf16).

Round-2 measured W8A8 alone at sampler p50 104.2 vs 111.1 (bf16); round 3
landed the split layout in the default path. This measures the COMBINED
opt-in stack on the full sampling path (composition parity is pinned by
tests/test_layout.py::test_split_layout_with_w8a8).

    python scripts/ab_w8a8_split.py --iters 30
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
    ap.add_argument("--steps", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("device:", jax.devices()[0], flush=True)

    from paella_tpu.config import PaellaConfig, SampleConfig
    from paella_tpu.models import Paella, init_params, split_skip_params
    from paella_tpu.quant import quantize_paella_int8
    from paella_tpu.sampling import Conditioning, fast_key, sample

    base = dataclasses.replace(
        PaellaConfig.v1_byt5_xl_inference(), split_skip_levels=(0, 1)
    )
    model_a = Paella(base)
    model_b = Paella(dataclasses.replace(base, act_quant=True))

    params = init_params(
        Paella(PaellaConfig.v1_byt5_xl_inference()), jax.random.PRNGKey(0),
        latent_hw=(64, 64),
    )
    params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)

    @jax.jit
    def prep_a(p):
        return split_skip_params(p, base)

    @jax.jit
    def prep_b(p):
        return split_skip_params(
            quantize_paella_int8(p, levels=(0, 1, 2), include_first=True), base
        )

    params_a = prep_a(params)
    params_b = prep_b(params)

    k = jax.random.PRNGKey(2)
    cond = Conditioning(
        byt5=jax.random.normal(k, (1, 64, base.byt5_embd), jnp.bfloat16),
        clip=jax.random.normal(k, (1, base.clip_embd), jnp.bfloat16),
        clip_image=jax.random.normal(k, (1, base.clip_embd), jnp.bfloat16),
    )
    uncond = Conditioning(
        byt5=jax.random.normal(k, (1, 2, base.byt5_embd), jnp.bfloat16),
        clip=jax.random.normal(k, (1, base.clip_embd), jnp.bfloat16),
    )
    s_cfg = SampleConfig(steps=args.steps, categorical_impl="pallas")

    def run_a(i):
        return sample(model_a, params_a, fast_key(i), cond, (1, 64, 64), uncond, s_cfg)

    def run_b(i):
        return sample(model_b, params_b, fast_key(i), cond, (1, 64, 64), uncond, s_cfg)

    print("compiling A (split + bf16)...", flush=True)
    np.asarray(run_a(0))
    print("compiling B (split + W8A8)...", flush=True)
    np.asarray(run_b(0))

    # NB: time via the token FETCH — on the tunneled backend,
    # .block_until_ready() on the token array was observed returning in ~2 ms
    # while the computation was still running (CLAUDE.md); np.asarray is the
    # reliable completion barrier (16 KB fetch, ~1 tunnel round trip).
    ta, tb = [], []
    for i in range(args.iters):
        t0 = time.perf_counter()
        np.asarray(run_a(100 + i))
        ta.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(run_b(100 + i))
        tb.append(time.perf_counter() - t0)
    ms_a, ms_b = np.array(ta) * 1e3, np.array(tb) * 1e3
    print(f"A split+bf16 : sampler p50 {np.percentile(ms_a, 50):7.2f} ms  min {ms_a.min():7.2f}")
    print(f"B split+W8A8 : sampler p50 {np.percentile(ms_b, 50):7.2f} ms  min {ms_b.min():7.2f}")
    print(f"delta p50    : {np.percentile(ms_a, 50) - np.percentile(ms_b, 50):+.2f} ms (positive = W8A8 faster)")


if __name__ == "__main__":
    main()
