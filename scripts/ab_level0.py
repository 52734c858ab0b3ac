"""A/B (one process, interleaved): the fused-ResBlock coverage extensions —
level-0 batch-grid fusion and skip-concat first-rep fusion — vs the XLA path,
everything else identical.

The tunnel adds +-15 ms of run-to-run noise, so all variants are traced in the
same process and timed interleaved (CLAUDE.md A/B rule), and each timed
dispatch runs --reps forwards inside one lax.scan so the number is on-chip
dominated. Times the batch-2 (CFG-shaped) flagship denoiser forward; bench.py
confirms e2e afterwards.

    python scripts/ab_level0.py --iters 30 --reps 10
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time
from contextlib import contextmanager

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@contextmanager
def gate_fuse_mode(disable: str):
    """Disable part of the fused-ResBlock gate:
    'batch' — the batch-grid mode (level-0 + skip blocks fall back to XLA);
    'skip'  — only the skip-concat first repetitions fall back."""
    import paella_tpu.kernels.resblock as krb
    import paella_tpu.models.denoiser as dn

    real = krb.fuse_mode

    def gated(*a, **k):
        if disable == "skip" and k.get("with_skip"):
            return None
        m = real(*a, **k)
        return None if (disable == "batch" and m == "batch") else m

    krb.fuse_mode = gated
    dn.fuse_mode = gated
    try:
        yield
    finally:
        krb.fuse_mode = real
        dn.fuse_mode = real


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--reps", type=int, default=10, help="forwards per dispatch")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from paella_tpu.config import PaellaConfig
    from paella_tpu.models import Paella, init_params

    p_cfg = dataclasses.replace(
        PaellaConfig.v1_byt5_xl(), dtype="bfloat16", fused_blocks=True
    )
    model = Paella(p_cfg)
    params = init_params(model, jax.random.PRNGKey(0), latent_hw=(64, 64))
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p, params
    )

    k = jax.random.PRNGKey(2)
    b = 2  # CFG-batched shape
    x = jax.random.randint(jax.random.PRNGKey(1), (b, 64, 64), 0, p_cfg.num_labels)
    r = jnp.full((b,), 0.6, jnp.float32)
    byt5 = jax.random.normal(k, (b, 64, p_cfg.byt5_embd), jnp.bfloat16)
    clip = jax.random.normal(k, (b, p_cfg.clip_embd), jnp.bfloat16)

    def fwd(params, x, r, byt5, clip):
        # N forwards inside ONE jit (lax.scan): each timed dispatch amortizes
        # the ~30 ms tunnel round-trip over --reps forwards, so the number is
        # on-chip-dominated. r varies per rep to defeat CSE.
        def body(acc, i):
            f = model.apply(
                {"params": params}, x, r + i.astype(jnp.float32) * 1e-3,
                byt5, clip, clip, deterministic=True, return_features=True,
            )
            return acc + f.astype(jnp.float32).mean(), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(args.reps))
        return acc

    # trace/compile each variant while its gate is active
    variants = {}
    variants["all-fused"] = jax.jit(fwd)
    print("compiling A (all fused paths on)...", flush=True)
    np.asarray(variants["all-fused"](params, x, r, byt5, clip))

    for name, disable in (("no-skip", "skip"), ("no-batch", "batch")):
        with gate_fuse_mode(disable):
            f = jax.jit(lambda *a: fwd(*a))
            print(f"compiling {name}...", flush=True)
            np.asarray(f(params, x, r, byt5, clip))
            variants[name] = f

    # attn_block_kernel=True routes VMEM-eligible CTA repetitions (level 2 at
    # the 1B geometry) through the fused attention-block kernel
    model_ab = Paella(dataclasses.replace(p_cfg, attn_block_kernel=True))

    def fwd_ab(params, x, r, byt5, clip):
        def body(acc, i):
            f = model_ab.apply(
                {"params": params}, x, r + i.astype(jnp.float32) * 1e-3,
                byt5, clip, clip, deterministic=True, return_features=True,
            )
            return acc + f.astype(jnp.float32).mean(), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(args.reps))
        return acc

    variants["attnblk"] = jax.jit(fwd_ab)
    print("compiling attnblk...", flush=True)
    np.asarray(variants["attnblk"](params, x, r, byt5, clip))

    times = {name: [] for name in variants}
    for _ in range(args.iters):
        for name, f in variants.items():
            t0 = time.perf_counter()
            jax.block_until_ready(f(params, x, r, byt5, clip))
            times[name].append(time.perf_counter() - t0)

    for name, ts in times.items():
        ms = np.array(ts) * 1e3 / args.reps
        print(
            f"{name:9s}: per-forward p50 {np.percentile(ms, 50):7.3f} ms   "
            f"p10 {np.percentile(ms, 10):7.3f}   p90 {np.percentile(ms, 90):7.3f}"
        )


if __name__ == "__main__":
    main()
