"""A/B: batch-grid ResBlock fusion at CFG-batch-16 (batch-8 sampler) vs the
conservative gate that sends those blocks to XLA.

The 32 MB kernel vmem limit makes b=16 fusion compilable (Mosaic
double-buffers scratch at outer grids > 8: 18.1 MiB measured); whether it's
FASTER than XLA at that batch is what this measures.

    python scripts/ab_batch16_fuse.py --iters 12
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

    import paella_tpu.kernels.resblock as krb
    import paella_tpu.models.denoiser as dn
    import paella_tpu.nn.blocks as blk
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
    s_cfg = SampleConfig(steps=args.steps, categorical_impl="pallas")

    real = krb.fuse_mode

    def no_extra(x_shape, dtype, c, ks, with_skip=False, vmem_budget=14 * 2**20):
        """fuse_mode without the b>8 scratch double-buffer charge."""
        bb, h, w, ch = x_shape
        if ch != c or ks != 3 or c % 128 or (4 * c) % 512:
            return None
        item = jnp.dtype(dtype).itemsize
        planes = 3 if with_skip else 1
        weights = (c * 512 + 4 * c * 128) * 2 * item
        per = h * w * (5 + planes) * c * item
        if bb * per + weights <= vmem_budget:
            return "full"
        if per + weights <= vmem_budget:
            return "batch"
        return None

    # sample()'s jit caches on the STATIC model config — give each variant a
    # semantically-identical but distinct config (dropout is unused at
    # deterministic inference) so both programs coexist and can be timed
    # INTERLEAVED. Each is traced/compiled while its gate is monkeypatched.
    import dataclasses

    model_b = Paella(dataclasses.replace(p_cfg, dropout=(0.1, 0.1, 0.10001)))
    variants = {}
    for name, m, gate in (
        ("gated", model, real),
        ("fused16", model_b, no_extra),
    ):
        krb.fuse_mode = gate
        dn.fuse_mode = gate
        blk.fuse_mode = gate
        try:
            print(f"compiling {name}...", flush=True)
            np.asarray(sample(m, params, fast_key(0), cond, (b, 64, 64), uncond, s_cfg))
        finally:
            krb.fuse_mode = real
            dn.fuse_mode = real
            blk.fuse_mode = real
        variants[name] = m

    times = {n: [] for n in variants}
    for i in range(args.iters):
        for name, m in variants.items():
            t0 = time.perf_counter()
            np.asarray(sample(m, params, fast_key(i), cond, (b, 64, 64), uncond, s_cfg))
            times[name].append((time.perf_counter() - t0) * 1000)
    for name, ts in times.items():
        ts = np.array(ts)
        print(f"{name}: p50 {np.percentile(ts,50):7.1f} ms  p10 {np.percentile(ts,10):7.1f}  min {ts.min():7.1f}")


if __name__ == "__main__":
    main()
