"""Benchmark: batch-1 8-step 256x256 end-to-end generation on one chip.

Measures the BASELINE.json headline: p50 batch-1 latency for 8-step 256x256
text-to-image sampling (sampler + VQGAN decode, CFG on) on the flagship config,
and derives images/sec/chip. `vs_baseline` is the speedup over the reference's
published single-image latency of <500 ms on a paper-era GPU (readme.md:6,
BASELINE.md) — i.e. vs_baseline = 0.5s / p50.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
"""
from __future__ import annotations

import dataclasses
import json
import time

import jax
import jax.numpy as jnp

# persistent compile cache: repeat bench runs skip the (minutes-long on tunneled
# backends) XLA compile of the 1B sampler program
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINE_LATENCY_S = 0.5  # reference readme.md:6: "in less than 500ms"
STEPS = 8
BATCH = 1
LATENT = (BATCH, 64, 64)
BYT5_LEN = 64


def main():
    from paella_tpu.config import PaellaConfig, SampleConfig, VQConfig
    from paella_tpu.codec import VQModel
    from paella_tpu.models import Paella, init_params
    from paella_tpu.sampling import Conditioning, sample

    p_cfg = dataclasses.replace(PaellaConfig.v1_byt5_xl(), dtype="bfloat16")
    v_cfg = dataclasses.replace(VQConfig(), dtype="bfloat16")
    model = Paella(p_cfg)
    vq = VQModel(v_cfg)

    k = jax.random.PRNGKey(0)
    params = init_params(model, k, latent_hw=(64, 64))
    vq_vars = jax.jit(lambda kk: vq.init(kk, jnp.zeros((1, 256, 256, 3))))(
        jax.random.PRNGKey(1)
    )
    s_cfg = SampleConfig(steps=STEPS)

    cond = Conditioning(
        byt5=jax.random.normal(k, (BATCH, BYT5_LEN, p_cfg.byt5_embd), jnp.bfloat16),
        clip=jax.random.normal(k, (BATCH, p_cfg.clip_embd), jnp.bfloat16),
        clip_image=jax.random.normal(k, (BATCH, p_cfg.clip_embd), jnp.bfloat16),
    )
    uncond = Conditioning(
        byt5=jax.random.normal(k, (BATCH, 2, p_cfg.byt5_embd), jnp.bfloat16),
        clip=jax.random.normal(k, (BATCH, p_cfg.clip_embd), jnp.bfloat16),
        clip_image=None,
    )

    @jax.jit
    def generate(key):
        tokens = sample(model, params, key, cond, LATENT, uncond, s_cfg)
        return vq.apply(vq_vars, tokens, method=VQModel.decode_indices)

    # warmup / compile
    img = generate(jax.random.PRNGKey(42))
    img.block_until_ready()

    times = []
    for i in range(12):
        t0 = time.perf_counter()
        img = generate(jax.random.PRNGKey(i))
        img.block_until_ready()
        times.append(time.perf_counter() - t0)
    times.sort()
    p50 = times[len(times) // 2]
    images_per_sec = BATCH / p50

    print(
        json.dumps(
            {
                "metric": "p50 batch-1 8-step 256x256 end-to-end generation latency",
                "value": round(p50 * 1000, 2),
                "unit": "ms",
                "vs_baseline": round(BASELINE_LATENCY_S / p50, 3),
                "images_per_sec_per_chip": round(images_per_sec, 3),
                "steps": STEPS,
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
