"""Benchmark: batch-1 8-step 256x256 end-to-end generation on one chip.

Measures the BASELINE.json headline: p50 batch-1 latency for 8-step 256x256
text-to-image sampling (sampler + VQGAN decode, CFG on) on the flagship config,
and derives images/sec/chip. `vs_baseline` is the speedup over the reference's
published single-image latency of <500 ms on a paper-era GPU (readme.md:6,
BASELINE.md) — i.e. vs_baseline = 0.5s / p50.

Implementation notes (hard-won on the tunneled TPU backend):
- rbg PRNG keys: threefry key derivation inside the sampling scan made XLA
  compilation pathological (the compile service died after ~40 min); rbg
  compiles the same program in seconds and is distributionally equivalent.
- sampler and codec decode are SEPARATE jits: fusing them into one program
  also blew up compile time (>30 min vs 11 s + 96 s separately). The extra
  dispatch costs ~1 ms.
- persistent compile cache so repeat runs skip compiles entirely.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
"""
from __future__ import annotations

import dataclasses
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

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

    # split_skip_levels: even/odd-split channel layout on the skip levels
    # (models/layout.py) — the up-path skip blocks' depthwise planes become
    # half-slices instead of strided lane gathers; measured +0.21 ms/forward
    # at the flagship geometry (scripts/ab_split_e2e.py). Params must go
    # through layout.split_skip_params (below).
    p_cfg = dataclasses.replace(
        PaellaConfig.v1_byt5_xl_inference(), split_skip_levels=(0, 1)
    )
    v_cfg = dataclasses.replace(VQConfig(), dtype="bfloat16")
    model = Paella(p_cfg)
    vq = VQModel(v_cfg)

    init_cfg_model = Paella(PaellaConfig.v1_byt5_xl_inference())
    params = init_params(init_cfg_model, jax.random.PRNGKey(0), latent_hw=(64, 64))
    # inference-time weights in bf16: halves HBM weight traffic, which dominates
    # the per-step cost once the conv paths are efficient (148 -> 140 ms measured)
    params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)
    from paella_tpu.models.layout import split_skip_params

    params = jax.jit(lambda p: split_skip_params(p, p_cfg))(params)
    vq_vars = jax.jit(lambda kk: vq.init(kk, jnp.zeros((1, 256, 256, 3))))(
        jax.random.PRNGKey(1)
    )
    vq_vars = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p, vq_vars
    )
    s_cfg = SampleConfig(steps=STEPS, categorical_impl="pallas")

    k = jax.random.PRNGKey(2)
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

    # decode straight to the uint8 image the server PNG-encodes: the codec's
    # decode is 2.4 ms on-chip; fetching f32 pixels over the measurement tunnel
    # cost ~4x the bytes of the deliverable image
    decode = jax.jit(
        lambda ix: (
            jnp.clip(vq.apply(vq_vars, ix, method=VQModel.decode_indices), 0, 1) * 255
        ).astype(jnp.uint8)
    )

    def generate(key):
        tokens = sample(model, params, key, cond, LATENT, uncond, s_cfg)
        return decode(tokens)

    def rbg_key(i: int):
        return jax.random.key(i, impl="rbg")

    # warmup / compile
    img = generate(rbg_key(42))
    np.asarray(img)

    times = []
    for i in range(12):
        t0 = time.perf_counter()
        img = np.asarray(generate(rbg_key(i)))  # fetch forces full completion
        times.append(time.perf_counter() - t0)
    times.sort()
    p50 = times[len(times) // 2]
    images_per_sec = BATCH / p50

    # sampling-only p50: fetch the token grid (16 KB) instead of the image —
    # excludes the codec decode AND the 196 KB image fetch, whose tunnel cost
    # swings e2e p50s by +-15 ms between runs (working notes). This is the
    # tunnel-stable metric to compare round over round. (Fetch, not
    # .block_until_ready(): the latter was observed returning early on the
    # tunneled backend while the computation still ran.)
    s_times = []
    for i in range(12):
        t0 = time.perf_counter()
        np.asarray(sample(model, params, rbg_key(100 + i), cond, LATENT, uncond, s_cfg))
        s_times.append(time.perf_counter() - t0)
    s_times.sort()
    s_p50 = s_times[len(s_times) // 2]

    # Reference-DEFAULT step count (steps=12, src_distributed/utils.py:97) and
    # batch-8 sampling throughput: recorded as JSON fields (not the headline)
    # so every round's driver artifact captures them — round-3 VERDICT item 9.
    # Sampling-only timing (token fetch), the tunnel-stable form; warmup first
    # (first-after-compile readings are unreliable, working notes).
    s12_cfg = dataclasses.replace(s_cfg, steps=12)
    np.asarray(sample(model, params, rbg_key(200), cond, LATENT, uncond, s12_cfg))
    t12 = []
    for i in range(6):
        t0 = time.perf_counter()
        np.asarray(sample(model, params, rbg_key(201 + i), cond, LATENT, uncond, s12_cfg))
        t12.append(time.perf_counter() - t0)
    t12.sort()

    b8 = 8
    k8 = jax.random.PRNGKey(3)
    cond8 = Conditioning(
        byt5=jax.random.normal(k8, (b8, BYT5_LEN, p_cfg.byt5_embd), jnp.bfloat16),
        clip=jax.random.normal(k8, (b8, p_cfg.clip_embd), jnp.bfloat16),
        clip_image=jax.random.normal(k8, (b8, p_cfg.clip_embd), jnp.bfloat16),
    )
    uncond8 = Conditioning(
        byt5=jax.random.normal(k8, (b8, 2, p_cfg.byt5_embd), jnp.bfloat16),
        clip=jax.random.normal(k8, (b8, p_cfg.clip_embd), jnp.bfloat16),
        clip_image=None,
    )
    latent8 = (b8, 64, 64)
    np.asarray(sample(model, params, rbg_key(300), cond8, latent8, uncond8, s_cfg))
    t8 = []
    for i in range(6):
        t0 = time.perf_counter()
        np.asarray(sample(model, params, rbg_key(301 + i), cond8, latent8, uncond8, s_cfg))
        t8.append(time.perf_counter() - t0)
    t8.sort()

    print(
        json.dumps(
            {
                "metric": "p50 batch-1 8-step 256x256 end-to-end generation latency",
                "value": round(p50 * 1000, 2),
                "unit": "ms",
                "vs_baseline": round(BASELINE_LATENCY_S / p50, 3),
                "images_per_sec_per_chip": round(images_per_sec, 3),
                "steps": STEPS,
                "p10_ms": round(times[1] * 1000, 2),
                "p90_ms": round(times[-2] * 1000, 2),
                "sampling_only_p50_ms": round(s_p50 * 1000, 2),
                "sampling_only_p10_ms": round(s_times[1] * 1000, 2),
                "sampling_only_p90_ms": round(s_times[-2] * 1000, 2),
                # the tunnel-stable round-over-round comparison: the e2e
                # headline absorbs +-15 ms of image-fetch noise (round-4
                # verdict weak #5); sampling-only excludes the fetch
                "vs_baseline_sampling_only": round(BASELINE_LATENCY_S / s_p50, 3),
                "steps12_sampling_p50_ms": round(t12[len(t12) // 2] * 1000, 2),
                "batch8_sampling_p50_ms": round(t8[len(t8) // 2] * 1000, 2),
                "batch8_images_per_sec": round(b8 / t8[len(t8) // 2], 2),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
