"""Measure the frozen ByT5-XL prompt-encode latency on the real TPU.

The reference loads google/byt5-xl in fp32 on GPU and reports ~30 GB host RAM
pressure (reference readme.md:42-43); here the 3.7B-param encoder runs in bf16
on-device and this script measures the jit'd encode at the serving bucket
lengths, so the README's serving-latency claim is a measured number rather
than an extrapolation (prompt encode happens ONCE per request, before the
sampler loop).

    python scripts/bench_byt5.py            # random weights; timing only
"""
from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from paella_tpu.cond import T5Config, T5Encoder  # noqa: E402


def main():
    cfg = T5Config.byt5_xl(dtype="bfloat16")
    model = T5Encoder(cfg)

    # random bf16 weights: timing is weight-value independent
    shapes = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 16), jnp.int32), jnp.ones((1, 16), bool)),
        jax.random.PRNGKey(0),
    )["params"]
    n_params = sum(int(np.prod(s.shape)) for s in jax.tree_util.tree_leaves(shapes))

    @jax.jit
    def make_params():
        # timing is weight-value independent; one shared key is fine
        k = jax.random.key(0, impl="rbg")
        return jax.tree_util.tree_map(
            lambda l: jax.random.normal(k, l.shape, jnp.bfloat16) * 0.02, shapes
        )

    params = make_params()
    print(f"byt5-xl encoder: {n_params/1e9:.2f}B params (bf16 on-device: {n_params*2/1e9:.1f} GB)")

    from paella_tpu.quant import quantize_t5_int8

    qparams = jax.jit(quantize_t5_int8)(params)

    # params as an ARGUMENT: closing over them captures 5.2 GB of lowering
    # constants — ~480 s PER compile on the tunneled backend (>25 min for this
    # sweep). The production loader (cond/loader.py) keeps the closure form:
    # it dispatches ~7 ms/call faster (519 fewer arg handles to marshal) and
    # pays the compile once at load. Numbers here are ~7 ms/call conservative.
    @jax.jit
    def encode(p, ids, mask):
        return model.apply({"params": p}, ids, mask)

    # True W8A8 (act_quant): same int8 tree, but the dot consumes the s8
    # kernel directly on the double-rate MXU path instead of dequantizing it
    # (quant.w8a8_dot) — the halved weight traffic becomes speed.
    import dataclasses

    model_aq = T5Encoder(dataclasses.replace(cfg, act_quant=True))

    @jax.jit
    def encode_aq(p, ids, mask):
        return model_aq.apply({"params": p}, ids, mask)

    # A/B/C in ONE process (tunnel p50s drift between runs; working notes)
    results, results_q, results_aq = {}, {}, {}
    for length in (64, 128, 256, 768):
        ids = jnp.ones((1, length), jnp.int32)
        mask = jnp.ones((1, length), bool)
        for fn, p, out in (
            (encode, params, results),
            (encode, qparams, results_q),
            (encode_aq, qparams, results_aq),
        ):
            np.asarray(fn(p, ids, mask))  # compile
            times = []
            for _ in range(8):
                t0 = time.perf_counter()
                np.asarray(fn(p, ids, mask))
                times.append(time.perf_counter() - t0)
            times.sort()
            out[length] = round(times[len(times) // 2] * 1000, 2)
        print(
            f"  bucket {length:4d} bytes: p50 {results[length]:7.2f} ms bf16"
            f" | {results_q[length]:7.2f} ms int8 weight-only"
            f" | {results_aq[length]:7.2f} ms W8A8"
        )

    print(json.dumps({"metric": "byt5-xl encode p50 by bucket (ms)", "value": results,
                      "int8_weight_only": results_q, "w8a8": results_aq}))


if __name__ == "__main__":
    main()
