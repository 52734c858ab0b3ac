"""Full serving-path latency: ByT5-XL encode + 8-step sample + decode.

Measures per-request wall with the REAL conditioning tower (random weights —
timing only), two ways:
- sequential: encode -> sample -> decode -> fetch, one request at a time
- pipelined: dispatch request N+1's encode while N's sample/decode still run
  (JAX async dispatch overlaps them on one chip's queue)

    python scripts/bench_serving.py --requests 12

--http drives the ACTUAL HTTP server (paella_tpu/serve.py) through live
sockets instead of in-process calls: sequential (one request at a time) and
overlapped (`--concurrency` in flight, steady-state ms/request). This is the
number the server really delivers, PNG encode and socket included.

    python scripts/bench_serving.py --http --requests 16 --concurrency 3
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
    ap.add_argument("--requests", type=int, default=12)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--http", action="store_true", help="drive the real HTTP server")
    ap.add_argument("--concurrency", type=int, default=3)
    ap.add_argument(
        "--server-batch", type=int, default=1,
        help="PaellaServer max_batch (dynamic micro-batching)",
    )
    ap.add_argument(
        "--byt5-w8a8", action="store_true",
        help="serve with the true-W8A8 ByT5 encoder (s8 MXU dots; "
             "measured faster at every prompt bucket in bench_byt5.py)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from paella_tpu.codec import VQModel
    from paella_tpu.cond import T5Config, T5Encoder, byt5_batch_encode
    from paella_tpu.config import PaellaConfig, SampleConfig, VQConfig
    from paella_tpu.models import Paella, init_params
    from paella_tpu.sampling import Conditioning, fast_key, sample

    # ByT5-XL tower, bf16 (random weights; timing only). Do NOT init the
    # 3.7B tower on the tunneled TPU in f32 — eval_shape + jit'd bf16
    # generation like scripts/bench_byt5.py (f32 init + cast peaks ~15 GB
    # HBM and the compile crawls).
    t5_cfg = T5Config.byt5_xl(dtype="bfloat16")
    t5 = T5Encoder(t5_cfg)
    ids0, mask0 = byt5_batch_encode(["a corgi wearing a top hat"], max_length=64)
    pad = 64 - ids0.shape[1]
    ids0 = np.pad(ids0, ((0, 0), (0, pad)))
    mask0 = np.pad(mask0, ((0, 0), (0, pad)))
    shapes = jax.eval_shape(
        lambda k: t5.init(k, jnp.zeros((1, 16), jnp.int32), jnp.ones((1, 16), bool)),
        jax.random.PRNGKey(0),
    )["params"]

    @jax.jit
    def make_t5_params():
        k = jax.random.key(0, impl="rbg")
        return jax.tree_util.tree_map(
            lambda l: jax.random.normal(k, l.shape, jnp.bfloat16) * 0.02, shapes
        )

    t5_params = make_t5_params()
    if args.byt5_w8a8:
        from paella_tpu.quant import quantize_t5_int8

        t5 = T5Encoder(dataclasses.replace(t5_cfg, act_quant=True))
        t5_params = jax.jit(quantize_t5_int8)(t5_params)
    encode = jax.jit(lambda i, m: t5.apply({"params": t5_params}, i, m))

    p_cfg = PaellaConfig.v1_byt5_xl_inference()
    model = Paella(p_cfg)
    params = init_params(model, jax.random.PRNGKey(1), latent_hw=(64, 64))
    params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)
    vq = VQModel(dataclasses.replace(VQConfig(), dtype="bfloat16"))
    vq_vars = jax.jit(lambda k: vq.init(k, jnp.zeros((1, 256, 256, 3))))(
        jax.random.PRNGKey(2)
    )
    vq_vars = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p, vq_vars
    )
    decode = jax.jit(
        lambda ix: (
            jnp.clip(vq.apply(vq_vars, ix, method=VQModel.decode_indices), 0, 1) * 255
        ).astype(jnp.uint8)
    )
    s_cfg = SampleConfig(steps=args.steps, categorical_impl="pallas")
    kc = jax.random.PRNGKey(3)
    clip = jax.random.normal(kc, (1, p_cfg.clip_embd), jnp.bfloat16)
    uncond = Conditioning(
        byt5=jnp.zeros((1, 2, p_cfg.byt5_embd), jnp.bfloat16),
        clip=jnp.zeros((1, p_cfg.clip_embd), jnp.bfloat16),
    )

    if args.http:
        run_http(args, t5, t5_params, model, params, vq, vq_vars)
        return

    def request(ids, mask):
        states = encode(ids, mask)
        cond = Conditioning(byt5=states.astype(jnp.bfloat16), byt5_mask=mask, clip=clip)
        toks = sample(model, params, fast_key(int(ids[0, 0])), cond, (1, 64, 64), uncond, s_cfg)
        return decode(toks)

    ids = jnp.asarray(ids0)
    mask = jnp.asarray(mask0)
    print("compiling...", flush=True)
    np.asarray(request(ids, mask))  # compile all three

    # sequential
    ts = []
    for i in range(args.requests):
        t0 = time.perf_counter()
        np.asarray(request(ids, mask))
        ts.append((time.perf_counter() - t0) * 1000)
    seq = np.array(ts)

    # pipelined: dispatch next encode before fetching current image
    t0 = time.perf_counter()
    imgs = []
    states = encode(ids, mask)
    for i in range(args.requests):
        cond = Conditioning(byt5=states.astype(jnp.bfloat16), byt5_mask=mask, clip=clip)
        toks = sample(model, params, fast_key(i), cond, (1, 64, 64), uncond, s_cfg)
        img = decode(toks)
        if i + 1 < args.requests:
            states = encode(ids, mask)  # overlaps with the queued sample/decode
        imgs.append(np.asarray(img))
    pipe = (time.perf_counter() - t0) * 1000 / args.requests

    print(f"sequential: p50 {np.percentile(seq, 50):.1f} ms/request  p10 {np.percentile(seq, 10):.1f}")
    print(f"pipelined : {pipe:.1f} ms/request steady-state")


def run_http(args, t5, t5_params, model, params, vq, vq_vars):
    """Measure through the real PaellaServer over live sockets."""
    import concurrent.futures
    import json as _json
    import time as _time
    import urllib.request

    import jax
    import jax.numpy as jnp
    import numpy as np

    from paella_tpu.pipeline import PaellaPipeline
    from paella_tpu.serve import PaellaServer

    pipe = PaellaPipeline(
        model=model,
        params=params,
        vq=vq,
        vq_vars=vq_vars,
        byt5_encode_fn=jax.jit(
            lambda i, m: t5.apply({"params": t5_params}, i, m).astype(jnp.bfloat16)
        ),
        byt5_max_length=64,
    )
    srv = PaellaServer(
        pipe, host="127.0.0.1", port=0,
        max_batch=args.server_batch,
        batch_window_ms=25.0,
    )
    httpd = srv.start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}/generate"
    prompt = "a corgi wearing a top hat"

    def fire(i, cfg_w=8.0, unique=True):
        # unique prompts by default: the pipeline's text-conditioning LRU
        # would otherwise skip the ByT5 tower after request 1 and this would
        # silently become a cache benchmark. The suffix stays inside the same
        # pad bucket, so no new compiles.
        body = _json.dumps(
            {
                "prompt": f"{prompt} #{i}" if unique else prompt,
                "steps": args.steps,
                "seed": i,
                "cfg": cfg_w,
            }
        ).encode()
        req = urllib.request.Request(
            url, data=body, headers={"Content-Type": "application/json"}
        )
        t0 = _time.perf_counter()
        with urllib.request.urlopen(req, timeout=3000) as r:
            png = r.read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        return (_time.perf_counter() - t0) * 1000

    print("compiling (first request)...", flush=True)
    fire(0)
    # a different cfg must NOT recompile (traced schedule); time it to prove it
    t_cfg = fire(1, cfg_w=4.0)
    print(f"cfg=4.0 second request: {t_cfg:.1f} ms (recompile would be >>10s)")

    if args.server_batch > 1:
        # warm every power-of-two batch bucket OUTSIDE the timed phase (each
        # bucket size is its own compiled sampler/encode/decode program)
        bsz = 2
        while bsz <= args.server_batch:
            print(f"warming batch bucket {bsz}...", flush=True)
            with concurrent.futures.ThreadPoolExecutor(max_workers=bsz) as ex:
                list(ex.map(fire, range(10_000 * bsz, 10_000 * bsz + bsz)))
            bsz *= 2

    seq = np.array([fire(100 + i) for i in range(args.requests)])
    print(
        f"http sequential: p50 {np.percentile(seq, 50):.1f} ms/request  "
        f"p10 {np.percentile(seq, 10):.1f}"
    )

    with concurrent.futures.ThreadPoolExecutor(max_workers=args.concurrency) as ex:
        t0 = _time.perf_counter()
        lat = list(ex.map(fire, range(200, 200 + args.requests)))
        wall = (_time.perf_counter() - t0) * 1000
    print(
        f"http overlapped (c={args.concurrency}): {wall / args.requests:.1f} "
        f"ms/request steady-state  (per-request latency p50 "
        f"{np.percentile(np.array(lat), 50):.1f} ms)"
    )

    # seed-sweep scenario: SAME prompt, different seeds — after request 1 the
    # pipeline's text-conditioning LRU skips the ByT5 tower entirely
    fire(299, unique=False)  # populate the cache entry outside the timing
    seq_hit = np.array(
        [fire(300 + i, unique=False) for i in range(args.requests)]
    )
    print(
        f"http sequential, cached prompt (seed sweep): p50 "
        f"{np.percentile(seq_hit, 50):.1f} ms/request  "
        f"p10 {np.percentile(seq_hit, 10):.1f}"
    )
    srv.stop()


if __name__ == "__main__":
    main()
