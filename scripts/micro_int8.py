"""Microbench: does an XLA int8xint8->int32 dot hit the v5e s8 MXU (394 TOPS)?

Times bf16 vs int8 matmuls at Paella's fc shapes, N reps per dispatch inside
one lax.scan (tunnel-amortized, CLAUDE.md A/B rule).

    python scripts/micro_int8.py
"""
from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    reps = 50
    iters = 20
    # Paella fc1 shape at level-0 (batch-2 CFG): (2*32*32, 640) @ (640, 2560)
    # plus a square 4k case to see peak behavior
    shapes = [((2048, 640), (640, 2560)), ((4096, 4096), (4096, 4096))]

    for (ms_, ks), (_, ns) in shapes:
        flop = 2 * ms_ * ks * ns
        print(f"shape ({ms_},{ks})@({ks},{ns})  {flop/1e9:.2f} GFLOP")
        for name, dt, acc in (
            ("bf16", jnp.bfloat16, jnp.float32),
            ("int8", jnp.int8, jnp.int32),
        ):
            if dt == jnp.int8:
                a = jnp.ones((ms_, ks), jnp.int8)
                b = jnp.ones((ks, ns), jnp.int8)
            else:
                a = jnp.ones((ms_, ks), dt)
                b = jnp.ones((ks, ns), dt)

            @jax.jit
            def f(a, b):
                def body(carry, _):
                    o = jax.lax.dot_general(
                        a, b, (((1,), (0,)), ((), ())), preferred_element_type=acc
                    )
                    # fold the result back so reps can't be CSE'd away
                    return carry + o[0, 0].astype(jnp.float32), None

                c, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
                return c

            np.asarray(f(a, b))
            ts = []
            for _ in range(iters):
                t0 = time.perf_counter()
                np.asarray(f(a, b))
                ts.append(time.perf_counter() - t0)
            per = np.percentile(np.array(ts), 10) / reps
            print(f"  {name}: {per*1e6:8.1f} us/matmul  {flop/per/1e12:7.1f} TFLOP/s")


if __name__ == "__main__":
    main()
