"""Microbench: s8xs8->s32 vs bf16 matmul rate on the MXU.

Measurement design (each earlier, simpler version produced a WRONG number):
- every scan iteration feeds its output back into the next input, so the dots
  form a dependency chain XLA cannot hoist or CSE (a loop-invariant body gets
  hoisted and times only the dispatch tunnel);
- the jit returns a SCALAR — fetching an (n, n) result over the measurement
  tunnel costs ~900 ms at 4096² bf16 (~35 MB/s), drowning the compute;
- the per-matmul time is the SLOPE between two rep counts, cancelling the
  fixed dispatch+fetch cost.

Measured on the v5e (2026-08-17): bf16 720.9 us/matmul = 190.7 TFLOP/s
(nominal 197); int8 375.5 us = 366.0 TFLOP/s (nominal 394). The double-rate
s8 MXU path is real and reachable from a plain XLA dot_general.

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

    n = 4096
    flop = 2 * n**3

    def make(acc, post, reps):
        def f(a, b):
            def body(c, _):
                o = jax.lax.dot_general(
                    c, b, (((1,), (0,)), ((), ())), preferred_element_type=acc
                )
                return post(o), None

            c, _ = jax.lax.scan(body, a, None, length=reps)
            return c.astype(jnp.float32).sum()  # scalar fetch only

        return jax.jit(f)

    cfg = {
        # all-ones stay all-ones under each renormalization
        "bf16": (jnp.bfloat16, jnp.float32, lambda o: (o * (1.0 / n)).astype(jnp.bfloat16)),
        "int8": (jnp.int8, jnp.int32, lambda o: (o >> 12).astype(jnp.int8)),
    }
    for name, (dt, acc, post) in cfg.items():
        a = jnp.ones((n, n), dt)
        b = jnp.ones((n, n), dt)
        t = {}
        for reps in (40, 160):
            f = make(acc, post, reps)
            np.asarray(f(a, b))
            ts = []
            for _ in range(8):
                t0 = time.perf_counter()
                np.asarray(f(a, b))
                ts.append(time.perf_counter() - t0)
            t[reps] = np.percentile(ts, 10)
            print(f"{name} reps={reps}: {t[reps]*1000:.1f} ms")
        per = (t[160] - t[40]) / 120
        print(f"{name}: {per*1e6:.1f} us/matmul -> {flop/per/1e12:.1f} TFLOP/s")


if __name__ == "__main__":
    main()
