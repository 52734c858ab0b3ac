"""A/B (one process, interleaved): skip-concat deinterleave layouts for the
fused ResBlock (round-2 VERDICT #6 / working-notes roadmap item 2).

The up-0 skip block's depthwise planes are strided even/odd channel gathers of
concat([x, skip]) — shuffle-bound copies traced at ~106 us/step (copy 65.7 +
2x20.3) at the 1B geometry. If the surrounding level kept its activations in
an EVEN/ODD-SPLIT channel layout E(v) = [v_even || v_odd], the same planes
become contiguous half-slice concats:

    plane_a = [E(x)[:c/2] || E(skip)[:c/2]]   (== [x_even || skip_even])
    plane_b = [E(x)[c/2:] || E(skip)[c/2:]]   (== [x_odd  || skip_odd ])

and the block stays mathematically identical with fc2 columns / film / (and
nothing else) permuted by E — the depthwise/LN/fc1/GRN pipeline is untouched
because the planes themselves are unchanged. This script measures JUST that
delta on the isolated block at both skip geometries before any cross-level
plumbing is built:

    python scripts/ab_skip_layout.py --iters 40 --reps 20
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_geometry(name, b, hw, c, iters, reps):
    import jax
    import jax.numpy as jnp

    from paella_tpu.kernels.resblock import fuse_mode, fused_resblock

    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 12)
    dtype = jnp.bfloat16
    mk = lambda i, *s: (jax.random.normal(ks[i], s, jnp.float32) * 0.05).astype(dtype)

    x = mk(0, b, hw, hw, c)
    skip = mk(1, b, hw, hw, c)
    dw_k = mk(2, 3, 3, 2, c)
    dw_b = mk(3, c)
    w1, b1 = mk(4, c, 4 * c), mk(5, 4 * c)
    gamma = jnp.zeros((4 * c,), jnp.float32) + 0.1
    beta = jnp.zeros((4 * c,), jnp.float32) + 0.05
    w2, b2 = mk(6, 4 * c, c), mk(7, c)
    film = mk(8, b, 2 * c)

    mode = fuse_mode((b, hw, hw, c), dtype, c, 3, with_skip=True)
    assert mode is not None, (b, hw, c)
    bgrid = mode == "batch"

    # even-then-odd channel permutation
    E = np.concatenate([np.arange(0, c, 2), np.arange(1, c, 2)])
    E_j = jnp.asarray(E)
    w2_E = w2[:, E_j]
    b2_E = b2[E_j]
    film_E = jnp.concatenate([film[:, :c][:, E_j], film[:, c:][:, E_j]], axis=1)

    def step_a(carry, i):
        xx, ss = carry
        y = fused_resblock(
            xx, dw_k, dw_b, w1, b1, gamma, beta, w2, b2,
            film_ab=film, skip=ss, batch_grid=bgrid,
        )
        # evolve both inputs so nothing is loop-invariant (identical cost in B)
        return (y, (y * 0.5 + ss * 0.5)), None

    def step_b(carry, i):
        xx, ss = carry  # both live in E-layout
        h = c // 2
        pa = jnp.concatenate([xx[..., :h], ss[..., :h]], axis=-1)
        pb = jnp.concatenate([xx[..., h:], ss[..., h:]], axis=-1)
        y = fused_resblock(
            xx, dw_k, dw_b, w1, b1, gamma, beta, w2_E, b2_E,
            film_ab=film_E, dw_planes=(pa, pb), batch_grid=bgrid,
        )
        return (y, (y * 0.5 + ss * 0.5)), None

    @jax.jit
    def chain_a(x, s):
        (y, _), _ = jax.lax.scan(step_a, (x, s), jnp.arange(reps))
        return y

    @jax.jit
    def chain_b(x, s):
        (y, _), _ = jax.lax.scan(step_b, (x, s), jnp.arange(reps))
        return y

    # correctness: B in E-layout must invert to A exactly (identical math)
    xE, sE = x[..., E_j], skip[..., E_j]
    ya = np.asarray(chain_a(x, skip), np.float32)
    yb_E = np.asarray(chain_b(xE, sE), np.float32)
    inv = np.argsort(E)
    np.testing.assert_allclose(yb_E[..., inv], ya, rtol=2e-2, atol=2e-2)
    drift = np.abs(yb_E[..., inv] - ya).max()
    print(f"[{name}] parity over {reps} chained blocks: max |delta| {drift:.2e}")

    ta, tb = [], []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(chain_a(x, skip))
        ta.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.block_until_ready(chain_b(xE, sE))
        tb.append(time.perf_counter() - t0)
    us_a = np.array(ta) * 1e6 / reps
    us_b = np.array(tb) * 1e6 / reps
    print(
        f"[{name}] A strided-gather : p50 {np.percentile(us_a, 50):8.1f} us/block  "
        f"p10 {np.percentile(us_a, 10):8.1f}"
    )
    print(
        f"[{name}] B split-layout   : p50 {np.percentile(us_b, 50):8.1f} us/block  "
        f"p10 {np.percentile(us_b, 10):8.1f}"
    )
    print(
        f"[{name}] delta p50: {np.percentile(us_a, 50) - np.percentile(us_b, 50):+.1f}"
        f" us/block (positive = split layout faster)"
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--reps", type=int, default=20, help="blocks per dispatch")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("device:", jax.devices()[0])

    # the two skip geometries of the 1B flagship (CFG batch 2)
    run_geometry("up-0 32x32x640 ", 2, 32, 640, args.iters, args.reps)
    run_geometry("up-1 16x16x1280", 2, 16, 1280, args.iters, args.reps)


if __name__ == "__main__":
    main()
