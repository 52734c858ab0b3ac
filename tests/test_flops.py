"""utils/flops.py: jaxpr-walking FLOP counter (the tool behind the MFU numbers
in scripts/train_bench.py — XLA's cost_analysis misses scan bodies)."""
import jax
import jax.numpy as jnp
import numpy as np

from paella_tpu.utils.flops import count_flops, mfu


def test_dense_matmul():
    a = jnp.zeros((8, 64))
    b = jnp.zeros((64, 32))
    assert count_flops(lambda x, y: x @ y, a, b) == 2 * 8 * 64 * 32


def test_batched_dot():
    a = jnp.zeros((4, 8, 64))
    b = jnp.zeros((4, 64, 32))
    got = count_flops(lambda x, y: jnp.einsum("bik,bkj->bij", x, y), a, b)
    assert got == 2 * 4 * 8 * 64 * 32


def test_scan_multiplies_by_length():
    w = jnp.zeros((5, 16, 16))
    x = jnp.zeros((16,))

    def f(w, x):
        def body(h, wi):
            return wi @ h, None

        h, _ = jax.lax.scan(body, x, w)
        return h

    assert count_flops(f, w, x) == 5 * 2 * 16 * 16


def test_conv():
    x = jnp.zeros((2, 8, 8, 16))
    k = jnp.zeros((3, 3, 16, 32))

    def f(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    # per output element: 3*3*16 MACs; output (2,8,8,32)
    assert count_flops(f, x, k) == 2 * (2 * 8 * 8 * 32) * (3 * 3 * 16)


def test_depthwise_conv_groups():
    x = jnp.zeros((1, 8, 8, 16))
    k = jnp.zeros((3, 3, 1, 16))

    def f(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", feature_group_count=16,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    assert count_flops(f, x, k) == 2 * (8 * 8 * 16) * (3 * 3)


def test_grad_adds_dgrad_and_wgrad():
    a = jnp.zeros((8, 64))
    w = jnp.zeros((64, 32))
    one = 2 * 8 * 64 * 32

    def f(a, w):
        return jnp.sum(jnp.tanh(a @ w))

    assert count_flops(f, a, w) == one
    # grad wrt both operands: fwd (needed for tanh') + dgrad + wgrad
    assert count_flops(jax.grad(f, argnums=(0, 1)), a, w) == 3 * one
    # grad wrt w only: fwd + wgrad (no dgrad for the constant operand)
    assert count_flops(jax.grad(f, argnums=1), a, w) == 2 * one


def test_remat_counts_recompute():
    a = jnp.zeros((8, 64))
    w = jnp.zeros((64, 64))
    one = 2 * 8 * 64 * 64

    def f(w):
        g = jax.checkpoint(lambda w: jnp.tanh(a @ w))
        return jnp.sum(g(w))

    assert count_flops(f, w) == one
    # fwd + remat recompute in the bwd + wgrad (a is a constant: no dgrad)
    assert count_flops(jax.grad(f), w) == 3 * one


def test_paella_tiny_forward_magnitude():
    import dataclasses

    from paella_tpu.config import PaellaConfig
    from paella_tpu.models import Paella, init_params

    cfg = PaellaConfig.tiny()
    model = Paella(cfg)
    params = init_params(model, jax.random.PRNGKey(0), latent_hw=(16, 16))
    x = jnp.zeros((1, 16, 16), jnp.int32)
    t = jnp.ones((1,))
    byt5 = jnp.zeros((1, 4, cfg.byt5_embd))
    clip = jnp.zeros((1, cfg.clip_embd))

    def f(params, x):
        return model.apply(
            {"params": params}, x, t, byt5, clip, clip, deterministic=True
        )

    flops = count_flops(f, params, x)
    # tiny model: at least the clf head (c0 -> labels*patch^2) and well under 1e12
    assert 1e6 < flops < 1e12
    assert 0.0 < mfu(flops, 1.0) < 1.0
