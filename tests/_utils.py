"""Shared test helpers."""
import jax


def perturb(params, key, scale=0.02):
    """Add small random noise to every param. The model zero-initializes its
    output head (reference: src/modules.py:195, 203-204), so freshly-initialized
    logits are ALL-ZERO — equality tests on init params would pass vacuously.
    """
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(key, len(leaves))
    noised = [
        p + scale * jax.random.normal(k, p.shape, p.dtype) for p, k in zip(leaves, keys)
    ]
    return jax.tree_util.tree_unflatten(treedef, noised)


def assert_nontrivial(x, what="output"):
    import numpy as np

    arr = np.asarray(x)
    assert float(np.abs(arr).max()) > 1e-6, f"{what} is all-zero; test would be vacuous"
