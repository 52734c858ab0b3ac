"""Classic-FID InceptionV3 parity: our JAX pool3 featurizer vs a
torch-functional evaluation of the SAME synthetic state dict (the
test_torch_parity.py interpreter pattern — no torchvision in this image).

Covers both graph variants ("fid" = pytorch-fid/TF semantics with
count_include_pad=False avg pools and the Mixed_7c max-pool quirk;
"torchvision" = stock semantics), plus the end-to-end FID wiring.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from paella_tpu.eval.inception import (
    convert_inception,
    inception_features,
    inception_pool3,
    inception_preprocess,
)

# (block -> {unit: (cin, cout, ksize)}); ksize int or (kh, kw). Channel
# arithmetic per torchvision.models.inception_v3.
def _a(cin, pool):
    return {
        "branch1x1": (cin, 64, 1),
        "branch5x5_1": (cin, 48, 1),
        "branch5x5_2": (48, 64, 5),
        "branch3x3dbl_1": (cin, 64, 1),
        "branch3x3dbl_2": (64, 96, 3),
        "branch3x3dbl_3": (96, 96, 3),
        "branch_pool": (cin, pool, 1),
    }


def _c(c7):
    return {
        "branch1x1": (768, 192, 1),
        "branch7x7_1": (768, c7, 1),
        "branch7x7_2": (c7, c7, (1, 7)),
        "branch7x7_3": (c7, 192, (7, 1)),
        "branch7x7dbl_1": (768, c7, 1),
        "branch7x7dbl_2": (c7, c7, (7, 1)),
        "branch7x7dbl_3": (c7, c7, (1, 7)),
        "branch7x7dbl_4": (c7, c7, (7, 1)),
        "branch7x7dbl_5": (c7, 192, (1, 7)),
        "branch_pool": (768, 192, 1),
    }


def _e(cin):
    return {
        "branch1x1": (cin, 320, 1),
        "branch3x3_1": (cin, 384, 1),
        "branch3x3_2a": (384, 384, (1, 3)),
        "branch3x3_2b": (384, 384, (3, 1)),
        "branch3x3dbl_1": (cin, 448, 1),
        "branch3x3dbl_2": (448, 384, 3),
        "branch3x3dbl_3a": (384, 384, (1, 3)),
        "branch3x3dbl_3b": (384, 384, (3, 1)),
        "branch_pool": (cin, 192, 1),
    }


SHAPES = {
    "Conv2d_1a_3x3": {None: (3, 32, 3)},
    "Conv2d_2a_3x3": {None: (32, 32, 3)},
    "Conv2d_2b_3x3": {None: (32, 64, 3)},
    "Conv2d_3b_1x1": {None: (64, 80, 1)},
    "Conv2d_4a_3x3": {None: (80, 192, 3)},
    "Mixed_5b": _a(192, 32),
    "Mixed_5c": _a(256, 64),
    "Mixed_5d": _a(288, 64),
    "Mixed_6a": {
        "branch3x3": (288, 384, 3),
        "branch3x3dbl_1": (288, 64, 1),
        "branch3x3dbl_2": (64, 96, 3),
        "branch3x3dbl_3": (96, 96, 3),
    },
    "Mixed_6b": _c(128),
    "Mixed_6c": _c(160),
    "Mixed_6d": _c(160),
    "Mixed_6e": _c(192),
    "Mixed_7a": {
        "branch3x3_1": (768, 192, 1),
        "branch3x3_2": (192, 320, 3),
        "branch7x7x3_1": (768, 192, 1),
        "branch7x7x3_2": (192, 192, (1, 7)),
        "branch7x7x3_3": (192, 192, (7, 1)),
        "branch7x7x3_4": (192, 192, 3),
    },
    "Mixed_7b": _e(1280),
    "Mixed_7c": _e(2048),
}


def synth_inception_state_dict(seed=0):
    rng = np.random.default_rng(seed)
    sd = {}
    for block, units in SHAPES.items():
        for unit, (cin, cout, k) in units.items():
            kh, kw = (k, k) if isinstance(k, int) else k
            p = block if unit is None else f"{block}.{unit}"
            # kaiming-ish conv scale keeps activations alive through 30+ layers
            sd[f"{p}.conv.weight"] = rng.standard_normal(
                (cout, cin, kh, kw), dtype=np.float32
            ) * (2.0 / (cin * kh * kw)) ** 0.5
            sd[f"{p}.bn.weight"] = (1 + 0.1 * rng.standard_normal(cout)).astype(np.float32)
            sd[f"{p}.bn.bias"] = (0.05 * rng.standard_normal(cout)).astype(np.float32)
            sd[f"{p}.bn.running_mean"] = (0.05 * rng.standard_normal(cout)).astype(np.float32)
            sd[f"{p}.bn.running_var"] = (1 + 0.3 * rng.uniform(size=cout)).astype(np.float32)
    # classifier keys the converter must ignore
    sd["fc.weight"] = np.zeros((1008, 2048), np.float32)
    sd["fc.bias"] = np.zeros((1008,), np.float32)
    return sd


# ---------------------------------------------------------------------------
# torch-functional interpreter
# ---------------------------------------------------------------------------


def t_bc(sd, p, x, stride=1, padding=0):
    x = F.conv2d(x, sd[f"{p}.conv.weight"], None, stride=stride, padding=padding)
    x = F.batch_norm(
        x,
        sd[f"{p}.bn.running_mean"],
        sd[f"{p}.bn.running_var"],
        sd[f"{p}.bn.weight"],
        sd[f"{p}.bn.bias"],
        training=False,
        eps=1e-3,
    )
    return F.relu(x)


def t_avg3(x, fid):
    return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=not fid)


def torch_inception_pool3(sd_np, x_np, variant):
    fid = variant == "fid"
    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in sd_np.items()}
    x = torch.from_numpy(x_np).permute(0, 3, 1, 2)

    def block_a(p, x):
        b1 = t_bc(sd, f"{p}.branch1x1", x)
        b5 = t_bc(sd, f"{p}.branch5x5_2", t_bc(sd, f"{p}.branch5x5_1", x), padding=2)
        bd = t_bc(sd, f"{p}.branch3x3dbl_1", x)
        bd = t_bc(sd, f"{p}.branch3x3dbl_2", bd, padding=1)
        bd = t_bc(sd, f"{p}.branch3x3dbl_3", bd, padding=1)
        bp = t_bc(sd, f"{p}.branch_pool", t_avg3(x, fid))
        return torch.cat([b1, b5, bd, bp], 1)

    def block_b(p, x):
        b3 = t_bc(sd, f"{p}.branch3x3", x, stride=2)
        bd = t_bc(sd, f"{p}.branch3x3dbl_1", x)
        bd = t_bc(sd, f"{p}.branch3x3dbl_2", bd, padding=1)
        bd = t_bc(sd, f"{p}.branch3x3dbl_3", bd, stride=2)
        return torch.cat([b3, bd, F.max_pool2d(x, 3, 2)], 1)

    def block_c(p, x):
        b1 = t_bc(sd, f"{p}.branch1x1", x)
        b7 = t_bc(sd, f"{p}.branch7x7_1", x)
        b7 = t_bc(sd, f"{p}.branch7x7_2", b7, padding=(0, 3))
        b7 = t_bc(sd, f"{p}.branch7x7_3", b7, padding=(3, 0))
        bd = t_bc(sd, f"{p}.branch7x7dbl_1", x)
        bd = t_bc(sd, f"{p}.branch7x7dbl_2", bd, padding=(3, 0))
        bd = t_bc(sd, f"{p}.branch7x7dbl_3", bd, padding=(0, 3))
        bd = t_bc(sd, f"{p}.branch7x7dbl_4", bd, padding=(3, 0))
        bd = t_bc(sd, f"{p}.branch7x7dbl_5", bd, padding=(0, 3))
        bp = t_bc(sd, f"{p}.branch_pool", t_avg3(x, fid))
        return torch.cat([b1, b7, bd, bp], 1)

    def block_d(p, x):
        b3 = t_bc(sd, f"{p}.branch3x3_2", t_bc(sd, f"{p}.branch3x3_1", x), stride=2)
        b7 = t_bc(sd, f"{p}.branch7x7x3_1", x)
        b7 = t_bc(sd, f"{p}.branch7x7x3_2", b7, padding=(0, 3))
        b7 = t_bc(sd, f"{p}.branch7x7x3_3", b7, padding=(3, 0))
        b7 = t_bc(sd, f"{p}.branch7x7x3_4", b7, stride=2)
        return torch.cat([b3, b7, F.max_pool2d(x, 3, 2)], 1)

    def block_e(p, x, pool):
        b1 = t_bc(sd, f"{p}.branch1x1", x)
        b3 = t_bc(sd, f"{p}.branch3x3_1", x)
        b3 = torch.cat(
            [
                t_bc(sd, f"{p}.branch3x3_2a", b3, padding=(0, 1)),
                t_bc(sd, f"{p}.branch3x3_2b", b3, padding=(1, 0)),
            ],
            1,
        )
        bd = t_bc(sd, f"{p}.branch3x3dbl_1", x)
        bd = t_bc(sd, f"{p}.branch3x3dbl_2", bd, padding=1)
        bd = torch.cat(
            [
                t_bc(sd, f"{p}.branch3x3dbl_3a", bd, padding=(0, 1)),
                t_bc(sd, f"{p}.branch3x3dbl_3b", bd, padding=(1, 0)),
            ],
            1,
        )
        if pool == "max":
            pooled = F.max_pool2d(x, 3, stride=1, padding=1)
        else:
            pooled = F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=pool == "avg")
        bp = t_bc(sd, f"{p}.branch_pool", pooled)
        return torch.cat([b1, b3, bd, bp], 1)

    x = t_bc(sd, "Conv2d_1a_3x3", x, stride=2)
    x = t_bc(sd, "Conv2d_2a_3x3", x)
    x = t_bc(sd, "Conv2d_2b_3x3", x, padding=1)
    x = F.max_pool2d(x, 3, 2)
    x = t_bc(sd, "Conv2d_3b_1x1", x)
    x = t_bc(sd, "Conv2d_4a_3x3", x)
    x = F.max_pool2d(x, 3, 2)
    for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        x = block_a(name, x)
    x = block_b("Mixed_6a", x)
    for name in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        x = block_c(name, x)
    x = block_d("Mixed_7a", x)
    x = block_e("Mixed_7b", x, pool="avg_nopad" if fid else "avg")
    x = block_e("Mixed_7c", x, pool="max" if fid else "avg")
    return x.mean(dim=(2, 3)).numpy()


@pytest.mark.parametrize("variant", ["fid", "torchvision"])
def test_inception_pool3_matches_torch(variant):
    sd = synth_inception_state_dict()
    rng = np.random.default_rng(5)
    # 128x128 input: the conv arithmetic is resolution-agnostic and this keeps
    # the single-core CPU test fast; preprocessing/resize is tested separately
    x = rng.uniform(-1, 1, (2, 128, 128, 3)).astype(np.float32)

    with torch.no_grad():
        theirs = torch_inception_pool3(sd, x, variant)

    params = jax.tree_util.tree_map(jnp.asarray, convert_inception(sd))
    ours = np.asarray(inception_pool3(params, jnp.asarray(x), variant))
    assert ours.shape == (2, 2048)
    assert np.abs(theirs).max() > 1e-2  # non-vacuous
    np.testing.assert_allclose(ours, theirs, rtol=5e-3, atol=5e-3)


def test_fid_variant_differs_from_torchvision():
    """The Mixed_7c max-pool / count_include_pad quirks must actually change
    the features (they define the canonical FID numbers)."""
    sd = synth_inception_state_dict()
    params = jax.tree_util.tree_map(jnp.asarray, convert_inception(sd))
    x = jnp.asarray(
        np.random.default_rng(6).uniform(-1, 1, (1, 96, 96, 3)).astype(np.float32)
    )
    a = np.asarray(inception_pool3(params, x, "fid"))
    b = np.asarray(inception_pool3(params, x, "torchvision"))
    assert np.abs(a - b).max() > 1e-4


def test_classic_fid_end_to_end():
    """fid_from_features over Inception features: ~0 for identical sets,
    clearly positive for disjoint ones; uint8 and any-resolution input OK."""
    from paella_tpu.eval import fid_from_features
    from paella_tpu.eval.metrics import features_over_batches

    sd = synth_inception_state_dict()
    extract = inception_features(convert_inception(sd))

    rng = np.random.default_rng(7)
    real = rng.uniform(0, 1, (8, 64, 64, 3)).astype(np.float32)
    fake = np.clip(real + rng.normal(0, 0.3, real.shape), 0, 1).astype(np.float32)

    f_real = features_over_batches(extract, [real[:4], real[4:]])
    f_real_u8 = features_over_batches(
        extract, [(real[:4] * 255).astype(np.uint8), (real[4:] * 255).astype(np.uint8)]
    )
    f_fake = features_over_batches(extract, [fake])

    assert f_real.shape == (8, 2048)
    np.testing.assert_allclose(f_real_u8, f_real, rtol=2e-2, atol=2e-2)
    assert fid_from_features(f_real, f_real) < 1e-6
    assert fid_from_features(f_real, f_fake) > 1e-3


def test_preprocess():
    x = (np.ones((1, 64, 64, 3)) * 0.5).astype(np.float32)
    out = np.asarray(inception_preprocess(jnp.asarray(x)))
    assert out.shape == (1, 299, 299, 3)
    np.testing.assert_allclose(out, 0.0, atol=1e-5)
    u8 = np.asarray(inception_preprocess(jnp.asarray((x * 255).astype(np.uint8))))
    np.testing.assert_allclose(u8, 0.0, atol=2e-2)
