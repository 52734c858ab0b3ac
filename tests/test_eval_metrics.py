"""eval/metrics.py: FID math against closed forms; CLIP score end-to-end on
tiny towers (the reference ships no eval code — BASELINE.md sets the bar)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paella_tpu.eval import (
    clip_score,
    clip_score_images,
    feature_stats,
    features_over_batches,
    fid_from_features,
    frechet_distance,
)


def test_fid_identical_is_zero():
    rng = np.random.default_rng(0)
    f = rng.normal(size=(500, 16))
    assert fid_from_features(f, f) == pytest.approx(0.0, abs=1e-8)


def test_frechet_distance_diagonal_closed_form():
    # for diagonal covariances: |mu1-mu2|^2 + sum((sqrt(s1)-sqrt(s2))^2)
    rng = np.random.default_rng(1)
    d = 8
    mu1, mu2 = rng.normal(size=d), rng.normal(size=d)
    s1, s2 = rng.uniform(0.5, 2.0, d), rng.uniform(0.5, 2.0, d)
    want = ((mu1 - mu2) ** 2).sum() + ((np.sqrt(s1) - np.sqrt(s2)) ** 2).sum()
    got = frechet_distance(mu1, np.diag(s1), mu2, np.diag(s2))
    assert got == pytest.approx(want, rel=1e-10)


def test_frechet_distance_mean_shift_only():
    sigma = np.eye(4)
    mu = np.zeros(4)
    shift = np.array([3.0, 0.0, 0.0, 0.0])
    assert frechet_distance(mu, sigma, mu + shift, sigma) == pytest.approx(9.0)


def test_fid_separates_distributions():
    rng = np.random.default_rng(2)
    real = rng.normal(size=(400, 8))
    close = rng.normal(size=(400, 8))
    far = rng.normal(loc=2.0, scale=1.7, size=(400, 8))
    assert fid_from_features(real, close) < fid_from_features(real, far)


def test_feature_stats_shapes_and_errors():
    mu, sigma = feature_stats(np.ones((3, 5)) + np.eye(3, 5))
    assert mu.shape == (5,) and sigma.shape == (5, 5)
    with pytest.raises(ValueError):
        feature_stats(np.ones((1, 5)))
    with pytest.raises(ValueError):
        feature_stats(np.ones((5,)))


def test_features_over_batches_stacks():
    ex = jax.jit(lambda x: x.reshape(x.shape[0], -1).astype(jnp.float32) * 2)
    batches = [np.ones((2, 3, 3, 1), np.float32), np.zeros((3, 3, 3, 1), np.float32)]
    out = features_over_batches(ex, batches)
    assert out.shape == (5, 9)
    np.testing.assert_allclose(out[:2], 2.0)
    np.testing.assert_allclose(out[2:], 0.0)


def test_clip_score_cosine_convention():
    t = jnp.array([[1.0, 0.0], [1.0, 0.0], [2.0, 0.0]])
    v = jnp.array([[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0]])
    got = np.asarray(clip_score(t, v))
    # aligned -> 100, orthogonal -> 0, opposed -> clamped to 0
    np.testing.assert_allclose(got, [100.0, 0.0, 0.0], atol=1e-5)


def test_clip_score_images_end_to_end():
    """Tiny CLIP towers: the jit'd prompt+image scorer returns finite (B,)
    scores in [0, 100] and is deterministic."""
    from paella_tpu.cond.clip import (
        CLIPTextConfig,
        CLIPTextEncoder,
        CLIPVisionConfig,
        CLIPVisionEncoder,
    )

    tcfg = CLIPTextConfig(
        vocab_size=64, context_length=8, width=16, heads=2, layers=1, embed_dim=8
    )
    vcfg = CLIPVisionConfig(
        image_size=16, patch_size=8, width=16, heads=2, layers=1, embed_dim=8
    )
    tm, vm = CLIPTextEncoder(tcfg), CLIPVisionEncoder(vcfg)
    ids = jnp.array([[1, 5, 63, 0, 0, 0, 0, 0], [1, 9, 63, 0, 0, 0, 0, 0]])
    imgs = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3))
    tp = jax.jit(tm.init)(jax.random.PRNGKey(1), ids)["params"]
    vp = jax.jit(vm.init)(jax.random.PRNGKey(2), imgs)["params"]
    s = np.asarray(clip_score_images(tm, tp, vm, vp, ids, imgs))
    s2 = np.asarray(clip_score_images(tm, tp, vm, vp, ids, imgs))
    assert s.shape == (2,) and np.isfinite(s).all()
    assert (s >= 0).all() and (s <= 100).all()
    np.testing.assert_allclose(s, s2)
