"""Generation-quality metrics: FID and CLIP score.

The reference repo reports FID/CLIP-score numbers in its paper but ships no
evaluation code at all (no metrics module anywhere under /root/reference);
BASELINE.md's parity bar is "FID/CLIP-score parity with the released
checkpoints", so the harness lives here.

Design:
- FID statistics (mean/covariance) and the Fréchet distance run HOST-SIDE in
  float64 numpy — the convention every published FID number uses; a 2048-dim
  eigendecomposition is microseconds on CPU and f32-on-TPU would change the
  third digit.
- Feature extraction is pluggable. The classic metric uses InceptionV3-pool3
  features — the network + torch-weights converter live in eval/inception.py
  (`load_inception(path)` gives the jit'd featurizer; the standard
  pt_inception-2015-12-05 weights must be user-supplied under this
  zero-egress environment, like every other pretrained checkpoint);
  `clip_image_features` wires the in-repo CLIP vision tower for the CLIP-FID
  variant (Kynkäänniemi et al. 2023's recommendation) with no external
  dependency.
- CLIP score is the jit'd on-device path: 100 * max(0, cosine(text, image)),
  the torchmetrics/openai convention.
"""
from __future__ import annotations

from typing import Callable, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


# ---------------------------------------------------------------------------
# FID (host-side, float64)
# ---------------------------------------------------------------------------


def feature_stats(features: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(N, D) features -> (mean (D,), covariance (D, D)) in float64."""
    f = np.asarray(features, np.float64)
    if f.ndim != 2:
        raise ValueError(f"features must be (N, D), got {f.shape}")
    if f.shape[0] < 2:
        raise ValueError("need at least 2 samples for a covariance")
    mu = f.mean(axis=0)
    sigma = np.cov(f, rowvar=False)
    return mu, np.atleast_2d(sigma)


def _trace_sqrtm_product(s1: np.ndarray, s2: np.ndarray) -> float:
    """tr((Σ1 Σ2)^1/2) via the symmetric form Σ1^1/2 Σ2 Σ1^1/2 (PSD, so an
    eigh of it is stable — no scipy.linalg.sqrtm needed)."""
    w1, v1 = np.linalg.eigh(s1)
    sq1 = (v1 * np.sqrt(np.clip(w1, 0.0, None))) @ v1.T
    m = sq1 @ s2 @ sq1
    w = np.linalg.eigvalsh((m + m.T) / 2.0)
    return float(np.sqrt(np.clip(w, 0.0, None)).sum())


def frechet_distance(
    mu1: np.ndarray, sigma1: np.ndarray, mu2: np.ndarray, sigma2: np.ndarray
) -> float:
    """Fréchet distance between two Gaussians:
    |μ1−μ2|² + tr(Σ1 + Σ2 − 2(Σ1Σ2)^1/2)."""
    mu1, mu2 = np.asarray(mu1, np.float64), np.asarray(mu2, np.float64)
    s1, s2 = np.asarray(sigma1, np.float64), np.asarray(sigma2, np.float64)
    diff = float(((mu1 - mu2) ** 2).sum())
    cov_term = float(np.trace(s1) + np.trace(s2)) - 2.0 * _trace_sqrtm_product(s1, s2)
    return max(diff + cov_term, 0.0)


def fid_from_features(real: np.ndarray, generated: np.ndarray) -> float:
    """FID between two (N, D) feature sets (extractor-agnostic)."""
    return frechet_distance(*feature_stats(real), *feature_stats(generated))


def features_over_batches(
    extract: Callable[[Array], Array], images: Iterable[np.ndarray]
) -> np.ndarray:
    """Run a (jit'd) feature extractor over an iterable of image batches and
    stack the results host-side; one device round-trip per batch."""
    out = [np.asarray(extract(jnp.asarray(batch))) for batch in images]
    if not out:
        raise ValueError("no image batches")
    return np.concatenate(out, axis=0)


# ---------------------------------------------------------------------------
# CLIP-based extractors / CLIP score (on-device)
# ---------------------------------------------------------------------------


def clip_image_features(vision_model, vision_params) -> Callable[[Array], Array]:
    """Jit'd CLIP-FID / CLIP-score image featurizer: NHWC [0,1] uint8-or-float
    images -> (B, embed_dim). Uses the in-repo tower (cond/clip.py)."""
    from ..cond.clip import clip_preprocess

    @jax.jit
    def extract(images: Array) -> Array:
        if images.dtype == jnp.uint8:
            images = images.astype(jnp.float32) / 255.0
        x = clip_preprocess(images, vision_model.cfg.image_size)
        return vision_model.apply({"params": vision_params}, x)

    return extract


def clip_score(text_features: Array, image_features: Array) -> Array:
    """Per-pair CLIP score: 100 * max(0, cosine(text_i, image_i)). (B,)."""
    t = text_features.astype(jnp.float32)
    v = image_features.astype(jnp.float32)
    t = t / jnp.linalg.norm(t, axis=-1, keepdims=True)
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    return 100.0 * jnp.maximum((t * v).sum(axis=-1), 0.0)


def clip_score_images(
    text_model,
    text_params,
    vision_model,
    vision_params,
    token_ids: Array,
    images: Array,
) -> Array:
    """End-to-end CLIP score for (tokenized prompts, generated images); one jit.

    token_ids: (B, 77) from cond/tokenizers.py::CLIPTokenizer.__call__.
    images: (B, H, W, 3) NHWC in [0,1] (or uint8).
    """
    extract = clip_image_features(vision_model, vision_params)

    @jax.jit
    def score(token_ids, images):
        tf = text_model.apply({"params": text_params}, token_ids)
        return clip_score(tf, extract(images))

    return score(token_ids, images)
