"""Data pipeline tests: tar shard reading, filtering semantics, transforms,
synthetic dataset."""
import io
import json

import numpy as np
import pytest

from paella_tpu.data import (
    SampleFilter,
    SyntheticDataset,
    WebDatasetLoader,
    iter_tar_samples,
    resize_shorter_side,
    write_tar_shard,
)


def png_bytes(h, w, seed=0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    img = Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


GOOD_META = json.dumps(
    {"original_width": 512, "original_height": 512, "pwatermark": 0.1, "aesthetic": 6.0, "punsafe": 0.0}
).encode()


def test_sample_filter_semantics():
    """reference: src_distributed/utils.py:28-52"""
    f = SampleFilter(min_size=256)
    assert f({"json": GOOD_META, "txt": b"hi"})
    assert not f({"txt": b"no json"})
    small = json.dumps({"original_width": 100, "original_height": 512, "aesthetic": 6.0, "pwatermark": 0.1, "punsafe": 0.0}).encode()
    assert not f({"json": small})
    # AESTHETIC_SCORE is an accepted alias
    alias = json.dumps({"original_width": 512, "original_height": 512, "pwatermark": 0.1, "AESTHETIC_SCORE": 6.0, "punsafe": 0.0}).encode()
    assert f({"json": alias})
    # malformed json -> rejected, not raised
    assert not f({"json": b"{bad"})
    # text conditions
    ft = SampleFilter(text_conditions={"min_words": 2, "forbidden_words": ["bad"]})
    assert ft({"json": GOOD_META, "txt": b"two words"})
    assert not ft({"json": GOOD_META, "txt": b"one"})
    assert not ft({"json": GOOD_META, "txt": b"really bad words"})


def test_tar_roundtrip_and_loader(tmp_path):
    pytest.importorskip("PIL")
    shard = str(tmp_path / "shard-000.tar")
    samples = [
        (f"{i:05d}", {"png": png_bytes(300, 400, i), "txt": f"caption {i}".encode(), "json": GOOD_META})
        for i in range(6)
    ]
    write_tar_shard(shard, samples)

    keys = [s for s in iter_tar_samples(shard)]
    assert len(keys) == 6
    assert set(keys[0].keys()) == {"png", "txt", "json"}

    loader = WebDatasetLoader(
        [shard], batch_size=2, image_size=64, shuffle_buffer=4, resample=False
    )
    batches = list(loader)
    assert len(batches) >= 2
    images, captions = batches[0]
    assert images.shape == (2, 64, 64, 3)
    assert images.dtype == np.float32
    assert 0.0 <= images.min() and images.max() <= 1.0
    assert all(c.startswith("caption") for c in captions)


def test_resize_shorter_side():
    img = np.zeros((100, 200, 3), np.float32)
    out = resize_shorter_side(img, 64)
    assert out.shape == (64, 128, 3)
    out = resize_shorter_side(np.zeros((200, 100, 3), np.float32), 64)
    assert out.shape == (128, 64, 3)


def test_synthetic_dataset():
    it = iter(SyntheticDataset(batch_size=3, image_size=32))
    images, caps = next(it)
    assert images.shape == (3, 32, 32, 3)
    assert len(caps) == 3
