"""Conditioning encoder tests: numerics parity of our native T5/CLIP towers against
HF torch models instantiated locally from configs (no downloads), plus the byte
tokenizer."""
import jax
import pytest
import jax.numpy as jnp
import numpy as np
import torch

from paella_tpu.cond import (
    CLIPTextConfig,
    CLIPTextEncoder,
    CLIPVisionConfig,
    CLIPVisionEncoder,
    T5Config,
    T5Encoder,
    byt5_batch_encode,
    byt5_decode,
    byt5_encode,
    convert_hf_clip_text,
    convert_t5_encoder,
)
from paella_tpu.cond.clip import convert_hf_clip_vision


def to_np(sd):
    return {k: v.detach().numpy() for k, v in sd.items()}


def test_byt5_tokenizer_matches_hf_semantics():
    """ByT5 ids are utf-8 bytes + 3, EOS=1 appended (HF ByT5Tokenizer semantics)."""
    ids = byt5_encode("hi")
    assert ids == [ord("h") + 3, ord("i") + 3, 1]
    batch, mask = byt5_batch_encode(["a", "abc"])
    assert batch.shape == (2, 4)
    assert batch[0].tolist() == [ord("a") + 3, 1, 0, 0]
    assert mask[0].tolist() == [True, True, False, False]
    assert byt5_decode(byt5_encode("hello world")) == "hello world"


def test_byt5_truncation():
    ids = byt5_encode("x" * 100, max_length=10)
    assert len(ids) == 10 and ids[-1] == 1


@pytest.mark.slow
def test_t5_encoder_matches_hf():
    from transformers import T5Config as HFT5Config, T5EncoderModel

    cfg = T5Config.tiny()
    hf_cfg = HFT5Config(
        vocab_size=cfg.vocab_size,
        d_model=cfg.d_model,
        d_kv=cfg.d_kv,
        num_heads=cfg.num_heads,
        d_ff=cfg.d_ff,
        num_layers=cfg.num_layers,
        feed_forward_proj="gated-gelu",
        relative_attention_num_buckets=cfg.relative_attention_num_buckets,
        relative_attention_max_distance=cfg.relative_attention_max_distance,
        dropout_rate=0.0,
        is_encoder_decoder=False,
        use_cache=False,
    )
    torch.manual_seed(0)
    hf = T5EncoderModel(hf_cfg).eval()

    ids = np.array([[5, 8, 13, 1, 0, 0], [7, 7, 7, 7, 7, 1]], np.int64)
    mask = np.array([[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1]], np.int64)
    with torch.no_grad():
        theirs = hf(
            input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
        ).last_hidden_state.numpy()

    params = convert_t5_encoder(to_np(hf.state_dict()), cfg)
    ours = np.asarray(
        T5Encoder(cfg).apply(
            {"params": jax.tree_util.tree_map(jnp.asarray, params)},
            jnp.asarray(ids.astype(np.int32)),
            jnp.asarray(mask.astype(bool)),
        )
    )
    # HF zeroes pad positions via the extended mask; ours computes them but they
    # are masked from every real token's attention — compare real positions only
    np.testing.assert_allclose(
        ours[mask.astype(bool)], theirs[mask.astype(bool)], rtol=2e-3, atol=2e-3
    )


@pytest.mark.slow
def test_clip_text_matches_hf():
    from transformers import CLIPTextConfig as HFCfg, CLIPTextModelWithProjection

    cfg = CLIPTextConfig.tiny()
    hf_cfg = HFCfg(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.width,
        num_attention_heads=cfg.heads,
        num_hidden_layers=cfg.layers,
        intermediate_size=cfg.width * 4,
        max_position_embeddings=cfg.context_length,
        projection_dim=cfg.embed_dim,
        hidden_act="gelu",
        eos_token_id=cfg.vocab_size - 1,
        bos_token_id=0,
        attention_dropout=0.0,
    )
    torch.manual_seed(1)
    hf = CLIPTextModelWithProjection(hf_cfg).eval()

    # sequences end with the EOS (= max id, so argmax pooling agrees with HF's
    # eos-position pooling)
    ids = np.array(
        [[0, 5, 9, cfg.vocab_size - 1, 2, 2], [0, 11, 12, 13, 14, cfg.vocab_size - 1]], np.int64
    )
    with torch.no_grad():
        theirs = hf(input_ids=torch.from_numpy(ids)).text_embeds.numpy()

    params = convert_hf_clip_text(to_np(hf.state_dict()), cfg)
    ours = np.asarray(
        CLIPTextEncoder(cfg).apply(
            {"params": jax.tree_util.tree_map(jnp.asarray, params)},
            jnp.asarray(ids.astype(np.int32)),
        )
    )
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-3)


def test_clip_vision_matches_hf():
    from transformers import CLIPVisionConfig as HFCfg, CLIPVisionModelWithProjection

    cfg = CLIPVisionConfig.tiny()
    hf_cfg = HFCfg(
        image_size=cfg.image_size,
        patch_size=cfg.patch_size,
        hidden_size=cfg.width,
        num_attention_heads=cfg.heads,
        num_hidden_layers=cfg.layers,
        intermediate_size=cfg.width * 4,
        projection_dim=cfg.embed_dim,
        hidden_act="gelu",
        attention_dropout=0.0,
    )
    torch.manual_seed(2)
    hf = CLIPVisionModelWithProjection(hf_cfg).eval()

    img = np.random.default_rng(0).standard_normal(
        (2, cfg.image_size, cfg.image_size, 3), dtype=np.float32
    )
    with torch.no_grad():
        theirs = hf(
            pixel_values=torch.from_numpy(img.transpose(0, 3, 1, 2))
        ).image_embeds.numpy()

    params = convert_hf_clip_vision(to_np(hf.state_dict()), cfg)
    ours = np.asarray(
        CLIPVisionEncoder(cfg).apply(
            {"params": jax.tree_util.tree_map(jnp.asarray, params)}, jnp.asarray(img)
        )
    )
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-3)


def test_byt5_tokenizer_matches_hf_exactly():
    """Byte tokenizer must agree with HF's ByT5Tokenizer (constructible offline)."""
    from transformers import ByT5Tokenizer

    tok = ByT5Tokenizer()
    prompts = ["hi", "héllo wörld", "", "a" * 50]
    theirs = tok(prompts, padding="longest")
    ours_ids, ours_mask = byt5_batch_encode(prompts, max_length=None)
    assert ours_ids.tolist() == theirs["input_ids"]
    assert ours_mask.astype(int).tolist() == theirs["attention_mask"]

    # truncation semantics
    theirs_t = tok(["x" * 100], max_length=10, truncation=True)["input_ids"][0]
    ours_t = byt5_encode("x" * 100, max_length=10)
    assert ours_t == theirs_t
