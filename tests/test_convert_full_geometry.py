"""Checkpoint-day rehearsal at FULL encoder geometry (round-3 VERDICT item 3).

The runbook (docs/checkpoint_day.md) feeds the real released weights through
`convert_t5_encoder` (HF-layout ByT5-XL, reference: src_distributed/utils.py:70-72)
and `convert_open_clip_text/vision` (open_clip ViT-H-14, utils.py:73-75). The
tiny-geometry parity tests (tests/test_cond.py) pin the math; these pin the
CONVERTERS at the exact geometries checkpoint day will feed them — value-level
against torch references instantiated locally at full size (no downloads).

Both tests are @slow (~1.9B / ~1.0B params on one CPU core); run them with the
full suite or `pytest -m slow tests/test_convert_full_geometry.py`.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from paella_tpu.cond import (
    CLIPTextConfig,
    CLIPTextEncoder,
    CLIPVisionConfig,
    CLIPVisionEncoder,
    T5Config,
    T5Encoder,
    convert_t5_encoder,
)
from paella_tpu.cond.clip import convert_open_clip_text, convert_open_clip_vision


def to_np(sd):
    return {k: v.detach().numpy() for k, v in sd.items()}


@pytest.mark.slow
def test_convert_byt5_xl_geometry():
    """convert_t5_encoder at the TRUE byt5-xl geometry (d_model 2560, 36
    layers, d_ff 6720): value-level parity of the converted native encoder
    against the HF torch model on real token ids."""
    from transformers import T5Config as HFT5Config, T5EncoderModel

    cfg = dataclasses.replace(T5Config.byt5_xl(), dtype="float32")
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

    from paella_tpu.cond.tokenizers import byt5_batch_encode

    ids_np, mask_np = byt5_batch_encode(["a corgi wearing a top hat"])
    ids = ids_np.astype(np.int64)
    mask = mask_np.astype(np.int64)
    with torch.no_grad():
        theirs = hf(
            input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
        ).last_hidden_state.numpy()

    sd = to_np(hf.state_dict())
    del hf
    params = convert_t5_encoder(sd, cfg)
    del sd

    ours = np.asarray(
        T5Encoder(cfg).apply(
            {"params": jax.tree_util.tree_map(jnp.asarray, params)},
            jnp.asarray(ids.astype(np.int32)),
            jnp.asarray(mask.astype(bool)),
        ),
        np.float32,
    )
    m = mask.astype(bool)
    np.testing.assert_allclose(ours[m], theirs[m], rtol=2e-3, atol=2e-3)


def _hf_clip_text_to_open_clip(sd, layers):
    """Re-express an HF CLIP text tower state dict in the open_clip checkpoint
    layout (the layout the released Paella CLIP uses). Pure re-packing — the
    converter under test then has to undo it correctly."""
    out = {
        "token_embedding.weight": sd["text_model.embeddings.token_embedding.weight"],
        "positional_embedding": sd["text_model.embeddings.position_embedding.weight"],
        "text_projection": np.ascontiguousarray(sd["text_projection.weight"].T),
        "ln_final.weight": sd["text_model.final_layer_norm.weight"],
        "ln_final.bias": sd["text_model.final_layer_norm.bias"],
    }
    for i in range(layers):
        h = f"text_model.encoder.layers.{i}"
        p = f"transformer.resblocks.{i}"
        out[f"{p}.attn.in_proj_weight"] = np.concatenate(
            [sd[f"{h}.self_attn.{x}_proj.weight"] for x in "qkv"], axis=0
        )
        out[f"{p}.attn.in_proj_bias"] = np.concatenate(
            [sd[f"{h}.self_attn.{x}_proj.bias"] for x in "qkv"], axis=0
        )
        out[f"{p}.attn.out_proj.weight"] = sd[f"{h}.self_attn.out_proj.weight"]
        out[f"{p}.attn.out_proj.bias"] = sd[f"{h}.self_attn.out_proj.bias"]
        out[f"{p}.ln_1.weight"] = sd[f"{h}.layer_norm1.weight"]
        out[f"{p}.ln_1.bias"] = sd[f"{h}.layer_norm1.bias"]
        out[f"{p}.ln_2.weight"] = sd[f"{h}.layer_norm2.weight"]
        out[f"{p}.ln_2.bias"] = sd[f"{h}.layer_norm2.bias"]
        out[f"{p}.mlp.c_fc.weight"] = sd[f"{h}.mlp.fc1.weight"]
        out[f"{p}.mlp.c_fc.bias"] = sd[f"{h}.mlp.fc1.bias"]
        out[f"{p}.mlp.c_proj.weight"] = sd[f"{h}.mlp.fc2.weight"]
        out[f"{p}.mlp.c_proj.bias"] = sd[f"{h}.mlp.fc2.bias"]
    return out


def _hf_clip_vision_to_open_clip(sd, layers):
    out = {
        "visual.conv1.weight": sd["vision_model.embeddings.patch_embedding.weight"],
        "visual.class_embedding": sd["vision_model.embeddings.class_embedding"],
        "visual.positional_embedding": sd[
            "vision_model.embeddings.position_embedding.weight"
        ],
        "visual.proj": np.ascontiguousarray(sd["visual_projection.weight"].T),
        "visual.ln_pre.weight": sd["vision_model.pre_layrnorm.weight"],
        "visual.ln_pre.bias": sd["vision_model.pre_layrnorm.bias"],
        "visual.ln_post.weight": sd["vision_model.post_layernorm.weight"],
        "visual.ln_post.bias": sd["vision_model.post_layernorm.bias"],
    }
    for i in range(layers):
        h = f"vision_model.encoder.layers.{i}"
        p = f"visual.transformer.resblocks.{i}"
        out[f"{p}.attn.in_proj_weight"] = np.concatenate(
            [sd[f"{h}.self_attn.{x}_proj.weight"] for x in "qkv"], axis=0
        )
        out[f"{p}.attn.in_proj_bias"] = np.concatenate(
            [sd[f"{h}.self_attn.{x}_proj.bias"] for x in "qkv"], axis=0
        )
        out[f"{p}.attn.out_proj.weight"] = sd[f"{h}.self_attn.out_proj.weight"]
        out[f"{p}.attn.out_proj.bias"] = sd[f"{h}.self_attn.out_proj.bias"]
        out[f"{p}.ln_1.weight"] = sd[f"{h}.layer_norm1.weight"]
        out[f"{p}.ln_1.bias"] = sd[f"{h}.layer_norm1.bias"]
        out[f"{p}.ln_2.weight"] = sd[f"{h}.layer_norm2.weight"]
        out[f"{p}.ln_2.bias"] = sd[f"{h}.layer_norm2.bias"]
        out[f"{p}.mlp.c_fc.weight"] = sd[f"{h}.mlp.fc1.weight"]
        out[f"{p}.mlp.c_fc.bias"] = sd[f"{h}.mlp.fc1.bias"]
        out[f"{p}.mlp.c_proj.weight"] = sd[f"{h}.mlp.fc2.weight"]
        out[f"{p}.mlp.c_proj.bias"] = sd[f"{h}.mlp.fc2.bias"]
    return out


@pytest.mark.slow
def test_convert_open_clip_vit_h_text_geometry():
    """convert_open_clip_text at the TRUE ViT-H-14 text geometry (width 1024,
    24 layers, heads 16, embed 1024): an HF torch tower at full size is
    re-packed into the open_clip checkpoint layout, run through the converter
    under test, and the native encoder must reproduce the torch forward."""
    from transformers import CLIPTextConfig as HFCfg, CLIPTextModelWithProjection

    cfg = dataclasses.replace(CLIPTextConfig.vit_h_14(), dtype="float32")
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

    # EOS = max id so HF's eos pooling and open_clip's argmax pooling agree
    rng = np.random.default_rng(0)
    ids = np.zeros((2, 12), np.int64)
    ids[:, 1:-1] = rng.integers(1, cfg.vocab_size - 1, (2, 10))
    ids[:, -1] = cfg.vocab_size - 1
    with torch.no_grad():
        theirs = hf(input_ids=torch.from_numpy(ids)).text_embeds.numpy()

    oc_sd = _hf_clip_text_to_open_clip(to_np(hf.state_dict()), cfg.layers)
    del hf
    params = convert_open_clip_text(oc_sd, cfg)
    del oc_sd
    ours = np.asarray(
        CLIPTextEncoder(cfg).apply(
            {"params": jax.tree_util.tree_map(jnp.asarray, params)},
            jnp.asarray(ids.astype(np.int32)),
        ),
        np.float32,
    )
    np.testing.assert_allclose(ours, theirs, rtol=3e-3, atol=3e-3)


@pytest.mark.slow
def test_convert_open_clip_vit_h_vision_geometry():
    """convert_open_clip_vision at the TRUE ViT-H-14 visual geometry (width
    1280, 32 layers, patch 14, image 224): same rehearsal as the text tower."""
    from transformers import CLIPVisionConfig as HFCfg, CLIPVisionModelWithProjection

    cfg = dataclasses.replace(CLIPVisionConfig.vit_h_14(), dtype="float32")
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

    img = np.random.default_rng(1).standard_normal(
        (1, cfg.image_size, cfg.image_size, 3), dtype=np.float32
    )
    with torch.no_grad():
        theirs = hf(
            pixel_values=torch.from_numpy(img.transpose(0, 3, 1, 2))
        ).image_embeds.numpy()

    oc_sd = _hf_clip_vision_to_open_clip(to_np(hf.state_dict()), cfg.layers)
    del hf
    params = convert_open_clip_vision(oc_sd, cfg)
    del oc_sd
    ours = np.asarray(
        CLIPVisionEncoder(cfg).apply(
            {"params": jax.tree_util.tree_map(jnp.asarray, params)}, jnp.asarray(img)
        ),
        np.float32,
    )
    np.testing.assert_allclose(ours, theirs, rtol=3e-3, atol=3e-3)
