"""One-call conditioning loader (cond/loader.py::load_conditional_models) —
the reference-parity entry point (reference: src_distributed/utils.py:65-82).

Builds synthetic torch checkpoints ON DISK for all three frozen models (VQGAN,
ByT5, open_clip) plus a real BPE merge table, loads them through the ONE call,
and exercises every returned encoder. Round-2 VERDICT found the CLIP branch
could never succeed (no bpe_path plumbing); this pins the whole path.
"""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from paella_tpu.cond.clip import CLIPTextConfig, CLIPVisionConfig
from paella_tpu.cond.loader import load_conditional_models
from paella_tpu.cond.t5 import T5Config
from paella_tpu.cond.tokenizers import CLIPTokenizer, write_merges_file
from paella_tpu.codec import VQModel
from paella_tpu.config import VQConfig

from tests.test_convert import synth_vqgan_state_dict
from tests.test_tokenizers import MERGES

V_CFG = VQConfig.tiny()


def synth_open_clip_state_dict(tcfg: CLIPTextConfig, vcfg: CLIPVisionConfig, seed=3):
    """Random tensors with the exact shapes/keys open_clip's ViT checkpoint
    uses (what convert_open_clip_text/vision consume)."""
    rng = np.random.default_rng(seed)
    f = lambda *shape: rng.standard_normal(shape, dtype=np.float32) * 0.02
    sd = {
        "token_embedding.weight": f(tcfg.vocab_size, tcfg.width),
        "positional_embedding": f(tcfg.context_length, tcfg.width),
        "text_projection": f(tcfg.width, tcfg.embed_dim),
        "ln_final.weight": np.ones(tcfg.width, np.float32),
        "ln_final.bias": np.zeros(tcfg.width, np.float32),
        "visual.conv1.weight": f(vcfg.width, 3, vcfg.patch_size, vcfg.patch_size),
        "visual.class_embedding": f(vcfg.width),
        "visual.positional_embedding": f(
            (vcfg.image_size // vcfg.patch_size) ** 2 + 1, vcfg.width
        ),
        "visual.proj": f(vcfg.width, vcfg.embed_dim),
        "visual.ln_pre.weight": np.ones(vcfg.width, np.float32),
        "visual.ln_pre.bias": np.zeros(vcfg.width, np.float32),
        "visual.ln_post.weight": np.ones(vcfg.width, np.float32),
        "visual.ln_post.bias": np.zeros(vcfg.width, np.float32),
    }

    def tower(prefix, cfg):
        for i in range(cfg.layers):
            p = f"{prefix}transformer.resblocks.{i}"
            sd[f"{p}.ln_1.weight"] = np.ones(cfg.width, np.float32)
            sd[f"{p}.ln_1.bias"] = np.zeros(cfg.width, np.float32)
            sd[f"{p}.ln_2.weight"] = np.ones(cfg.width, np.float32)
            sd[f"{p}.ln_2.bias"] = np.zeros(cfg.width, np.float32)
            sd[f"{p}.attn.in_proj_weight"] = f(3 * cfg.width, cfg.width)
            sd[f"{p}.attn.in_proj_bias"] = np.zeros(3 * cfg.width, np.float32)
            sd[f"{p}.attn.out_proj.weight"] = f(cfg.width, cfg.width)
            sd[f"{p}.attn.out_proj.bias"] = np.zeros(cfg.width, np.float32)
            sd[f"{p}.mlp.c_fc.weight"] = f(4 * cfg.width, cfg.width)
            sd[f"{p}.mlp.c_fc.bias"] = np.zeros(4 * cfg.width, np.float32)
            sd[f"{p}.mlp.c_proj.weight"] = f(cfg.width, 4 * cfg.width)
            sd[f"{p}.mlp.c_proj.bias"] = np.zeros(cfg.width, np.float32)

    tower("", tcfg)
    tower("visual.", vcfg)
    return sd


def _save(sd, path):
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, str(path))


@pytest.fixture(scope="module")
def checkpoints(tmp_path_factory):
    d = tmp_path_factory.mktemp("ckpts")

    _save(synth_vqgan_state_dict(V_CFG), d / "vqgan.pt")

    # tiny HF ByT5 (same recipe as test_cond.py::test_t5_encoder_matches_hf)
    from transformers import T5Config as HFT5Config, T5EncoderModel

    t5_cfg = T5Config.tiny()
    hf_cfg = HFT5Config(
        vocab_size=t5_cfg.vocab_size,
        d_model=t5_cfg.d_model,
        d_kv=t5_cfg.d_kv,
        num_heads=t5_cfg.num_heads,
        d_ff=t5_cfg.d_ff,
        num_layers=t5_cfg.num_layers,
        feed_forward_proj="gated-gelu",
        relative_attention_num_buckets=t5_cfg.relative_attention_num_buckets,
        relative_attention_max_distance=t5_cfg.relative_attention_max_distance,
        dropout_rate=0.0,
        is_encoder_decoder=False,
        use_cache=False,
    )
    torch.manual_seed(0)
    hf = T5EncoderModel(hf_cfg).eval()
    _save({k: v.detach().numpy() for k, v in hf.state_dict().items()}, d / "byt5.pt")

    # merge table + CLIP towers sized to the resulting vocab
    bpe = d / "merges.txt"
    write_merges_file(MERGES, str(bpe))
    vocab_size = CLIPTokenizer(str(bpe), num_merges=len(MERGES)).vocab_size
    tcfg = dataclasses.replace(
        CLIPTextConfig.tiny(), vocab_size=vocab_size, context_length=77
    )
    vcfg = CLIPVisionConfig.tiny()
    _save(synth_open_clip_state_dict(tcfg, vcfg), d / "clip.pt")

    return dict(
        vqgan=str(d / "vqgan.pt"),
        byt5=str(d / "byt5.pt"),
        byt5_cfg=t5_cfg,
        clip=str(d / "clip.pt"),
        bpe=str(bpe),
        tcfg=tcfg,
        vcfg=vcfg,
    )


def test_load_conditional_models_one_call(checkpoints):
    c = checkpoints
    models = load_conditional_models(
        c["vqgan"],
        byt5_path=c["byt5"],
        byt5_cfg=c["byt5_cfg"],
        clip_path=c["clip"],
        clip_bpe_path=c["bpe"],
        clip_text_cfg=c["tcfg"],
        clip_vision_cfg=c["vcfg"],
        vq_cfg=V_CFG,
    )

    # VQGAN: encode -> indices -> decode
    x = jnp.linspace(0, 1, 2 * 32 * 32 * 3).reshape(2, 32, 32, 3)
    _, _, idx, _ = models.vq.apply(models.vq_vars, x, method=VQModel.encode)
    img = models.vq.apply(models.vq_vars, idx, method=VQModel.decode_indices)
    assert img.shape == (2, 32, 32, 3)

    # ByT5
    from paella_tpu.cond import byt5_batch_encode

    ids, mask = byt5_batch_encode(["a red cat", "blue"])
    states = models.byt5_encode(jnp.asarray(ids), jnp.asarray(mask))
    assert states.shape == (2, ids.shape[1], c["byt5_cfg"].d_model)
    assert np.isfinite(np.asarray(states)).all()

    # CLIP text: prompts -> (B, embed_dim), straight through the native BPE
    tf = models.clip_text_encode(["a cat sat", "the catcat"])
    assert tf.shape == (2, c["tcfg"].embed_dim)
    assert np.isfinite(np.asarray(tf, np.float32)).all()

    # CLIP image: any-resolution [0,1] images resize to the tower's input size
    imf = models.clip_image_encode(jnp.ones((2, 48, 48, 3)) * 0.5)
    assert imf.shape == (2, c["vcfg"].embed_dim)
    assert np.isfinite(np.asarray(imf, np.float32)).all()


def test_load_conditional_models_clip_needs_tokenizer(checkpoints):
    """Without a merge table or tokenizer override the CLIP branch must fail
    loudly (not silently produce an unusable encoder)."""
    c = checkpoints
    with pytest.raises(ValueError, match="tokenizer"):
        load_conditional_models(
            c["vqgan"],
            clip_path=c["clip"],
            clip_text_cfg=c["tcfg"],
            clip_vision_cfg=c["vcfg"],
            vq_cfg=V_CFG,
        )


def test_load_conditional_models_custom_tokenizer(checkpoints):
    """`clip_tokenizer=` overrides the native BPE (the A/B hook)."""
    c = checkpoints

    def fake_tok(prompts):
        ids = np.zeros((len(prompts), 77), np.int64)
        ids[:, 0] = 1
        return ids

    models = load_conditional_models(
        c["vqgan"],
        clip_path=c["clip"],
        clip_tokenizer=fake_tok,
        clip_text_cfg=c["tcfg"],
        clip_vision_cfg=c["vcfg"],
        vq_cfg=V_CFG,
    )
    tf = models.clip_text_encode(["whatever"])
    assert tf.shape == (1, c["tcfg"].embed_dim)


def test_load_byt5_int8_close_to_float(checkpoints):
    """byt5_int8=True loads the same checkpoint with int8 block linears and
    stays close to the float encode (weight-only: per-channel rounding only)."""
    from paella_tpu.cond import byt5_batch_encode
    from paella_tpu.cond.loader import load_byt5

    c = checkpoints
    enc = load_byt5(c["byt5"], c["byt5_cfg"])
    enc_q = load_byt5(c["byt5"], c["byt5_cfg"], int8_weights=True)
    ids, mask = byt5_batch_encode(["a red cat", "blue"])
    ref = np.asarray(enc(jnp.asarray(ids), jnp.asarray(mask)), np.float64)
    got = np.asarray(enc_q(jnp.asarray(ids), jnp.asarray(mask)), np.float64)
    assert got.shape == ref.shape and np.isfinite(got).all()
    rel = np.abs(got - ref).mean() / np.abs(ref).mean()
    assert rel < 0.05, rel


def test_load_byt5_w8a8_close_to_float(checkpoints):
    """act_quant=True (true W8A8) loads through the same path and stays within
    dynamic-quantization distance of the float encode; without int8_weights it
    must fail loudly (the s8 path needs a quantize_t5_int8 tree)."""
    import dataclasses

    from paella_tpu.cond import byt5_batch_encode
    from paella_tpu.cond.loader import load_byt5

    c = checkpoints
    aq_cfg = dataclasses.replace(c["byt5_cfg"], act_quant=True)
    with pytest.raises(ValueError, match="int8_weights"):
        load_byt5(c["byt5"], aq_cfg)

    enc = load_byt5(c["byt5"], c["byt5_cfg"])
    enc_aq = load_byt5(c["byt5"], aq_cfg, int8_weights=True)
    ids, mask = byt5_batch_encode(["a red cat", "blue"])
    ref = np.asarray(enc(jnp.asarray(ids), jnp.asarray(mask)), np.float64)
    got = np.asarray(enc_aq(jnp.asarray(ids), jnp.asarray(mask)), np.float64)
    assert got.shape == ref.shape and np.isfinite(got).all()
    rel = np.abs(got - ref).mean() / np.abs(ref).mean()
    assert rel < 0.08, rel
