"""Full-model numerical parity: our JAX denoiser and codec vs a torch-functional
evaluation of the SAME (synthetic) reference-layout state dict.

The torch side below is a state-dict interpreter built from torch.nn.functional
ops following the reference architecture description (SURVEY.md §3.2/§3.4) — it
holds no modules and shares no code with the reference. If our converter or any
layer semantics misread the reference topology, logits diverge here.
"""
import dataclasses

import pytest
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from paella_tpu.config import PaellaConfig, VQConfig
from paella_tpu.codec import VQModel
from paella_tpu.convert import convert_paella, convert_vqgan
from paella_tpu.models import Paella

from tests.test_convert import synth_paella_state_dict, synth_vqgan_state_dict

P_CFG = dataclasses.replace(PaellaConfig.tiny(), dropout=(0.0, 0.0, 0.0))
V_CFG = VQConfig.tiny()


# ---------------------------------------------------------------------------
# torch-functional state-dict interpreters
# ---------------------------------------------------------------------------


def ln(x, eps=1e-6):
    return F.layer_norm(x, x.shape[-1:], eps=eps)


def ln2d(x):  # NCHW -> channels-last LN -> NCHW
    return ln(x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)


def grn(x, gamma, beta):  # x channels-last (B,H,W,C)
    gx = torch.norm(x, p=2, dim=(1, 2), keepdim=True)
    nx = gx / (gx.mean(dim=-1, keepdim=True) + 1e-6)
    return gamma * (x * nx) + beta + x


def mlp_channelwise(x_nchw, sd, p):
    h = x_nchw.permute(0, 2, 3, 1)
    h = F.linear(h, sd[f"{p}.0.weight"], sd[f"{p}.0.bias"])
    h = F.gelu(h)
    h = grn(h, sd[f"{p}.2.gamma"], sd[f"{p}.2.beta"])
    h = F.linear(h, sd[f"{p}.4.weight"], sd[f"{p}.4.bias"])
    return h.permute(0, 3, 1, 2)


def resblock(x, sd, p, k, skip=None):
    res = x
    if skip is not None:
        x = torch.cat([x, skip], dim=1)
    c = res.shape[1]
    x = F.conv2d(x, sd[f"{p}.depthwise.weight"], sd[f"{p}.depthwise.bias"], padding=k // 2, groups=c)
    x = ln2d(x)
    return mlp_channelwise(x, sd, f"{p}.channelwise") + res


def timestep_block(x, sd, p, t_emb):
    ab = F.linear(t_emb, sd[f"{p}.mapper.weight"], sd[f"{p}.mapper.bias"])
    a, b = ab[:, :, None, None].chunk(2, dim=1)
    return x * (1 + a) + b


def attn_block(x, sd, p, cond, nhead):
    c = x.shape[1]
    kv = F.linear(F.silu(cond), sd[f"{p}.kv_mapper.1.weight"], sd[f"{p}.kv_mapper.1.bias"])
    normed = ln2d(x)
    tokens = normed.flatten(2).permute(0, 2, 1)  # (B, HW, C)
    joint = torch.cat([tokens, kv], dim=1)
    out, _ = F.multi_head_attention_forward(
        tokens.transpose(0, 1),
        joint.transpose(0, 1),
        joint.transpose(0, 1),
        c,
        nhead,
        sd[f"{p}.attention.attn.in_proj_weight"],
        sd[f"{p}.attention.attn.in_proj_bias"],
        None,
        None,
        False,
        0.0,
        sd[f"{p}.attention.attn.out_proj.weight"],
        sd[f"{p}.attention.attn.out_proj.bias"],
        need_weights=False,
    )
    out = out.transpose(0, 1).permute(0, 2, 1).view_as(x)
    return x + out


def torch_paella_forward(sd_np, cfg, x_np, r_np, byt5_np, clip_np):
    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in sd_np.items()}
    x = torch.from_numpy(x_np).long()
    r = torch.from_numpy(r_np)
    byt5 = torch.from_numpy(byt5_np)
    clip = torch.from_numpy(clip_np)

    # r embedding (reference: src/modules.py:212-221)
    import math

    rr = r * 10000
    half = cfg.c_r // 2
    freq = torch.arange(half).float().mul(-math.log(10000) / (half - 1)).exp()
    emb = rr[:, None] * freq[None, :]
    r_emb = torch.cat([emb.sin(), emb.cos()], dim=1)

    # conditioning sequence
    seq = F.linear(byt5, sd["byt5_mapper.weight"], sd["byt5_mapper.bias"])
    cl = F.linear(clip, sd["clip_mapper.weight"], sd["clip_mapper.bias"]).view(
        clip.shape[0], cfg.clip_seq_len, cfg.c_cond
    )
    cond = ln(torch.cat([seq, cl], dim=1))

    # in mapper + patchify
    h = ln(F.embedding(x, sd["in_mapper.0.weight"])).permute(0, 3, 1, 2)
    h = F.pixel_unshuffle(h, cfg.patch_size)
    h = F.conv2d(h, sd["embedding.1.weight"], sd["embedding.1.bias"])
    h = ln2d(h)

    def run_blocks(prefix, i, j, h, skip):
        for rep in range(cfg.blocks[i]):
            for k, bt in enumerate(cfg.level_config[i]):
                p = f"{prefix}.{j}"
                if bt == "C":
                    h = resblock(h, sd, p, cfg.kernel_size, skip if (rep == 0 and k == 0) else None)
                elif bt == "T":
                    h = timestep_block(h, sd, p, r_emb)
                elif bt == "A":
                    h = attn_block(h, sd, p, cond, cfg.nhead[i])
                j += 1
        return h, j

    n = len(cfg.c_hidden)
    outs = []
    for i in range(n):
        j = 0
        if i > 0:
            h = ln2d(h)
            h = F.conv2d(h, sd[f"down_blocks.{i}.0.1.weight"], sd[f"down_blocks.{i}.0.1.bias"], stride=2)
            j = 1
        h, _ = run_blocks(f"down_blocks.{i}", i, j, h, None)
        outs.insert(0, h)

    h = outs[0]
    for iu, i in enumerate(reversed(range(n))):
        skip = outs[iu] if iu > 0 else None
        h, j = run_blocks(f"up_blocks.{iu}", i, 0, h, skip)
        if i > 0:
            h = ln2d(h)
            h = F.conv_transpose2d(
                h, sd[f"up_blocks.{iu}.{j}.1.weight"], sd[f"up_blocks.{iu}.{j}.1.bias"], stride=2
            )

    h = ln2d(h)
    h = F.conv2d(h, sd["clf.1.weight"], sd["clf.1.bias"])
    h = F.pixel_shuffle(h, cfg.patch_size)
    h = ln2d(h)
    h = F.conv2d(h, sd["out_mapper.1.weight"])
    return h.detach().numpy()  # (B, num_labels, H, W)


def test_denoiser_full_forward_matches_torch():
    sd = synth_paella_state_dict(P_CFG)
    # make the zero clf non-trivial so the comparison isn't vacuous
    rng = np.random.default_rng(7)
    for k in ("clf.1.weight", "clf.1.bias"):
        sd[k] = rng.standard_normal(sd[k].shape, dtype=np.float32) * 0.05

    b, hh, ww = 2, 16, 16
    x = rng.integers(0, P_CFG.num_labels, (b, hh, ww)).astype(np.int64)
    r = np.array([0.3, 0.8], np.float32)
    byt5 = rng.standard_normal((b, 5, P_CFG.byt5_embd), dtype=np.float32)
    clip = rng.standard_normal((b, P_CFG.clip_embd), dtype=np.float32)

    theirs = torch_paella_forward(sd, P_CFG, x, r, byt5, clip)  # (B, K, H, W)

    model = Paella(P_CFG)
    params = jax.tree_util.tree_map(jnp.asarray, convert_paella(sd, P_CFG))
    ours = model.apply(
        {"params": params}, jnp.asarray(x.astype(np.int32)), jnp.asarray(r), jnp.asarray(byt5), jnp.asarray(clip)
    )
    ours_nchw = np.asarray(ours).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours_nchw, theirs, rtol=5e-3, atol=5e-3)
    assert np.abs(theirs).max() > 1e-3


def torch_vqgan_decode(sd_np, cfg, idx_np):
    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in sd_np.items()}
    c_levels = [cfg.c_hidden // (2**i) for i in reversed(range(cfg.levels))]

    def vq_res(x, p):
        g = sd[f"{p}.gammas"]
        c = x.shape[1]
        h = ln2d(x) * (1 + g[0]) + g[1]
        h = F.pad(h, (1, 1, 1, 1), mode="replicate")
        h = F.conv2d(h, sd[f"{p}.depthwise.1.weight"], sd[f"{p}.depthwise.1.bias"], groups=c)
        x = x + h * g[2]
        h = ln2d(x) * (1 + g[3]) + g[4]
        h = h.permute(0, 2, 3, 1)
        h = F.linear(h, sd[f"{p}.channelwise.0.weight"], sd[f"{p}.channelwise.0.bias"])
        h = F.gelu(h)
        h = F.linear(h, sd[f"{p}.channelwise.2.weight"], sd[f"{p}.channelwise.2.bias"])
        return x + h.permute(0, 3, 1, 2) * g[5]

    idx = torch.from_numpy(idx_np).long()
    z = F.embedding(idx, sd["vquantizer.codebook.weight"]).permute(0, 3, 1, 2)
    h = F.conv2d(z, sd["up_blocks.0.0.weight"], sd["up_blocks.0.0.bias"])
    j = 1
    for i in range(cfg.levels):
        nb = cfg.bottleneck_blocks if i == 0 else 1
        for _ in range(nb):
            h = vq_res(h, f"up_blocks.{j}")
            j += 1
        if i < cfg.levels - 1:
            h = F.conv_transpose2d(h, sd[f"up_blocks.{j}.weight"], sd[f"up_blocks.{j}.bias"], stride=2, padding=1)
            j += 1
    h = F.conv2d(h, sd["out_block.0.weight"], sd["out_block.0.bias"])
    return F.pixel_shuffle(h, 2).detach().numpy()


def test_vqgan_decode_matches_torch():
    sd = synth_vqgan_state_dict(V_CFG)
    # non-identity gammas so the resblocks actually contribute
    rng = np.random.default_rng(9)
    for k in list(sd):
        if k.endswith("gammas"):
            sd[k] = rng.standard_normal(6).astype(np.float32) * 0.3

    idx = rng.integers(0, V_CFG.codebook_size, (1, 8, 8))
    theirs = torch_vqgan_decode(sd, V_CFG, idx)  # (B, 3, H, W)

    model = VQModel(V_CFG)
    variables = jax.tree_util.tree_map(jnp.asarray, convert_vqgan(sd, V_CFG))
    ours = model.apply(variables, jnp.asarray(idx.astype(np.int32)), method=VQModel.decode_indices)
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), theirs, rtol=5e-3, atol=5e-3
    )
    assert np.abs(theirs).max() > 1e-3


def torch_vqgan_encode(sd_np, cfg, x_np):
    """Encoder path: in_block -> down blocks -> 1x1 + BatchNorm (running stats,
    eval mode) -> nearest-neighbor codebook indices."""
    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in sd_np.items()}
    c_levels = [cfg.c_hidden // (2**i) for i in reversed(range(cfg.levels))]

    def vq_res(x, p):
        g = sd[f"{p}.gammas"]
        c = x.shape[1]
        h = ln2d(x) * (1 + g[0]) + g[1]
        h = F.pad(h, (1, 1, 1, 1), mode="replicate")
        h = F.conv2d(h, sd[f"{p}.depthwise.1.weight"], sd[f"{p}.depthwise.1.bias"], groups=c)
        x = x + h * g[2]
        h = ln2d(x) * (1 + g[3]) + g[4]
        h = h.permute(0, 2, 3, 1)
        h = F.linear(h, sd[f"{p}.channelwise.0.weight"], sd[f"{p}.channelwise.0.bias"])
        h = F.gelu(h)
        h = F.linear(h, sd[f"{p}.channelwise.2.weight"], sd[f"{p}.channelwise.2.bias"])
        return x + h.permute(0, 3, 1, 2) * g[5]

    x = torch.from_numpy(x_np).permute(0, 3, 1, 2)
    h = F.pixel_unshuffle(x, 2)
    h = F.conv2d(h, sd["in_block.1.weight"], sd["in_block.1.bias"])
    j = 0
    for i in range(cfg.levels):
        if i > 0:
            h = F.conv2d(h, sd[f"down_blocks.{j}.weight"], sd[f"down_blocks.{j}.bias"], stride=2, padding=1)
            j += 1
        h = vq_res(h, f"down_blocks.{j}")
        j += 1
    h = F.conv2d(h, sd[f"down_blocks.{j}.0.weight"])
    h = F.batch_norm(
        h,
        sd[f"down_blocks.{j}.1.running_mean"],
        sd[f"down_blocks.{j}.1.running_var"],
        sd[f"down_blocks.{j}.1.weight"],
        sd[f"down_blocks.{j}.1.bias"],
        training=False,
    )
    z = h.permute(0, 2, 3, 1)  # channels-last for the lookup
    cb = sd["vquantizer.codebook.weight"]
    d = (z[..., None, :] - cb[None, None, None]).pow(2).sum(-1)
    return d.argmin(-1).numpy()


def test_vqgan_encode_matches_torch():
    sd = synth_vqgan_state_dict(V_CFG)
    rng = np.random.default_rng(11)
    for k in list(sd):
        if k.endswith("gammas"):
            sd[k] = rng.standard_normal(6).astype(np.float32) * 0.3
    # non-trivial BatchNorm running stats
    j_final = max(int(k.split(".")[1]) for k in sd if k.startswith("down_blocks."))
    sd[f"down_blocks.{j_final}.1.running_mean"] = rng.standard_normal(V_CFG.c_latent).astype(np.float32) * 0.1
    sd[f"down_blocks.{j_final}.1.running_var"] = (1 + rng.uniform(0, 0.5, V_CFG.c_latent)).astype(np.float32)

    x = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    theirs = torch_vqgan_encode(sd, V_CFG, x)

    model = VQModel(V_CFG)
    variables = jax.tree_util.tree_map(jnp.asarray, convert_vqgan(sd, V_CFG))
    _, _, ours, _ = model.apply(variables, jnp.asarray(x), method=VQModel.encode)
    match = (np.asarray(ours) == theirs).mean()
    assert match > 0.99, f"index agreement only {match:.3f}"


@pytest.mark.slow
def test_denoiser_full_forward_matches_torch_1B():
    """Flagship-geometry conversion rehearsal (round-2 VERDICT #1b): the FULL
    1B layout (blocks (6,16,6), c_hidden (640,1280,1280), byt5_embd 2560 —
    reference src_distributed/train.py:48 + src/modules.py:110-112) through
    convert_paella, evaluated at reduced spatial dims against the
    torch-functional interpreter. The per-rep stacking across 16 repetitions,
    the packed-MHA split at c=1280/nhead=16, and the patch-major permutations
    are exactly where a geometry-dependent converter bug would hide; the tiny
    test cannot see them."""
    cfg = dataclasses.replace(PaellaConfig.v1_byt5_xl(), dropout=(0.0, 0.0, 0.0))
    sd = synth_paella_state_dict(cfg)
    rng = np.random.default_rng(17)
    for k in ("clf.1.weight", "clf.1.bias"):  # zero-init head would be vacuous
        sd[k] = rng.standard_normal(sd[k].shape, dtype=np.float32) * 0.05

    b, hh, ww = 1, 16, 16
    x = rng.integers(0, cfg.num_labels, (b, hh, ww)).astype(np.int64)
    r = np.array([0.4], np.float32)
    byt5 = rng.standard_normal((b, 5, cfg.byt5_embd), dtype=np.float32)
    clip = rng.standard_normal((b, cfg.clip_embd), dtype=np.float32)

    theirs = torch_paella_forward(sd, cfg, x, r, byt5, clip)  # (B, K, H, W)

    model = Paella(cfg)
    params = jax.tree_util.tree_map(jnp.asarray, convert_paella(sd, cfg))
    n_params = sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
    assert n_params > 900e6  # really the flagship geometry
    ours = model.apply(
        {"params": params},
        jnp.asarray(x.astype(np.int32)),
        jnp.asarray(r),
        jnp.asarray(byt5),
        jnp.asarray(clip),
    )
    ours_nchw = np.asarray(ours).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours_nchw, theirs, rtol=1e-2, atol=1e-2)
    assert np.abs(theirs).max() > 1e-3
