"""PyTorch checkpoint -> JAX pytree converters.

Converts the released reference checkpoints (denoiser state_dict saved at
src_distributed/train.py:131-138; VQGAN state_dict loaded at
src_distributed/utils.py:66-67) into this framework's parameter trees.

Layout rules (the inverse of our op-level torch-parity tests in
tests/test_functional.py / tests/test_attention.py):
- Linear weight (out, in)            -> Dense kernel (in, out):        W.T
- Conv2d weight (out, in/g, kh, kw)  -> HWIO kernel (kh, kw, in/g, out): transpose(2,3,1,0)
- 1x1 Conv2d                         -> Dense kernel (in, out):        W[:, :, 0, 0].T
- ConvTranspose2d weight (in, out, kh, kw) -> (kh, kw, in, out):       transpose(2,3,0,1)
- MultiheadAttention in_proj_weight (3c, c) -> split into thirds q/k/v
  (the same split documented at reference utils/alter_attention.py:9-10), each W.T
- Embedding / LayerNorm-affine-free / gammas: direct (GRN gamma/beta squeeze)
- BatchNorm2d -> {scale, bias} params + {mean, var} batch_stats

Tensors arrive as numpy (use `load_torch_state_dict` to read a .pt without
importing torch if possible).
"""
from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from ..config import PaellaConfig, VQConfig

Tensor = np.ndarray


def load_torch_state_dict(path: str, key: str | None = "state_dict") -> Dict[str, Tensor]:
    """Load a torch .pt checkpoint into numpy arrays. The reference saves a dict
    with the model under 'state_dict' (src_distributed/train.py:134); pass
    key=None if the file is a bare state_dict."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if key is not None and isinstance(obj, dict) and key in obj:
        obj = obj[key]
    return {k: v.detach().cpu().numpy() for k, v in obj.items()}


def _dense(sd: Mapping[str, Tensor], prefix: str, bias: bool = True) -> dict:
    out = {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T)}
    if bias:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _dense_from_1x1(sd: Mapping[str, Tensor], prefix: str, bias: bool = True) -> dict:
    w = sd[f"{prefix}.weight"][:, :, 0, 0]
    out = {"kernel": np.ascontiguousarray(w.T)}
    if bias:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _conv(sd: Mapping[str, Tensor], prefix: str, bias: bool = True) -> dict:
    out = {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].transpose(2, 3, 1, 0))}
    if bias:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _conv_transpose(sd: Mapping[str, Tensor], prefix: str, bias: bool = True) -> dict:
    out = {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].transpose(2, 3, 0, 1))}
    if bias:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _mha(sd: Mapping[str, Tensor], prefix: str) -> dict:
    w = sd[f"{prefix}.in_proj_weight"]
    b = sd[f"{prefix}.in_proj_bias"]
    c = w.shape[1]
    wq, wk, wv = w[:c], w[c : 2 * c], w[2 * c :]
    bq, bk, bv = b[:c], b[c : 2 * c], b[2 * c :]
    return {
        "q": {"kernel": np.ascontiguousarray(wq.T), "bias": bq},
        "k": {"kernel": np.ascontiguousarray(wk.T), "bias": bk},
        "v": {"kernel": np.ascontiguousarray(wv.T), "bias": bv},
        "o": {
            "kernel": np.ascontiguousarray(sd[f"{prefix}.out_proj.weight"].T),
            "bias": sd[f"{prefix}.out_proj.bias"],
        },
    }


def _resblock(sd: Mapping[str, Tensor], prefix: str) -> dict:
    return {
        "depthwise": _conv(sd, f"{prefix}.depthwise"),
        "channelwise": {
            "fc1": _dense(sd, f"{prefix}.channelwise.0"),
            "grn": {
                "gamma": sd[f"{prefix}.channelwise.2.gamma"].reshape(-1),
                "beta": sd[f"{prefix}.channelwise.2.beta"].reshape(-1),
            },
            "fc2": _dense(sd, f"{prefix}.channelwise.4"),
        },
    }


def _ffblock(sd: Mapping[str, Tensor], prefix: str) -> dict:
    return {
        "channelwise": {
            "fc1": _dense(sd, f"{prefix}.channelwise.0"),
            "grn": {
                "gamma": sd[f"{prefix}.channelwise.2.gamma"].reshape(-1),
                "beta": sd[f"{prefix}.channelwise.2.beta"].reshape(-1),
            },
            "fc2": _dense(sd, f"{prefix}.channelwise.4"),
        },
    }


def _attnblock(sd: Mapping[str, Tensor], prefix: str) -> dict:
    return {
        "kv_mapper": _dense(sd, f"{prefix}.kv_mapper.1"),
        "attention": _mha(sd, f"{prefix}.attention.attn"),
    }


def _timestep(sd: Mapping[str, Tensor], prefix: str) -> dict:
    return {"mapper": _dense(sd, f"{prefix}.mapper")}


_BLOCK_CONVERTERS = {"C": _resblock, "A": _attnblock, "F": _ffblock, "T": _timestep}


def _stack_trees(trees):
    """Stack a list of identical param trees along a new leading axis (the layout
    nn.scan expects for the scanned block groups)."""
    import jax

    return jax.tree_util.tree_map(lambda *xs: np.stack(xs, axis=0), *trees)


def convert_paella(sd: Mapping[str, Tensor], cfg: PaellaConfig = PaellaConfig()) -> dict:
    """Reference denoiser state_dict -> our Paella param tree.

    Torch module indices follow the construction order at src/modules.py:148-176:
    down_blocks.{i} holds an optional downsampler (Sequential at index 0 for i>0)
    then blocks[i] * len(level_config[i]) blocks; up_blocks are built deepest-first
    with the upsampler Sequential appended last for levels > 0.

    Our layout: the first repetition of each level is `{down,up}_{i}_0_{k}_{bt}`;
    repetitions 1.. are STACKED (leading axis) under `{down,up}_{i}_rest/{k}_{bt}`
    for the model's nn.scan.
    """
    params: Dict[str, Any] = {
        "byt5_mapper": _dense(sd, "byt5_mapper"),
        "clip_mapper": _dense(sd, "clip_mapper"),
        "clip_image_mapper": _dense(sd, "clip_image_mapper"),
        "in_embedding": {"embedding": sd["in_mapper.0.weight"]},
        "embedding_conv": _dense_from_1x1(sd, "embedding.1"),
        "clf_conv": _dense_from_1x1(sd, "clf.1"),
        "out_proj": {"kernel": np.ascontiguousarray(sd["out_mapper.1.weight"][:, :, 0, 0].T)},
    }

    def convert_level(prefix: str, i: int, torch_prefix: str, j0: int) -> int:
        j = j0
        rest = []
        for rep in range(cfg.blocks[i]):
            group = {}
            for k, bt in enumerate(cfg.level_config[i]):
                tree = _BLOCK_CONVERTERS[bt](sd, f"{torch_prefix}.{j}")
                if rep == 0:
                    params[f"{prefix}_{i}_0_{k}_{bt}"] = tree
                else:
                    group[f"{k}_{bt}"] = tree
                j += 1
            if rep > 0:
                rest.append(group)
        if rest:
            params[f"{prefix}_{i}_rest"] = _stack_trees(rest)
        return j

    n_levels = len(cfg.c_hidden)
    # DOWN
    for i in range(n_levels):
        j = 0
        if i > 0:
            params[f"down_{i}_downsample"] = {"conv": _conv(sd, f"down_blocks.{i}.{j}.1")}
            j += 1
        convert_level("down", i, f"down_blocks.{i}", j)
    # UP (torch index iu counts reversed levels; src/modules.py:163-176)
    for iu, i in enumerate(reversed(range(n_levels))):
        j = convert_level("up", i, f"up_blocks.{iu}", 0)
        if i > 0:
            params[f"up_{i}_upsample"] = {"conv": _conv_transpose(sd, f"up_blocks.{iu}.{j}.1")}
    return params


def convert_vqgan(sd: Mapping[str, Tensor], cfg: VQConfig = VQConfig()) -> dict:
    """Reference VQGAN state_dict -> our {params, batch_stats} variables.

    Torch indices follow src/vqgan.py:53-89: down_blocks = [ResBlock] + per-level
    [Conv, ResBlock] + [Sequential(1x1 conv, BatchNorm)]; up_blocks = [Sequential(1x1)]
    + 12 bottleneck ResBlocks + [ConvTranspose + ResBlock] per remaining level.
    """

    def vq_res(prefix: str) -> dict:
        return {
            "gammas": sd[f"{prefix}.gammas"],
            "depthwise": _conv(sd, f"{prefix}.depthwise.1"),
            "fc1": _dense(sd, f"{prefix}.channelwise.0"),
            "fc2": _dense(sd, f"{prefix}.channelwise.2"),
        }

    params: Dict[str, Any] = {"in_conv": _dense_from_1x1(sd, "in_block.1")}
    j = 0
    for i in range(cfg.levels):
        if i > 0:
            params[f"down_conv_{i}"] = _conv(sd, f"down_blocks.{j}")
            j += 1
        params[f"down_res_{i}"] = vq_res(f"down_blocks.{j}")
        j += 1
    params["to_latent"] = _dense_from_1x1(sd, f"down_blocks.{j}.0", bias=False)
    params["latent_norm"] = {
        "scale": sd[f"down_blocks.{j}.1.weight"],
        "bias": sd[f"down_blocks.{j}.1.bias"],
    }
    batch_stats = {
        "latent_norm": {
            "mean": sd[f"down_blocks.{j}.1.running_mean"],
            "var": sd[f"down_blocks.{j}.1.running_var"],
        }
    }

    params["vquantizer"] = {"codebook": sd["vquantizer.codebook.weight"]}

    params["from_latent"] = _dense_from_1x1(sd, "up_blocks.0.0")
    j = 1
    for i in range(cfg.levels):
        n_blocks = cfg.bottleneck_blocks if i == 0 else 1
        for b in range(n_blocks):
            params[f"up_res_{i}_{b}"] = vq_res(f"up_blocks.{j}")
            j += 1
        if i < cfg.levels - 1:
            params[f"up_conv_{i}"] = _conv_transpose(sd, f"up_blocks.{j}")
            j += 1
    params["out_conv"] = _dense_from_1x1(sd, "out_block.0")
    return {"params": params, "batch_stats": batch_stats}


def expected_paella_keys(cfg: PaellaConfig = PaellaConfig()) -> list[str]:
    """The torch state_dict keys convert_paella consumes — for coverage checks."""
    keys = [
        "byt5_mapper.weight",
        "byt5_mapper.bias",
        "clip_mapper.weight",
        "clip_mapper.bias",
        "clip_image_mapper.weight",
        "clip_image_mapper.bias",
        "in_mapper.0.weight",
        "embedding.1.weight",
        "embedding.1.bias",
        "clf.1.weight",
        "clf.1.bias",
        "out_mapper.1.weight",
    ]

    def block_keys(prefix: str, bt: str) -> list[str]:
        if bt == "C" or bt == "F":
            return [
                *([f"{prefix}.depthwise.weight", f"{prefix}.depthwise.bias"] if bt == "C" else []),
                f"{prefix}.channelwise.0.weight",
                f"{prefix}.channelwise.0.bias",
                f"{prefix}.channelwise.2.gamma",
                f"{prefix}.channelwise.2.beta",
                f"{prefix}.channelwise.4.weight",
                f"{prefix}.channelwise.4.bias",
            ]
        if bt == "A":
            return [
                f"{prefix}.kv_mapper.1.weight",
                f"{prefix}.kv_mapper.1.bias",
                f"{prefix}.attention.attn.in_proj_weight",
                f"{prefix}.attention.attn.in_proj_bias",
                f"{prefix}.attention.attn.out_proj.weight",
                f"{prefix}.attention.attn.out_proj.bias",
            ]
        if bt == "T":
            return [f"{prefix}.mapper.weight", f"{prefix}.mapper.bias"]
        raise ValueError(bt)

    n = len(cfg.c_hidden)
    for i in range(n):
        j = 0
        if i > 0:
            keys += [f"down_blocks.{i}.0.1.weight", f"down_blocks.{i}.0.1.bias"]
            j = 1
        for rep in range(cfg.blocks[i]):
            for bt in cfg.level_config[i]:
                keys += block_keys(f"down_blocks.{i}.{j}", bt)
                j += 1
    for iu, i in enumerate(reversed(range(n))):
        j = 0
        for rep in range(cfg.blocks[i]):
            for bt in cfg.level_config[i]:
                keys += block_keys(f"up_blocks.{iu}.{j}", bt)
                j += 1
        if i > 0:
            keys += [f"up_blocks.{iu}.{j}.1.weight", f"up_blocks.{iu}.{j}.1.bias"]
    return keys
