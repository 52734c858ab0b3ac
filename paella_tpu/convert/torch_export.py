"""JAX pytree -> PyTorch-format state_dict exporters (inverse of torch_import).

Lets models trained in this framework be loaded by reference-compatible PyTorch
code, and gives the converters a round-trip test (import(export(x)) == x) that
pins every layout rule without needing the released checkpoints.
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from ..config import PaellaConfig, VQConfig

Tensor = np.ndarray


def _np(x) -> np.ndarray:
    return np.asarray(x)


def _lin(out: Dict[str, Tensor], prefix: str, p: Mapping, bias: bool = True):
    out[f"{prefix}.weight"] = np.ascontiguousarray(_np(p["kernel"]).T)
    if bias:
        out[f"{prefix}.bias"] = _np(p["bias"])


def _conv1x1(out: Dict[str, Tensor], prefix: str, p: Mapping, bias: bool = True):
    w = np.ascontiguousarray(_np(p["kernel"]).T)[:, :, None, None]
    out[f"{prefix}.weight"] = w
    if bias:
        out[f"{prefix}.bias"] = _np(p["bias"])


def _conv(out: Dict[str, Tensor], prefix: str, p: Mapping, bias: bool = True):
    out[f"{prefix}.weight"] = np.ascontiguousarray(_np(p["kernel"]).transpose(3, 2, 0, 1))
    if bias:
        out[f"{prefix}.bias"] = _np(p["bias"])


def _conv_transpose(out: Dict[str, Tensor], prefix: str, p: Mapping, bias: bool = True):
    out[f"{prefix}.weight"] = np.ascontiguousarray(_np(p["kernel"]).transpose(2, 3, 0, 1))
    if bias:
        out[f"{prefix}.bias"] = _np(p["bias"])


def _mha(out: Dict[str, Tensor], prefix: str, p: Mapping):
    wq, wk, wv = (_np(p[n]["kernel"]).T for n in ("q", "k", "v"))
    bq, bk, bv = (_np(p[n]["bias"]) for n in ("q", "k", "v"))
    out[f"{prefix}.in_proj_weight"] = np.ascontiguousarray(np.concatenate([wq, wk, wv], axis=0))
    out[f"{prefix}.in_proj_bias"] = np.concatenate([bq, bk, bv], axis=0)
    _lin(out, f"{prefix}.out_proj", p["o"])


def _block(out: Dict[str, Tensor], prefix: str, bt: str, p: Mapping):
    if bt in ("C", "F"):
        if bt == "C":
            _conv(out, f"{prefix}.depthwise", p["depthwise"])
        cw = p["channelwise"]
        _lin(out, f"{prefix}.channelwise.0", cw["fc1"])
        out[f"{prefix}.channelwise.2.gamma"] = _np(cw["grn"]["gamma"]).reshape(1, 1, 1, -1)
        out[f"{prefix}.channelwise.2.beta"] = _np(cw["grn"]["beta"]).reshape(1, 1, 1, -1)
        _lin(out, f"{prefix}.channelwise.4", cw["fc2"])
    elif bt == "A":
        _lin(out, f"{prefix}.kv_mapper.1", p["kv_mapper"])
        _mha(out, f"{prefix}.attention.attn", p["attention"])
    elif bt == "T":
        _lin(out, f"{prefix}.mapper", p["mapper"])


def export_paella(params: Mapping, cfg: PaellaConfig = PaellaConfig()) -> Dict[str, Tensor]:
    """Our Paella params -> reference-layout torch state_dict (numpy values)."""
    sd: Dict[str, Tensor] = {}
    _lin(sd, "byt5_mapper", params["byt5_mapper"])
    _lin(sd, "clip_mapper", params["clip_mapper"])
    _lin(sd, "clip_image_mapper", params["clip_image_mapper"])
    sd["in_mapper.0.weight"] = _np(params["in_embedding"]["embedding"])
    _conv1x1(sd, "embedding.1", params["embedding_conv"])
    _conv1x1(sd, "clf.1", params["clf_conv"])
    sd["out_mapper.1.weight"] = np.ascontiguousarray(
        _np(params["out_proj"]["kernel"]).T
    )[:, :, None, None]

    def unstack(tree, idx):
        import jax

        return jax.tree_util.tree_map(lambda x: _np(x)[idx], tree)

    def export_level(prefix: str, i: int, torch_prefix: str, j0: int) -> int:
        j = j0
        rest = params.get(f"{prefix}_{i}_rest")
        for rep in range(cfg.blocks[i]):
            for k, bt in enumerate(cfg.level_config[i]):
                if rep == 0:
                    tree = params[f"{prefix}_{i}_0_{k}_{bt}"]
                else:
                    tree = unstack(rest[f"{k}_{bt}"], rep - 1)
                _block(sd, f"{torch_prefix}.{j}", bt, tree)
                j += 1
        return j

    n = len(cfg.c_hidden)
    for i in range(n):
        j = 0
        if i > 0:
            _conv(sd, f"down_blocks.{i}.0.1", params[f"down_{i}_downsample"]["conv"])
            j = 1
        export_level("down", i, f"down_blocks.{i}", j)
    for iu, i in enumerate(reversed(range(n))):
        j = export_level("up", i, f"up_blocks.{iu}", 0)
        if i > 0:
            _conv_transpose(sd, f"up_blocks.{iu}.{j}.1", params[f"up_{i}_upsample"]["conv"])
    return sd


def export_vqgan(variables: Mapping, cfg: VQConfig = VQConfig()) -> Dict[str, Tensor]:
    """Our VQModel {params, batch_stats} -> reference-layout torch state_dict."""
    params = variables["params"]
    stats = variables["batch_stats"]
    sd: Dict[str, Tensor] = {}

    def vq_res(prefix: str, p: Mapping):
        sd[f"{prefix}.gammas"] = _np(p["gammas"])
        _conv(sd, f"{prefix}.depthwise.1", p["depthwise"])
        _lin(sd, f"{prefix}.channelwise.0", p["fc1"])
        _lin(sd, f"{prefix}.channelwise.2", p["fc2"])

    _conv1x1(sd, "in_block.1", params["in_conv"])
    j = 0
    for i in range(cfg.levels):
        if i > 0:
            _conv(sd, f"down_blocks.{j}", params[f"down_conv_{i}"])
            j += 1
        vq_res(f"down_blocks.{j}", params[f"down_res_{i}"])
        j += 1
    _conv1x1(sd, f"down_blocks.{j}.0", params["to_latent"], bias=False)
    sd[f"down_blocks.{j}.1.weight"] = _np(params["latent_norm"]["scale"])
    sd[f"down_blocks.{j}.1.bias"] = _np(params["latent_norm"]["bias"])
    sd[f"down_blocks.{j}.1.running_mean"] = _np(stats["latent_norm"]["mean"])
    sd[f"down_blocks.{j}.1.running_var"] = _np(stats["latent_norm"]["var"])

    sd["vquantizer.codebook.weight"] = _np(params["vquantizer"]["codebook"])

    _conv1x1(sd, "up_blocks.0.0", params["from_latent"])
    j = 1
    for i in range(cfg.levels):
        nb = cfg.bottleneck_blocks if i == 0 else 1
        for b in range(nb):
            vq_res(f"up_blocks.{j}", params[f"up_res_{i}_{b}"])
            j += 1
        if i < cfg.levels - 1:
            _conv_transpose(sd, f"up_blocks.{j}", params[f"up_conv_{i}"])
            j += 1
    _conv1x1(sd, "out_block.0", params["out_conv"])
    return sd
