"""Int8 quantization for inference (weight-only + true W8A8) and its
in-repo quality proxy.

Per-output-channel symmetric int8 on the scan-stacked channelwise MLP kernels
(fc1/fc2) — the dominant per-repetition weight traffic (26 of 45 MB at the 1B
level-1 geometry). The fused ResBlock kernel streams the int8 tiles and
applies the scales to its matmul outputs: x @ (Wq * s) == (x @ Wq) * s, so
the only approximation is the rounding of W itself (per-channel, <=0.4%
relative — pinned against bf16 by tests/test_quant.py).

Quantized trees are only valid with PaellaConfig.fused_blocks=True: the XLA
Dense path would consume the raw int8 codes without scales (the denoiser
raises if it sees int8 kernels outside the fused path).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def quantize_dense_int8(kernel: Array) -> Tuple[Array, Array]:
    """(..., in, out) kernel -> (int8 codes, (..., out) f32 scales)."""
    amax = jnp.max(jnp.abs(kernel.astype(jnp.float32)), axis=-2)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.round(kernel.astype(jnp.float32) / scale[..., None, :])
    return q.astype(jnp.int8), scale.astype(jnp.float32)


def dequantize_dense_int8(q: Array, scale: Array, dtype=jnp.float32) -> Array:
    return (q.astype(jnp.float32) * scale[..., None, :]).astype(dtype)


def w8a8_dot(x: Array, kernel_q: Array, kernel_scale: Array, dtype) -> Array:
    """True W8A8 matmul at the XLA level: dynamic per-row symmetric s8
    activations x per-output-channel s8 weights, s32 accumulation on the
    double-rate s8 MXU path (scripts/micro_int8.py: 366 vs 191 TFLOP/s),
    f32 rescale applied to the (small) output.

    Unlike the weight-only path (dequantize_dense_int8), the int8 kernel is
    consumed directly by the dot — no per-element VPU dequant of the full
    weight matrix — so batch-1 weight-bandwidth-bound matmuls see the halved
    HBM traffic as speed, not just memory.
    """
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    x_scale = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
    xq = jnp.round(x.astype(jnp.float32) / x_scale).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq,
        kernel_q,
        (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * x_scale * kernel_scale).astype(dtype)


def quantize_paella_int8(
    params, levels: Sequence[int] = (1, 2), include_first: bool = False
):
    """int8-quantize the scan-stacked channelwise fc1/fc2 kernels of the given
    UNet levels (the repetitions the fused kernel executes; level 0 stays on
    the XLA path at 256^2 and keeps bf16 weights). Returns a NEW params tree
    where those 'kernel' leaves are int8 with 'kernel_scale' siblings.

    include_first=True also quantizes each level's FIRST repetition (the
    {down,up}_{i}_0_{k}_C blocks, incl. the skip-concat ones) — valid only
    when those blocks run the fused kernel path (fused_blocks=True and
    fuse-eligible shapes): the XLA ResBlock path has no meaning for the codes.
    """
    import re

    import flax

    flat = flax.traverse_util.flatten_dict(flax.core.unfreeze(params))
    out = dict(flat)
    stems = tuple(f"{d}_{i}_rest" for d in ("down", "up") for i in levels)
    first_re = re.compile(
        r"^(down|up)_(" + "|".join(str(i) for i in levels) + r")_0_\d+_C$"
    )
    for path, leaf in flat.items():
        if (
            len(path) >= 4
            and path[-3] == "channelwise"
            and path[-2] in ("fc1", "fc2")
            and path[-1] == "kernel"
            and (
                path[0] in stems
                or (include_first and first_re.match(path[0]))
            )
        ):
            q, s = quantize_dense_int8(leaf)
            out[path] = q
            out[path[:-1] + ("kernel_scale",)] = s
    return flax.traverse_util.unflatten_dict(out)


def quantize_t5_int8(params):
    """int8-quantize every linear kernel of a T5Encoder param tree (q/k/v/o,
    wi_0/wi_1/wo in each block) to per-output-channel symmetric int8 with a
    'kernel_scale' sibling that `cond.t5._T5Dense` dequantizes at apply time.
    Embedding, norms, and the relative-attention bias stay float.

    Motivation: batch-1 prompt encode on ByT5-XL is weight-bandwidth-bound
    (~5.2 GB of bf16 weights per request); int8 halves the dominant HBM
    traffic. Weight-only — activations and accumulation stay bf16/f32, so the
    only approximation is the per-channel rounding of W (<=0.4% relative).
    """
    import flax

    flat = flax.traverse_util.flatten_dict(flax.core.unfreeze(params))
    out = dict(flat)
    for path, leaf in flat.items():
        if (
            path[-1] == "kernel"
            and path[0].startswith("block_")
            and path[-2] in ("q", "k", "v", "o", "wi_0", "wi_1", "wo")
        ):
            q, s = quantize_dense_int8(leaf)
            out[path] = q
            out[path[:-1] + ("kernel_scale",)] = s
    return flax.traverse_util.unflatten_dict(out)


def fuse_eligible_levels(config) -> Tuple[int, ...]:
    """UNet levels whose channel widths satisfy the fused kernel's tile
    alignment (kernels/resblock.py::fuse_mode: c % 128 == 0, 4c % 512 == 0) —
    the levels W8A8 can quantize. At the 1B geometry: all three."""
    return tuple(
        i for i, c in enumerate(config.c_hidden) if c % 128 == 0 and (4 * c) % 512 == 0
    )


def w8a8_quality_proxy(
    config,
    params,
    key: Array,
    t_values: Sequence[float] = (0.9, 0.7, 0.5, 0.3, 0.1),
    batch: int = 2,
    latent_hw: Tuple[int, int] = (16, 16),
    byt5_len: int = 5,
    levels: Sequence[int] = None,
):
    """Quantitative W8A8 go/no-go proxy that runs WITHOUT real weights
    (round-2 VERDICT #4): per noise level t, compare the bf16 fused path
    against true W8A8 (act_quant) on the SAME inputs and report
      - kl: mean KL(softmax(bf16 logits) || softmax(w8a8 logits)), nats/token
      - flip: argmax token disagreement rate
      - rel: mean |Δlogit| / mean |logit|

    Returns a list of {"t", "kl", "flip", "rel"} rows. The documented
    heuristic gate (docs/quantization.md): mean kl <= 0.05 nats/token AND
    flip <= 5% across all t -> W8A8 is a candidate for enabling by default,
    PENDING the real-checkpoint FID check (this proxy bounds logit drift; FID
    is the ground truth the default flip waits for).

    Runs on CPU (Pallas interpret mode auto-engaged off-TPU) or TPU.
    """
    import dataclasses as _dc

    from .models.denoiser import Paella

    base = _dc.replace(
        config,
        fused_blocks=True,
        act_quant=False,
        dropout=tuple(0.0 for _ in config.dropout),
    )
    if levels is None:
        levels = fuse_eligible_levels(base)
    qparams = quantize_paella_int8(params, levels=levels, include_first=True)
    m_bf16 = Paella(base)
    m_w8a8 = Paella(_dc.replace(base, act_quant=True))

    h, w = latent_hw
    k_x, k_b, k_c = jax.random.split(key, 3)
    x = jax.random.randint(k_x, (batch, h, w), 0, base.num_labels)
    byt5 = jax.random.normal(k_b, (batch, byt5_len, base.byt5_embd), base.compute_dtype)
    clip = jax.random.normal(k_c, (batch, base.clip_embd), base.compute_dtype)

    # params travel as jit ARGUMENTS, never closure captures: captured trees
    # become HLO constants and a full-size param tree of them kills the
    # remote-compile service (the run_driver_e2e ByT5 lesson, observed again
    # on this proxy at the 209M trained geometry). Args also make the program
    # identical across weight arms, so trained/random/outlier-stressed runs
    # share one compile-cache entry.
    @jax.jit
    def compare(p, qp, t):
        tb = jnp.full((batch,), t, jnp.float32)
        ref = m_bf16.apply({"params": p}, x, tb, byt5, clip).astype(jnp.float32)
        got = m_w8a8.apply({"params": qp}, x, tb, byt5, clip).astype(jnp.float32)
        lp_ref = jax.nn.log_softmax(ref, axis=-1)
        lp_got = jax.nn.log_softmax(got, axis=-1)
        kl = jnp.sum(jnp.exp(lp_ref) * (lp_ref - lp_got), axis=-1).mean()
        flip = (ref.argmax(-1) != got.argmax(-1)).mean()
        rel = jnp.abs(got - ref).mean() / (jnp.abs(ref).mean() + 1e-9)
        return kl, flip, rel

    def run():
        rows = []
        for t in t_values:
            kl, flip, rel = compare(params, qparams, jnp.float32(t))
            rows.append(
                {"t": float(t), "kl": float(kl), "flip": float(flip), "rel": float(rel)}
            )
        return rows

    if jax.default_backend() == "tpu":
        return run()
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        return run()


def inject_weight_outliers(
    params, key: Array, frac: float = 0.02, scale: float = 12.0
):
    """Outlier-channel stress for the quality proxies (round-3 VERDICT: random
    init lacks the heavy-tailed channels trained transformers develop, so
    int8 proxies on fresh weights are systematically optimistic).

    Scales a random `frac` of each >=2-D float kernel's REDUCTION-axis
    channels by `scale`: per-output-channel weight quantization now faces
    heavy in-row tails, and the amplified activations flowing into the next
    layer stress the dynamic per-row activation quantization the same way
    real outlier features do (the LLM.int8() failure mode). The float-vs-int8
    comparison stays internally valid — both paths see the SAME perturbed
    weights. Norm scales, biases and embeddings are left untouched."""
    import flax

    flat = flax.traverse_util.flatten_dict(params, sep="/")
    out = {}
    for i, (name, v) in enumerate(sorted(flat.items())):
        if (
            name.split("/")[-1] == "kernel"
            and v.ndim >= 2
            and jnp.issubdtype(v.dtype, jnp.floating)
        ):
            axis = v.ndim - 2  # reduction (input-feature) axis of dense/conv
            k = jax.random.fold_in(key, i)
            m = jax.random.bernoulli(k, frac, (v.shape[axis],))
            s = jnp.where(m, jnp.asarray(scale, v.dtype), jnp.asarray(1.0, v.dtype))
            v = v * jnp.expand_dims(
                s, tuple(a for a in range(v.ndim) if a != axis)
            )
        out[name] = v
    return flax.traverse_util.unflatten_dict(out, sep="/")


# documented gate thresholds (docs/quantization.md): proxy PASS means "enable
# act_quant once real-checkpoint FID confirms"; it never flips the default alone
W8A8_PROXY_MAX_KL = 0.05  # nats/token
W8A8_PROXY_MAX_FLIP = 0.05


def w8a8_proxy_verdict(rows) -> Tuple[bool, str]:
    """Apply the documented thresholds to w8a8_quality_proxy rows."""
    worst_kl = max(r["kl"] for r in rows)
    worst_flip = max(r["flip"] for r in rows)
    ok = worst_kl <= W8A8_PROXY_MAX_KL and worst_flip <= W8A8_PROXY_MAX_FLIP
    msg = (
        f"worst KL {worst_kl:.4f} nats/token (gate {W8A8_PROXY_MAX_KL}), "
        f"worst argmax flip {worst_flip:.3%} (gate {W8A8_PROXY_MAX_FLIP:.0%}) -> "
        + (
            "PASS: W8A8 is a default-on candidate pending real-checkpoint FID"
            if ok
            else "FAIL: keep act_quant off"
        )
    )
    return ok, msg


def t5_w8a8_quality_proxy(
    t5_config,
    t5_params,
    config,
    params,
    key: Array,
    t_values: Sequence[float] = (0.9, 0.5, 0.1),
    batch: int = 2,
    latent_hw: Tuple[int, int] = (16, 16),
    byt5_len: int = 5,
):
    """Downstream go/no-go proxy for ByT5 act_quant — the text-path analog of
    w8a8_quality_proxy: encode the SAME token ids with the float and the W8A8
    encoder (T5Config.act_quant on a quantize_t5_int8 tree), feed both
    conditioning states to the SAME float-path denoiser, and report the
    denoiser-logits drift per noise level t as {"t", "kl", "flip", "rel"}
    rows for w8a8_proxy_verdict. Requires config.byt5_embd == t5_config.d_model.

    This measures what actually matters for generation: how much the
    quantized text tower perturbs the token logits, not just the encoder
    states' cosine (tests pin that separately).
    """
    import dataclasses as _dc

    from .cond.t5 import T5Encoder
    from .models.denoiser import Paella

    if config.byt5_embd != t5_config.d_model:
        raise ValueError(
            f"byt5_embd {config.byt5_embd} != t5 d_model {t5_config.d_model}"
        )
    enc_f = T5Encoder(_dc.replace(t5_config, act_quant=False))
    enc_q = T5Encoder(_dc.replace(t5_config, act_quant=True))
    qt5 = quantize_t5_int8(t5_params)

    base = _dc.replace(config, dropout=tuple(0.0 for _ in config.dropout))
    model = Paella(base)

    h, w = latent_hw
    k_x, k_i, k_c = jax.random.split(key, 3)
    x = jax.random.randint(k_x, (batch, h, w), 0, base.num_labels)
    ids = jax.random.randint(k_i, (batch, byt5_len), 0, t5_config.vocab_size)
    mask = jnp.ones((batch, byt5_len), bool)
    clip = jax.random.normal(k_c, (batch, base.clip_embd), base.compute_dtype)

    # params as jit ARGS, not closure captures — see w8a8_quality_proxy: a
    # captured XL-size tree as HLO constants kills the remote-compile service.
    @jax.jit
    def compare(t5p, qt5p, p, t):
        byt5_f = enc_f.apply({"params": t5p}, ids, mask)
        byt5_q = enc_q.apply({"params": qt5p}, ids, mask)
        tb = jnp.full((batch,), t, jnp.float32)
        dt = base.compute_dtype
        ref = model.apply({"params": p}, x, tb, byt5_f.astype(dt), clip)
        got = model.apply({"params": p}, x, tb, byt5_q.astype(dt), clip)
        ref, got = ref.astype(jnp.float32), got.astype(jnp.float32)
        lp_ref = jax.nn.log_softmax(ref, axis=-1)
        lp_got = jax.nn.log_softmax(got, axis=-1)
        kl = jnp.sum(jnp.exp(lp_ref) * (lp_ref - lp_got), axis=-1).mean()
        flip = (ref.argmax(-1) != got.argmax(-1)).mean()
        rel = jnp.abs(got - ref).mean() / (jnp.abs(ref).mean() + 1e-9)
        return kl, flip, rel

    rows = []
    for t in t_values:
        kl, flip, rel = compare(t5_params, qt5, params, jnp.float32(t))
        rows.append(
            {"t": float(t), "kl": float(kl), "flip": float(flip), "rel": float(rel)}
        )
    return rows
