"""Weight-only int8 tests: the fused kernel's int8 path must match the float
path on DEQUANTIZED weights almost exactly (scale association is the only
difference), and the end-to-end quantized model must stay close to bf16."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paella_tpu.config import PaellaConfig
from paella_tpu.quant import (
    dequantize_dense_int8,
    quantize_dense_int8,
    quantize_paella_int8,
)


def test_quantize_roundtrip_error_bound():
    k = jax.random.normal(jax.random.PRNGKey(0), (64, 128)) * 0.1
    q, s = quantize_dense_int8(k)
    assert q.dtype == jnp.int8 and s.shape == (128,)
    deq = dequantize_dense_int8(q, s)
    # symmetric per-channel rounding: error <= scale/2 per element
    err = np.abs(np.asarray(deq - k))
    assert (err <= np.asarray(s)[None, :] / 2 + 1e-9).all()


def test_fused_kernel_int8_matches_dequantized_float():
    from paella_tpu.kernels.resblock import fused_resblock_stacked
    from tests.test_resblock_kernel import make_inputs

    x, dw_k, dw_b, w1, b1, gamma, beta, w2, b2, film = make_inputs(
        jax.random.PRNGKey(3), b=2, hw=8, c=128
    )
    r = 2
    stack = lambda a: jnp.stack([a, a * 0.5])
    w1s, w2s = stack(w1), stack(w2)
    q1, s1 = quantize_dense_int8(w1s)
    q2, s2 = quantize_dense_int8(w2s)

    for idx in range(r):
        want = fused_resblock_stacked(
            x, stack(dw_k), stack(dw_b), dequantize_dense_int8(q1, s1),
            stack(b1), stack(gamma), stack(beta), dequantize_dense_int8(q2, s2),
            stack(b2), idx, film_ab=stack(film),
            tile_n1=128, tile_n2=64, interpret=True,
        )
        got = fused_resblock_stacked(
            x, stack(dw_k), stack(dw_b), q1, stack(b1), stack(gamma),
            stack(beta), q2, stack(b2), idx, film_ab=stack(film),
            fc1_scale=s1, fc2_scale=s2,
            tile_n1=128, tile_n2=64, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_fused_kernel_w8a8_close_to_float():
    """True W8A8 (act_quant): s8 activations add ~1/254 per-row rounding on
    top of the weight quantization — outputs stay within a few percent of the
    float path on dequantized weights."""
    from paella_tpu.kernels.resblock import fused_resblock_stacked
    from tests.test_resblock_kernel import make_inputs

    x, dw_k, dw_b, w1, b1, gamma, beta, w2, b2, film = make_inputs(
        jax.random.PRNGKey(5), b=2, hw=8, c=128
    )
    stack = lambda a: jnp.stack([a, a * 0.5])
    w1s, w2s = stack(w1), stack(w2)
    q1, s1 = quantize_dense_int8(w1s)
    q2, s2 = quantize_dense_int8(w2s)
    beta_w2 = (
        jnp.einsum("rk,rkn->rn", stack(beta).astype(jnp.float32), q2.astype(jnp.float32))
        * s2
    )

    for idx in range(2):
        want = fused_resblock_stacked(
            x, stack(dw_k), stack(dw_b), dequantize_dense_int8(q1, s1),
            stack(b1), stack(gamma), stack(beta), dequantize_dense_int8(q2, s2),
            stack(b2), idx, film_ab=stack(film),
            tile_n1=128, tile_n2=64, interpret=True,
        )
        got = fused_resblock_stacked(
            x, stack(dw_k), stack(dw_b), q1, stack(b1), stack(gamma),
            stack(beta), q2, stack(b2), idx, film_ab=stack(film),
            fc1_scale=s1, fc2_scale=s2, act_quant=True, beta_w2=beta_w2,
            tile_n1=128, tile_n2=64, interpret=True,
        )
        w, g = np.asarray(want), np.asarray(got)
        rel = np.abs(g - w).mean() / (np.abs(w).mean() + 1e-9)
        assert rel < 0.02, rel

        # batch-grid mode must agree with full mode under act_quant too
        got_bg = fused_resblock_stacked(
            x, stack(dw_k), stack(dw_b), q1, stack(b1), stack(gamma),
            stack(beta), q2, stack(b2), idx, film_ab=stack(film),
            fc1_scale=s1, fc2_scale=s2, act_quant=True, beta_w2=beta_w2,
            tile_n1=128, tile_n2=64, batch_grid=True, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(got_bg), g, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_quantized_model_close_to_float():
    from jax.experimental.pallas import tpu as pltpu

    from paella_tpu.models import Paella, init_params
    from tests._utils import perturb

    base = dataclasses.replace(
        PaellaConfig.tiny(),
        c_hidden=(128, 128),
        nhead=(-1, 4),
        blocks=(2, 3),
        level_config=("CT", "CTA"),
        dropout=(0.0, 0.0),
        fused_blocks=True,
    )
    model = Paella(base)
    params = perturb(
        init_params(model, jax.random.PRNGKey(0), latent_hw=(16, 16)),
        jax.random.PRNGKey(9),
    )
    qparams = quantize_paella_int8(params, levels=(0, 1), include_first=True)

    x = jax.random.randint(jax.random.PRNGKey(1), (2, 16, 16), 0, base.num_labels)
    r = jnp.array([0.3, 0.8])
    byt5 = jax.random.normal(jax.random.PRNGKey(2), (2, 5, base.byt5_embd))
    clip = jax.random.normal(jax.random.PRNGKey(3), (2, base.clip_embd))
    with pltpu.force_tpu_interpret_mode():
        want = model.apply({"params": params}, x, r, byt5, clip)
        got = model.apply({"params": qparams}, x, r, byt5, clip)
        model_aq = Paella(dataclasses.replace(base, act_quant=True))
        got_aq = model_aq.apply({"params": qparams}, x, r, byt5, clip)
    w, g = np.asarray(want), np.asarray(got)
    # per-channel weight-only int8: logits stay close, rankings barely move
    rel = np.abs(g - w).mean() / (np.abs(w).mean() + 1e-9)
    assert rel < 0.05, rel
    agree = (g.argmax(-1) == w.argmax(-1)).mean()
    assert agree > 0.98, agree
    # true W8A8 adds per-row activation rounding (two quant steps on h):
    # still close to float, rankings mostly stable
    ga = np.asarray(got_aq)
    rel_aq = np.abs(ga - w).mean() / (np.abs(w).mean() + 1e-9)
    assert rel_aq < 0.10, rel_aq
    agree_aq = (ga.argmax(-1) == w.argmax(-1)).mean()
    assert agree_aq > 0.9, agree_aq


def test_int8_requires_fused_path():
    import pytest

    from paella_tpu.models import Paella, init_params

    base = dataclasses.replace(
        PaellaConfig.tiny(),
        c_hidden=(128, 128),
        nhead=(-1, 4),
        blocks=(2, 3),
        level_config=("CT", "CTA"),
        dropout=(0.0, 0.0),
        fused_blocks=False,  # int8 codes would hit the raw XLA Dense path
    )
    model = Paella(base)
    params = init_params(model, jax.random.PRNGKey(0), latent_hw=(16, 16))
    qparams = quantize_paella_int8(params, levels=(0, 1))
    x = jnp.zeros((1, 16, 16), jnp.int32)
    with pytest.raises(ValueError, match="int8"):
        model.apply(
            {"params": qparams}, x, jnp.ones((1,)),
            jnp.zeros((1, 4, base.byt5_embd)), jnp.zeros((1, base.clip_embd)),
        )


@pytest.mark.slow
def test_w8a8_quality_proxy():
    """The in-repo W8A8 go/no-go proxy (examples/eval_quality.py --w8a8-proxy)
    must produce finite per-t KL/flip rows and a verdict; on a near-identity
    quantization the gate passes, and the verdict flips on bad rows."""
    from paella_tpu.models import Paella, init_params
    from paella_tpu.quant import (
        fuse_eligible_levels,
        w8a8_proxy_verdict,
        w8a8_quality_proxy,
    )
    from tests._utils import perturb

    base = dataclasses.replace(
        PaellaConfig.tiny(),
        c_hidden=(128, 128),
        nhead=(-1, 4),
        blocks=(2, 3),
        level_config=("CT", "CTA"),
        dropout=(0.0, 0.0),
    )
    assert fuse_eligible_levels(base) == (0, 1)
    model = Paella(dataclasses.replace(base, fused_blocks=True))
    params = perturb(
        init_params(model, jax.random.PRNGKey(0), latent_hw=(16, 16)),
        jax.random.PRNGKey(9),
    )
    rows = w8a8_quality_proxy(
        base, params, jax.random.PRNGKey(1), t_values=(0.8, 0.3), latent_hw=(16, 16)
    )
    assert [r["t"] for r in rows] == [0.8, 0.3]
    for r in rows:
        assert np.isfinite(r["kl"]) and r["kl"] >= 0
        assert 0 <= r["flip"] <= 1
    ok, msg = w8a8_proxy_verdict(rows)
    assert ("PASS" in msg) == ok
    bad_ok, bad_msg = w8a8_proxy_verdict([{"t": 0.5, "kl": 1.0, "flip": 0.5}])
    assert not bad_ok and "FAIL" in bad_msg


def test_t5_int8_weight_only_close_to_float():
    """quantize_t5_int8 trees run through the SAME T5Encoder module (param
    paths unchanged, 'kernel_scale' siblings picked up by _T5Dense) and stay
    within per-channel-rounding distance of the float forward."""
    from paella_tpu.cond import T5Config, T5Encoder
    from paella_tpu.quant import quantize_t5_int8

    cfg = T5Config.tiny()
    enc = T5Encoder(cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 7), 0, cfg.vocab_size)
    mask = jnp.array([[1, 1, 1, 1, 1, 0, 0], [1, 1, 1, 0, 0, 0, 0]], bool)
    params = enc.init(jax.random.PRNGKey(0), ids, mask)["params"]

    ref = enc.apply({"params": params}, ids, mask)
    qparams = quantize_t5_int8(params)
    # only block linears quantized; embedding/norms/relative bias untouched
    assert qparams["block_0"]["attention"]["q"]["kernel"].dtype == jnp.int8
    assert qparams["block_0"]["attention"]["q"]["kernel_scale"].shape == (
        cfg.num_heads * cfg.d_kv,
    )
    assert qparams["block_1"]["wi_0"]["kernel"].dtype == jnp.int8
    assert qparams["token_embedding"].dtype == params["token_embedding"].dtype
    assert "kernel_scale" not in jax.tree_util.tree_leaves(qparams["block_0"]["attn_norm"])

    got = enc.apply({"params": qparams}, ids, mask)
    assert got.shape == ref.shape
    rel = np.abs(np.asarray(got - ref)).mean() / np.abs(np.asarray(ref)).mean()
    assert rel < 0.05, rel
    # cosine similarity per token stays high
    a = np.asarray(ref, np.float64).reshape(-1, cfg.d_model)
    b = np.asarray(got, np.float64).reshape(-1, cfg.d_model)
    cos = (a * b).sum(-1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))
    assert cos.min() > 0.995, cos.min()


def test_t5_w8a8_close_to_float():
    """T5Config.act_quant=True on a quantize_t5_int8 tree runs the true W8A8
    path (quant.w8a8_dot: per-row s8 activations x per-channel s8 weights,
    s32 accumulate) and stays within dynamic-quantization distance of the
    float forward. With a FLOAT param tree the flag is inert (no
    kernel_scale sibling -> plain dense path), so init/tests of the flagged
    config are bit-identical to the unflagged one."""
    from paella_tpu.cond import T5Config, T5Encoder
    from paella_tpu.quant import quantize_t5_int8

    cfg = T5Config.tiny()
    enc = T5Encoder(cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 7), 0, cfg.vocab_size)
    mask = jnp.array([[1, 1, 1, 1, 1, 0, 0], [1, 1, 1, 0, 0, 0, 0]], bool)
    params = enc.init(jax.random.PRNGKey(0), ids, mask)["params"]
    ref = enc.apply({"params": params}, ids, mask)

    enc_aq = T5Encoder(dataclasses.replace(cfg, act_quant=True))
    # inert on float trees: exact same computation
    same = enc_aq.apply({"params": params}, ids, mask)
    np.testing.assert_array_equal(np.asarray(same), np.asarray(ref))

    qparams = quantize_t5_int8(params)
    got = jax.jit(lambda p: enc_aq.apply({"params": p}, ids, mask))(qparams)
    assert got.shape == ref.shape and np.isfinite(np.asarray(got)).all()
    rel = np.abs(np.asarray(got - ref)).mean() / np.abs(np.asarray(ref)).mean()
    assert rel < 0.08, rel
    a = np.asarray(ref, np.float64).reshape(-1, cfg.d_model)
    b = np.asarray(got, np.float64).reshape(-1, cfg.d_model)
    cos = (a * b).sum(-1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))
    assert cos.min() > 0.99, cos.min()


@pytest.mark.slow
def test_t5_w8a8_downstream_proxy():
    """t5_w8a8_quality_proxy: the ByT5 act_quant go/no-go rows are finite and
    sane, the verdict applies the documented thresholds, and mismatched
    byt5_embd fails loudly."""
    import pytest

    from paella_tpu.cond import T5Config, T5Encoder
    from paella_tpu.models import Paella, init_params
    from paella_tpu.quant import t5_w8a8_quality_proxy, w8a8_proxy_verdict

    t5_cfg = T5Config.tiny()
    cfg = dataclasses.replace(PaellaConfig.tiny(), byt5_embd=t5_cfg.d_model)
    params = init_params(Paella(cfg), jax.random.PRNGKey(0), latent_hw=(8, 8))
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef,
        [l + 0.02 * jax.random.normal(k, l.shape, l.dtype) for l, k in zip(leaves, keys)],
    )
    t5 = T5Encoder(t5_cfg)
    ids = jnp.zeros((1, 5), jnp.int32)
    t5_params = t5.init(jax.random.PRNGKey(2), ids, jnp.ones((1, 5), bool))["params"]

    rows = t5_w8a8_quality_proxy(
        t5_cfg, t5_params, cfg, params, jax.random.PRNGKey(3),
        t_values=(0.9, 0.3), latent_hw=(8, 8),
    )
    assert len(rows) == 2
    for r in rows:
        assert np.isfinite(r["kl"]) and r["kl"] >= 0
        assert 0 <= r["flip"] <= 1 and np.isfinite(r["rel"])
    ok, msg = w8a8_proxy_verdict(rows)
    assert ("PASS" in msg) == ok

    with pytest.raises(ValueError, match="byt5_embd"):
        t5_w8a8_quality_proxy(
            T5Config.tiny(), t5_params,
            dataclasses.replace(cfg, byt5_embd=t5_cfg.d_model + 1), params,
            jax.random.PRNGKey(3),
        )

    # the stress arm (eval_quality --stress): inject_weight_outliers composes
    # with a REAL T5 tree — the frozen encoder's rehearsable adversarial bound
    # (pretrained HF weights have outlier channels synthetic init lacks)
    from paella_tpu.quant import inject_weight_outliers

    stressed = inject_weight_outliers(t5_params, jax.random.PRNGKey(4), frac=0.5)
    assert jax.tree_util.tree_structure(stressed) == jax.tree_util.tree_structure(
        t5_params
    )
    srows = t5_w8a8_quality_proxy(
        t5_cfg, stressed, cfg, params, jax.random.PRNGKey(3),
        t_values=(0.9,), latent_hw=(8, 8),
    )
    assert np.isfinite(srows[0]["kl"]) and np.isfinite(srows[0]["rel"])


def test_inject_weight_outliers():
    """Outlier stress perturbs only >=2-D float 'kernel' leaves, scaling a
    subset of reduction-axis channels by exactly `scale`."""
    from paella_tpu.quant import inject_weight_outliers

    params = {
        "dense": {"kernel": jnp.ones((64, 8)), "bias": jnp.zeros((8,))},
        "conv": {"kernel": jnp.ones((3, 3, 32, 8))},
        "norm": {"scale": jnp.ones((8,))},
        "codes": {"kernel": jnp.zeros((16,), jnp.int32)},  # non-float / 1-D
    }
    out = inject_weight_outliers(params, jax.random.PRNGKey(0), frac=0.25, scale=7.0)
    assert jax.tree_util.tree_structure(out) == jax.tree_util.tree_structure(params)
    np.testing.assert_array_equal(out["dense"]["bias"], params["dense"]["bias"])
    np.testing.assert_array_equal(out["norm"]["scale"], params["norm"]["scale"])
    np.testing.assert_array_equal(out["codes"]["kernel"], params["codes"]["kernel"])
    d = np.asarray(out["dense"]["kernel"])
    rows = d.mean(axis=1)  # per reduction-axis channel
    assert set(np.unique(np.round(rows, 4))) <= {1.0, 7.0}
    assert (rows == 7.0).any() and (rows == 1.0).any()
    c = np.asarray(out["conv"]["kernel"])  # axis -2 = input channels
    ch = c.mean(axis=(0, 1, 3))
    assert set(np.unique(np.round(ch, 4))) <= {1.0, 7.0} and (ch == 7.0).any()
