"""CI rehearsal of scripts/run_eval_e2e.py — the checkpoint-day quality-eval
protocol (sample -> VQGAN decode -> classic InceptionV3 pool3 -> host-f64
Frechet) at tiny geometry on CPU, through the script's own CLI. The real-run
artifact lives in runs/driver_e2e/eval_fid.json."""
import json
import os
import subprocess
import sys

import pytest

SCRIPT = os.path.join(os.path.dirname(__file__), "..", "scripts", "run_eval_e2e.py")


@pytest.mark.slow
def test_eval_e2e_smoke(tmp_path):
    workdir = tmp_path / "run"
    r = subprocess.run(
        [sys.executable, SCRIPT, "--smoke", "--workdir", str(workdir)],
        capture_output=True, text=True, timeout=900,
        env=dict(os.environ, JAX_PLATFORMS="cpu"),
    )
    assert r.returncode == 0, r.stdout + r.stderr

    out = json.loads(open(workdir / "eval_fid.json").read())
    # both Frechet numbers finite and non-negative; the real-vs-real split is
    # the small-N noise floor and must come in below gen-vs-real (synthetic
    # denoiser output is far from the shard distribution)
    assert out["fid_synthetic_featurizer"] >= 0
    assert 0 <= out["fid_noise_floor_real_vs_real"] < out["fid_synthetic_featurizer"]
    assert out["n_per_set"] == 8 and out["sampling_images_per_sec"] > 0


@pytest.mark.slow
def test_eval_e2e_trend_smoke(tmp_path):
    workdir = tmp_path / "run"
    r = subprocess.run(
        [sys.executable, SCRIPT, "--smoke", "--trend", "--real-recon",
         "--workdir", str(workdir)],
        capture_output=True, text=True, timeout=900,
        env=dict(os.environ, JAX_PLATFORMS="cpu"),
    )
    assert r.returncode == 0, r.stdout + r.stderr

    out = json.loads(open(workdir / "eval_fid_trend.json").read())
    # two arms (init + perturbed-init), each scored against the SAME real set
    # and featurizer; every Frechet number finite and above the shared floor
    assert [a["arm"] for a in out["arms"]] == ["init", "perturbed-init"]
    for a in out["arms"]:
        assert a["fid_synthetic_featurizer"] >= 0
        assert a["sampling_images_per_sec"] > 0
    assert 0 <= out["fid_noise_floor_real_vs_real"]
    assert isinstance(out["monotone_improving"], bool)
    assert out["real_set"] == "codec-recon"


@pytest.mark.slow
def test_eval_e2e_token_space_smoke(tmp_path):
    workdir = tmp_path / "run"
    r = subprocess.run(
        [sys.executable, SCRIPT, "--smoke", "--trend", "--space", "tokens",
         "--w8a8", "--workdir", str(workdir)],
        capture_output=True, text=True, timeout=900,
        env=dict(os.environ, JAX_PLATFORMS="cpu"),
    )
    assert r.returncode == 0, r.stdout + r.stderr

    out = json.loads(open(workdir / "eval_token_trend_w8a8.json").read())
    assert [a["arm"] for a in out["arms"]] == [
        "init", "init-w8a8", "perturbed-init", "perturbed-init-w8a8"]
    for a in out["arms"]:
        # JS divergence is bounded by ln 2; untrained arms must sit clearly
        # above the real-vs-real noise floors (measured ~30x at this geometry)
        assert 0 <= a["token_js_to_real"] <= 0.6932
        assert a["token_frechet"] > out["token_frechet_floor_real_vs_real"]
        assert a["token_js_to_real"] > out["token_js_floor_real_vs_real"]
    # tiny() channels miss the fused kernel's 128-alignment, so NOTHING is
    # eligible to quantize (out["w8a8"]["levels"] == []): the twin samples the
    # identical program with the same seeds — its token marginal must match
    # the bf16 twin's exactly. On the real geometry levels=(1,2) quantize and
    # this field measures true W8A8 drift through the full sampling loop.
    assert out["w8a8"]["levels"] == []
    # root-cause guard for the exact-equality assertion below: with no
    # eligible level, quantize_paella_int8 must be an identity — if this
    # fails, the JS==0.0 check below would fail confusingly downstream
    import jax
    import jax.numpy as jnp
    from paella_tpu.config import PaellaConfig
    from paella_tpu.models import Paella, init_params
    from paella_tpu.quant import fuse_eligible_levels, quantize_paella_int8

    tiny = PaellaConfig.tiny()
    assert fuse_eligible_levels(tiny) == ()
    p = init_params(Paella(tiny), jax.random.PRNGKey(0), latent_hw=(8, 8))
    q = quantize_paella_int8(p, levels=(), include_first=True)
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: bool(jnp.array_equal(a, b)), p, q)
    )
    for a in out["arms"]:
        if a["arm"].endswith("-w8a8"):
            # exact float equality is intentional: the quantized twin must
            # trace to a bit-identical program when nothing is quantized
            # (guarded by the identity check above — a failure HERE means
            # act_quant/fused_blocks changed the traced graph itself)
            assert a["token_js_to_bf16_twin"] == 0.0
            # same reasoning: identical program + same seeds => zero raw
            # per-position disagreement (on real geometry this field carries
            # the full-loop W8A8 flip rate)
            assert a["token_flip_to_bf16_twin"] == 0.0
