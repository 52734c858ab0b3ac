"""CI rehearsal of scripts/run_codec_pretrain.py — the codec-pretraining
protocol (tar shards -> VQGAN recon+VQ+GAN step -> recon collages ->
codec_vars.npz) at tiny geometry on CPU, through the script's own CLI. The
real-run artifact lives in runs/codec_pretrain/."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

SCRIPT = os.path.join(os.path.dirname(__file__), "..", "scripts", "run_codec_pretrain.py")


@pytest.mark.slow
def test_codec_pretrain_smoke(tmp_path):
    workdir = tmp_path / "run"
    r = subprocess.run(
        [sys.executable, SCRIPT, "--smoke", "--workdir", str(workdir)],
        capture_output=True, text=True, timeout=900,
        env=dict(os.environ, JAX_PLATFORMS="cpu",
                 XLA_FLAGS="--xla_force_host_platform_device_count=1"),
    )
    assert r.returncode == 0, r.stdout + r.stderr

    out = json.loads(open(workdir / "summary.json").read())
    assert out["steps"] == 30
    # training must move the fixed eval batch's reconstruction
    assert np.isfinite(out["final_eval_recon_l1"])
    assert out["final_eval_recon_l1"] < out["init_eval_recon_l1"]
    assert 0.0 < out["final_codebook_usage"] <= 1.0
    assert os.path.exists(workdir / "codec_vars.npz")
    assert os.path.exists(workdir / "metrics.jsonl")

    # the saved vars round-trip into a working codec (the --codec consumers'
    # exact load path) and reproduce the final eval recon
    import jax.numpy as jnp

    from paella_tpu.codec import VQModel
    from paella_tpu.config import VQConfig
    from paella_tpu.train.checkpoints import load_params_npz

    gen_vars = load_params_npz(str(workdir / "codec_vars.npz"))
    vq = VQModel(VQConfig.tiny())
    x = jnp.zeros((1, 64, 64, 3))
    qe, _z, idx, _l = vq.apply(gen_vars, x, method=VQModel.encode)
    recon = vq.apply(gen_vars, qe, method=VQModel.decode)
    assert recon.shape == (1, 64, 64, 3)
    assert bool(jnp.isfinite(recon).all())
