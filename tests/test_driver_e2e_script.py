"""CI rehearsal of scripts/run_driver_e2e.py — the production-driver protocol
(tar shards -> frozen encoders -> train step -> checkpoint -> eval collage ->
preemption resume) at tiny geometry on CPU, through the script's own CLI."""
import json
import os
import signal
import subprocess
import sys
import time

import pytest

SCRIPT = os.path.join(os.path.dirname(__file__), "..", "scripts", "run_driver_e2e.py")


def _run(workdir, steps, extra=(), preempt_after_step=None):
    cmd = [
        sys.executable, SCRIPT, "--smoke", "--workdir", str(workdir),
        "--steps", str(steps), "--log-every", "2", "--eval-every", "20",
        "--shards", "1", "--workers", "1", *extra,
    ]
    # pin the subprocess to ONE device: it inherits the suite's 8-virtual-
    # device XLA_FLAGS otherwise, and the script's default mesh then demands
    # batch % 8 == 0 while smoke batch is 4 (latent since the conftest flag;
    # masked because slow tests are routinely deselected)
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=1",
    )
    if preempt_after_step is None:
        return subprocess.run(cmd, capture_output=True, text=True, timeout=900, env=env)
    proc = subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env
    )
    metrics = os.path.join(workdir, "metrics.jsonl")
    deadline = time.time() + 600
    # wait until the loop has logged past the target step (one eval collage
    # has been written by then), then preempt
    while time.time() < deadline:
        if os.path.exists(metrics):
            rows = [json.loads(l) for l in open(metrics) if l.strip()]
            if rows and rows[-1]["step"] >= preempt_after_step:
                break
        time.sleep(1.0)
    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=300)
    return subprocess.CompletedProcess(cmd, proc.returncode, stdout=out, stderr="")


@pytest.mark.slow
def test_driver_e2e_smoke_preempt_resume(tmp_path):
    workdir = tmp_path / "run"

    # phase A: run with a mid-run SIGTERM -> graceful preemption checkpoint
    r = _run(workdir, steps=200, preempt_after_step=22)
    assert r.returncode == 0, r.stdout
    assert "preemption checkpoint saved" in r.stdout, r.stdout
    ckpts = os.listdir(workdir / "checkpoints")
    assert ckpts, r.stdout

    # phase B: same command resumes from the preemption checkpoint to the end
    r2 = _run(workdir, steps=30)
    assert r2.returncode == 0, r2.stdout + r2.stderr
    assert "resumed at step" in r2.stdout, r2.stdout
    summary = json.loads(open(workdir / "summary.json").read())
    assert summary["final_step"] >= 30

    # metrics.jsonl accumulated across both phases; eval collage written
    rows = [json.loads(l) for l in open(workdir / "metrics.jsonl")]
    assert any(row.get("images_per_sec") for row in rows)
    assert any(n.startswith("eval_") for n in os.listdir(workdir)), os.listdir(workdir)
