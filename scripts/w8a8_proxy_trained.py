"""W8A8 quality proxy on TRAINED weights (round-3 VERDICT item 2).

The synthetic-weight proxy gate (examples/eval_quality.py --w8a8-proxy) is
systematically optimistic: trained networks develop outlier channels random
init lacks. This script re-runs quant.w8a8_quality_proxy on the weights the
production-driver run actually trained (scripts/run_driver_e2e.py's Orbax
checkpoint), side by side with

  - random-init weights at the SAME geometry (the old gate's evidence), and
  - outlier-injected variants of both (quant.inject_weight_outliers: 2% of
    reduction-axis channels scaled 12x — the LLM.int8() failure mode), the
    adversarial bound for weights this run can't reach.

    python scripts/w8a8_proxy_trained.py --workdir runs/driver_e2e

Writes the four proxy tables + verdicts to <workdir>/w8a8_proxy_trained.json
and prints them. Runs on the TPU (real Mosaic kernels) when available.
"""
from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import dataclasses
import json
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="runs/driver_e2e")
    ap.add_argument("--batch", type=int, default=16,
                    help="training batch of the checkpointed run (state template)")
    ap.add_argument("--latent", type=int, default=64)
    ap.add_argument("--no-stress", action="store_true",
                    help="skip the outlier-injected variants")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from paella_tpu.config import PaellaConfig, TrainConfig
    from paella_tpu.models import Paella, init_params
    from paella_tpu.quant import (
        inject_weight_outliers,
        w8a8_proxy_verdict,
        w8a8_quality_proxy,
    )
    from paella_tpu.train import create_train_state
    from paella_tpu.train.checkpoints import CheckpointManager

    # the run_driver_e2e "small" geometry (fuse-eligible at levels 1,2 — the
    # same levels W8A8 quantizes at the 1B flagship)
    cfg = dataclasses.replace(
        PaellaConfig.v1_byt5_xl(),
        c_hidden=(320, 640, 640),
        nhead=(-1, 8, 8),
        blocks=(4, 12, 4),
        dtype="bfloat16",
    )
    model = Paella(cfg)
    hw = (args.latent, args.latent)
    init = init_params(model, jax.random.PRNGKey(0), latent_hw=hw)

    template = create_train_state(init, TrainConfig(warmup_updates=100, batch_size=args.batch))
    ckpt = CheckpointManager(os.path.join(args.workdir, "checkpoints"))
    restored, _ = ckpt.restore(template)
    if restored is None:
        raise SystemExit(f"no checkpoint under {args.workdir}/checkpoints — "
                         "run scripts/run_driver_e2e.py first")
    step = int(restored.step)
    trained = restored.params
    print(f"[proxy] restored step-{step} params from {args.workdir}", flush=True)

    # random-init comparison arm: perturb so the zero-init head/FiLM leaves
    # don't make the logit comparison vacuous (tests/_utils.py convention)
    leaves, treedef = jax.tree_util.tree_flatten(init)
    keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    synthetic = jax.tree_util.tree_unflatten(
        treedef,
        [l + 0.02 * jax.random.normal(k, l.shape, l.dtype) for l, k in zip(leaves, keys)],
    )

    arms = {f"trained_step{step}": trained, "random_init": synthetic}
    if not args.no_stress:
        arms[f"trained_step{step}_outliers"] = inject_weight_outliers(
            trained, jax.random.PRNGKey(2)
        )
        arms["random_init_outliers"] = inject_weight_outliers(
            synthetic, jax.random.PRNGKey(2)
        )

    results = {}
    for name, params in arms.items():
        rows = w8a8_quality_proxy(cfg, params, jax.random.PRNGKey(3), latent_hw=hw)
        ok, msg = w8a8_proxy_verdict(rows)
        results[name] = {"rows": rows, "pass": bool(ok), "verdict": msg}
        print(f"\n== {name} ==")
        print(f"{'t':>5}  {'KL nats/tok':>12}  {'argmax flip':>12}  {'rel |dlogit|':>12}")
        for r in rows:
            print(f"{r['t']:5.2f}  {r['kl']:12.5f}  {r['flip']:12.3%}  {r['rel']:12.4f}")
        print(msg, flush=True)

    out = os.path.join(args.workdir, "w8a8_proxy_trained.json")
    with open(out, "w") as fh:
        json.dump({"geometry": "small-280M", "latent": args.latent, "arms": results}, fh, indent=1)
    print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
