"""Orbax checkpointing: save/restore the full train state.

Replaces the reference's single-`.pt` scheme (reference: src_distributed/train.py:131-138
saves {iter, state_dict, optimizer_state_dict, scheduler_last_step,
grad_scaler_state_dict}, rank-0 only, every 2000 updates; resume at :60-67).
Orbax equivalents: the whole TrainState pytree (params + optimizer state + step)
plus the data-RNG key is one checkpoint; scheduler state lives inside the optax
schedule (a function of step) and the AMP scaler does not exist under bf16.
Multi-host saves are handled by orbax natively (no rank-0 gating needed).
"""
from __future__ import annotations

import os
from typing import Any, Optional


import numpy as np


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


class CheckpointManager:
    """Thin wrapper over orbax CheckpointManager: keeps the last `max_to_keep`
    steps, saves every `save_interval` steps (reference cadence: 2000)."""

    def __init__(self, directory: str, max_to_keep: int = 3, save_interval: int = 2000):
        ocp = _ocp()
        self.directory = os.path.abspath(directory)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, save_interval_steps=save_interval
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any, extra: Optional[dict] = None, force: bool = False) -> bool:
        ocp = _ocp()
        items = {"state": ocp.args.StandardSave(state)}
        if extra:
            items["extra"] = ocp.args.JsonSave(extra)
        return self._mgr.save(step, args=ocp.args.Composite(**items), force=force)

    def restore(self, state_template: Any, step: Optional[int] = None):
        """Restore into the structure of `state_template`. Returns (state, extra)."""
        ocp = _ocp()
        step = self.latest_step() if step is None else step
        if step is None:
            return None, None
        restored = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(state_template),
            ),
        )
        extra = None
        try:
            extra_restored = self._mgr.restore(
                step, args=ocp.args.Composite(extra=ocp.args.JsonRestore())
            )
            extra = extra_restored.get("extra")
        except Exception:
            pass
        return restored["state"], extra

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self) -> list:
        return sorted(self._mgr.all_steps())

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


def save_params_npz(path: str, params: Any) -> None:
    """Dependency-free flat .npz export of a param pytree (handy for conversion
    round-trips and tests)."""
    import flax

    flat = flax.traverse_util.flatten_dict(params, sep="/")
    np.savez(path, **{k: np.asarray(v) for k, v in flat.items()})


def load_params_npz(path: str) -> Any:
    import flax

    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    return flax.traverse_util.unflatten_dict(flat, sep="/")
