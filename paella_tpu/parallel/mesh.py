"""Device mesh and sharding utilities.

TPU-native replacement for the reference's distributed runtime: the whole
ddp_setup + mp.spawn + SLURM rank arithmetic stack
(reference: src_distributed/utils.py:85-94, src_distributed/train.py:186-189,
src_distributed/run/run.sh) collapses into a `jax.sharding.Mesh` plus sharding
annotations — XLA inserts the gradient reductions (psum over ICI, DCN across
slices) that DDP's NCCL allreduce performed explicitly.

Axes:
  dp   — pure data parallelism (batch split; params replicated)
  fsdp — data parallelism with parameter sharding (batch split; each param's
         largest divisible axis sharded, gathered on use) — a strict upgrade the
         reference lacks (SURVEY.md §2: reference has DDP only)
  tp   — tensor parallelism over attention heads / MLP hidden (activations carry
         sharding constraints; params shard their channel axes)
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXES = ("dp", "fsdp")


def make_mesh(
    dp: Optional[int] = None,
    fsdp: int = 1,
    tp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (dp, fsdp, tp) mesh over all devices. dp=None takes the remainder."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        dp = n // (fsdp * tp)
    if dp * fsdp * tp != n:
        raise ValueError(f"mesh {dp}x{fsdp}x{tp} != {n} devices")
    arr = np.array(devices).reshape(dp, fsdp, tp)
    return Mesh(arr, ("dp", "fsdp", "tp"))


def batch_spec() -> P:
    """Batch is split over both data axes; tp replicates the batch."""
    return P(BATCH_AXES)


def active_mesh() -> Optional[Mesh]:
    """The mesh installed by an enclosing `with mesh:` block, or None."""
    from jax._src import mesh as mesh_lib

    m = mesh_lib.thread_resources.env.physical_mesh
    return None if m.empty else m


def constrain(x, spec: P):
    """with_sharding_constraint(x, spec) if a mesh carrying the spec's axes is
    active; identity otherwise (single-chip inference traces unchanged)."""
    m = active_mesh()
    if m is None:
        return x
    names = set()
    for s in spec:
        if s is not None:
            names.update(s if isinstance(s, tuple) else (s,))
    if not names.issubset(set(m.axis_names)):
        return x
    return jax.lax.with_sharding_constraint(x, spec)


def constrain_batch(x):
    """Pin an activation to batch-only sharding (channels replicated). Used
    around ops GSPMD mis-propagates through — notably the grouped depthwise
    conv's strided channel slicing, which otherwise triggers 'involuntary full
    rematerialization' under fsdp."""
    return constrain(x, P(BATCH_AXES, *([None] * (x.ndim - 1))))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, batch_spec())


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def fsdp_param_spec(path: tuple, param, fsdp_size: int, min_size: int = 2**14) -> P:
    """FSDP rule: shard the largest axis divisible by the fsdp axis size.

    Small params (biases, norms, gammas) are replicated — gathering them costs
    more than storing them. Ties prefer the trailing (output/feature) axis, which
    keeps the matmul-heavy kernels sharded along lanes XLA handles well.
    """
    shape = getattr(param, "shape", ())
    if not shape or param.size < min_size or fsdp_size <= 1:
        return P()
    candidates = [d for d in range(len(shape)) if shape[d] % fsdp_size == 0 and shape[d] > 1]
    if not candidates:
        return P()
    best = max(candidates, key=lambda d: (shape[d], d))
    spec = [None] * len(shape)
    spec[best] = "fsdp"
    return P(*spec)


def _path_str(path) -> str:
    return "/".join(
        str(getattr(p, "key", getattr(p, "idx", p))) for p in path
    )


# Tensor-parallel rules for the denoiser: shard each matmul's PARALLEL dimension
# over 'tp' (Megatron-style column/row split expressed as GSPMD annotations; XLA
# inserts the all-reduces). Keyed by path suffixes. Kernel layouts are (in, out)
# for Dense (a leading stacked axis appears inside nn.scan groups).
# "mapper/kernel" covers kv_mapper, byt5/clip/clip_image mappers and the
# TimestepBlock mapper (all column-splittable output projections).
_TP_COL = (
    "attention/q/kernel",
    "attention/k/kernel",
    "attention/v/kernel",
    "fc1/kernel",
    "mapper/kernel",
    "embedding_conv/kernel",
    "clf_conv/kernel",
    "out_proj/kernel",
)
_TP_ROW = ("attention/o/kernel", "fc2/kernel")


def tp_param_spec(path_str: str, param, tp_size: int) -> Optional[P]:
    """PartitionSpec for tensor parallelism, or None if no rule applies."""
    if tp_size <= 1:
        return None
    shape = getattr(param, "shape", ())
    if len(shape) < 2:
        return None

    def spec_on(dim_from_end: int) -> Optional[P]:
        d = len(shape) - 1 - dim_from_end
        if shape[d] % tp_size:
            return None
        spec = [None] * len(shape)
        spec[d] = "tp"
        return P(*spec)

    if any(path_str.endswith(s) for s in _TP_COL):
        return spec_on(0)  # split output features (column parallel)
    if any(path_str.endswith(s) for s in _TP_ROW):
        return spec_on(1)  # split input features (row parallel)
    return None


def param_shardings(params, mesh: Mesh, min_size: int = 2**14):
    """Pytree of NamedShardings: tp rules first (attention/MLP kernels), then the
    FSDP largest-divisible-axis rule over the remainder."""
    fsdp_size = mesh.shape.get("fsdp", 1)
    tp_size = mesh.shape.get("tp", 1)

    def to_sharding(path, p):
        ps = _path_str(path)
        tp = tp_param_spec(ps, p, tp_size)
        if tp is not None:
            return NamedSharding(mesh, tp)
        if ps.endswith("depthwise/kernel"):
            # depthwise kernels are KBs; sharding their channel axis forces
            # channel shardings into the grouped conv, which GSPMD can only
            # resolve by full rematerialization. Replicate instead.
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, fsdp_param_spec(path, p, fsdp_size, min_size))

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def shard_params(params, mesh: Mesh, min_size: int = 2**14):
    """Place an existing (host/replicated) param pytree onto the mesh with
    tp + FSDP sharding."""
    shardings = param_shardings(params, mesh, min_size)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
