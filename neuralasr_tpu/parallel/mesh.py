"""Device mesh + sharding helpers (SURVEY.md §3 parallelism inventory).

Mesh axes:
  'data'  — DP over utterance batches (always; axis size = n_devices /
            model_axis).
  'model' — TP over encoder weight matrices; >1 only when the encoder
            exceeds one chip's HBM (BASELINE.json: "sharded across chips
            only when it exceeds one chip's HBM").

Param sharding comes from flax logical axis annotations
(nn.with_logical_partitioning in the models) resolved through
LOGICAL_RULES; activations shard batch-first via data_sharding.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
import flax.linen as nn

# Logical axis -> mesh axis. 'gates'/'ff'/'heads' are weight output dims that
# shard over 'model'; everything else replicates.
LOGICAL_RULES = (
    ("batch", "data"),
    ("direction", None),  # fused-BiLSTM stacked fwd/bwd leading axis
    ("embed", None),
    ("hidden", None),
    ("gates", "model"),
    ("ff", "model"),
    ("heads", "model"),
    ("kv", None),
    ("vocab", None),
)


def make_mesh(
    n_devices: int | None = None, model_axis: int = 1, devices=None
) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_axis != 0:
        raise ValueError(f"{n} devices not divisible by model_axis={model_axis}")
    arr = np.asarray(devices).reshape(n // model_axis, model_axis)
    return Mesh(arr, axis_names=("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-major arrays: shard dim 0 over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params_by_rules(mesh: Mesh, params):
    """Resolve flax logical annotations -> NamedShardings for the pytree."""
    logical = nn.get_partition_spec(params)
    phys = nn.logical_to_mesh_sharding(logical, mesh, LOGICAL_RULES)
    return phys
