"""Device mesh construction.

TPU-native replacement for the reference's DeepSpeed/NCCL process topology
(reference scripts/mad/stage1_dense.sh:34-35 `deepspeed ... --zero3`): one
SPMD program over a named `jax.sharding.Mesh` with axes

  data   — batch (pure data parallel)
  fsdp   — parameter/grad/optimizer sharding (ZeRO-3 equivalent); batch is
           also split over this axis, so (data x fsdp) devices consume data
  tensor — megatron-style tensor parallel within attention/MLP matrices

Collectives (all-gather of FSDP shards around each layer, psum of grads) are
emitted by GSPMD from the sharding annotations — no hand-written NCCL calls.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("data", "fsdp", "tensor")

# Batch axes: data-parallel over both the pure-DP axis and the FSDP axis
# (ZeRO shards params over data-parallel workers, it does not change the
# batch math).
BATCH_AXES = ("data", "fsdp")


def create_mesh(
    dp: int = 1,
    fsdp: int = 1,
    tp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = dp * fsdp * tp
    if n > len(devices):
        raise ValueError(f"mesh {dp}x{fsdp}x{tp} needs {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(dp, fsdp, tp)
    return Mesh(arr, AXES)


def single_device_mesh() -> Mesh:
    return create_mesh(1, 1, 1)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(BATCH_AXES))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
