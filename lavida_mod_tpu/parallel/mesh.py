"""Device mesh construction.

Replaces the reference's NCCL/DeepSpeed process topology (SURVEY.md §2.9):
one `jax.sharding.Mesh` with axes

  dp    pure data parallel (gradient all-reduce rides ICI)
  fsdp  parameter/optimizer sharding — the GSPMD equivalent of ZeRO-2/3
        (scripts/zero{2,3}.json): params sharded at rest, all-gathered
        per layer by XLA as the scan consumes them
  tp    megatron-style tensor parallel over attention heads / MLP hidden

Multi-host: `jax.distributed.initialize()` before building the mesh puts
DCN on the outermost (dp) axis automatically via mesh_utils.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


AXES = ("dp", "fsdp", "tp")


def maybe_init_distributed():
    """Multi-host bring-up: call before building a mesh when running on a
    multi-host slice.  jax.distributed picks coordinator/host-count from
    the TPU environment; safe no-op when single-host or already
    initialized.  Collectives then ride ICI within a slice and DCN across
    (the mesh's outer axes span hosts automatically via mesh_utils)."""
    try:
        if jax.process_count() > 1:
            return  # already initialized
    except Exception:
        pass
    try:
        jax.distributed.initialize()
    except Exception:
        pass  # single-host / no coordinator env: fine


def make_mesh(
    dp: int = 1,
    fsdp: Optional[int] = None,
    tp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (dp, fsdp, tp) mesh.  fsdp=None absorbs all remaining
    devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if fsdp is None:
        assert n % (dp * tp) == 0, (n, dp, tp)
        fsdp = n // (dp * tp)
    assert dp * fsdp * tp == n, (dp, fsdp, tp, n)
    try:
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_device_mesh((dp, fsdp, tp), devices=devices)
    except Exception:
        arr = np.asarray(devices).reshape(dp, fsdp, tp)
    return Mesh(arr, AXES)
