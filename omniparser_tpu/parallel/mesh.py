"""Mesh + sharding helpers (TPU ICI-aware).

Axes convention:
  'dp'  — data parallel (screenshots / crop batches)
  'tp'  — tensor parallel (captioner matmul output dims)

On one slice both axes ride ICI; XLA GSPMD inserts the all-gathers /
reduce-scatters implied by the shardings (scaling-book recipe: pick a mesh,
annotate shardings, let XLA insert collectives).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence] = None,
    dp: Optional[int] = None,
    tp: int = 1,
) -> Mesh:
    """Build a ('dp', 'tp') mesh over the given (default: all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp}*{tp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard leading (batch) dim over 'dp'; everything else replicated."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params_fsdp_tp(params, mesh: Mesh, min_size: int = 2 ** 14):
    """Tensor-parallel-style param shardings: 2D+ kernels are split on their
    output (last) dim over 'tp' when divisible; small params replicated.

    With these in jit's in_shardings, GSPMD runs the matmuls tensor-parallel
    and inserts the ICI collectives — no model-code changes needed.
    """
    tp = mesh.shape["tp"]

    def rule(x):
        if hasattr(x, "shape") and x.ndim >= 2 and x.size >= min_size and x.shape[-1] % tp == 0:
            spec = [None] * (x.ndim - 1) + ["tp"]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, params)
