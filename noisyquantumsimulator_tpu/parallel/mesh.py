"""Device-mesh sharding for sweep / Monte-Carlo parallelism.

The reference runs every embarrassingly-parallel axis serially
(SURVEY.md 2d: DE populations, sweep grids, MC shots). Here those axes
shard over a jax.sharding.Mesh: sweeps and QEC shot batches ride ICI with
psum-style reductions inserted by XLA; no NCCL/MPI analog exists or is
needed.

Axis conventions:
  "sweep"  parameter sets (protocol/hardware points)  - pure data parallel
  "shots"  Monte-Carlo shot blocks (QEC sampling)      - pure data parallel
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("sweep", "shots"),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Build a mesh over the available devices.

    Default factorization puts as many devices as possible on the first
    axis; pass `shape` for an explicit layout (must multiply to n_devices).
    """
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        raise ValueError(
            f"make_mesh: {n} devices requested but only {len(devs)} "
            f"available ({devs[0].platform}). For a virtual mesh set "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n} and "
            f"force the cpu platform BEFORE jax backend init.")
    devs = devs[:n]
    if shape is None:
        if len(axis_names) == 1:
            shape = (n,)
        else:
            # largest power-of-two split on the leading axis
            a = 1
            while a * 2 <= n and n % (a * 2) == 0:
                a *= 2
            shape = (a, n // a) + (1,) * (len(axis_names) - 2)
    arr = np.array(devs).reshape(shape)
    return Mesh(arr, axis_names=tuple(axis_names))


def shard_leading(mesh: Mesh, axis: str = "sweep") -> NamedSharding:
    """Sharding that splits the leading array dimension over `axis`."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0):
    """Pad the leading axis so it divides the mesh axis size; returns
    (padded, original_length)."""
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x, n
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return np.pad(x, widths, mode="edge"), n


__all__ = ["make_mesh", "shard_leading", "replicated", "pad_to_multiple",
           "Mesh", "NamedSharding", "P"]


def shard_map_compat(f, mesh, in_specs, out_specs, check: bool = True):
    """shard_map across jax versions: jax.shard_map (>=0.8, check_vma
    keyword) with fallback to jax.experimental.shard_map (check_rep)."""
    import jax
    if hasattr(jax, "shard_map"):
        return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=check)
    from jax.experimental.shard_map import shard_map as _sm
    return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
               check_rep=check)
