"""ICI-sharded BB-LDPC Monte Carlo: sample + BP-decode + psum, on device.

The BASELINE.md north-star #4 workload ("BB-LDPC QEC sampling: ICI-sharded
Monte-Carlo shots with psum reductions, multi-chip v5e") as a first-class
API rather than a dry-run demo:

    every device draws its own iid X-error shots, computes syndromes with
    an int8 matmul, runs min-sum BP on the Tanner graph, checks residual
    syndromes and logical flips, and `psum`s the failure counts over the
    whole mesh. One `shard_map`ped jit call per Monte-Carlo round; the
    only cross-device traffic is a handful of scalars riding the ICI.

On a single host this runs over the virtual CPU mesh (tests) or one TPU
chip; the same code scales to real multi-chip meshes unchanged.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..qec.ldpc import _bp_batch, css_n_k, logical_operators, small_bb_code
from .mesh import make_mesh, shard_map_compat


def run_bb_memory_sharded(
    Hx: Optional[np.ndarray] = None,
    Hz: Optional[np.ndarray] = None,
    p: float = 1e-2,
    shots_per_device: int = 4096,
    n_iters: int = 50,
    mesh=None,
    n_devices: Optional[int] = None,
    seed: int = 0,
) -> Dict:
    """Code-capacity X-memory Monte Carlo of a BB code over the mesh.

    Returns global statistics reduced with psum: logical failure rate,
    BP convergence fraction, mean syndrome weight, and the effective
    total shot count."""
    if Hx is None or Hz is None:
        Hx, Hz = small_bb_code()
    Hx = np.asarray(Hx, np.uint8)
    Hz = np.asarray(Hz, np.uint8)
    n, k = css_n_k(Hx, Hz)
    Lz = logical_operators(Hx, Hz)
    if mesh is None:
        mesh = make_mesh(n_devices or len(jax.devices()))
    axes = tuple(mesh.axis_names)
    n_dev = int(np.prod(mesh.devices.shape))
    T = shots_per_device

    Hzj = jnp.asarray(Hz.astype(np.float32))
    Hz_mask = jnp.asarray(Hz.astype(bool))
    Hz_i32 = jnp.asarray(Hz.astype(np.int32))
    Lz_i32 = jnp.asarray(Lz.astype(np.int32)) if len(Lz) else \
        jnp.zeros((1, n), jnp.int32)
    if not 0.0 < p < 1.0:
        raise ValueError(f"error probability p must be in (0, 1), got {p}")
    llr0 = float(np.log((1 - p) / p))

    def per_device(keys):                    # keys: (1, 2) block
        key = keys[0]
        errors = jax.random.bernoulli(key, p, (T, Hz.shape[1]))
        e_i32 = errors.astype(jnp.int32)
        syn = (e_i32 @ Hz_i32.T) % 2
        est, _ = _bp_batch(syn.astype(jnp.float32), H=Hzj, mask=Hz_mask,
                           llr0=llr0, n_iters=n_iters, scale=0.75)
        residual = e_i32 ^ est.astype(jnp.int32)
        resid_syn = (residual @ Hz_i32.T) % 2
        converged = ~(resid_syn.astype(bool).any(axis=1))
        flips = (residual @ Lz_i32.T) % 2
        fail = flips.astype(bool).any(axis=1) | ~converged

        n_fail = jax.lax.psum(jnp.sum(fail.astype(jnp.float32)), axes)
        n_conv = jax.lax.psum(jnp.sum(converged.astype(jnp.float32)), axes)
        syn_w = jax.lax.psum(jnp.sum(syn.astype(jnp.float32)), axes)
        return n_fail, n_conv, syn_w

    keys = jax.random.split(jax.random.PRNGKey(seed), n_dev)
    keys = jax.device_put(np.asarray(keys),
                          NamedSharding(mesh, P(axes)))
    # check=False: the BP fori_loop carry starts from closured
    # (replicated) zeros, which trips the varying-manual-axes check even
    # though the computation is correct per device
    fn = jax.jit(shard_map_compat(per_device, mesh, P(axes),
                                  (P(), P(), P()), check=False))
    n_fail, n_conv, syn_w = fn(keys)
    total = T * n_dev
    return {
        "code": f"[[{n},{k}]]", "p": p,
        "shots": total, "n_devices": n_dev,
        "p_logical_shot": float(n_fail) / total,
        "bp_converged_frac": float(n_conv) / total,
        "syndrome_weight_mean": float(syn_w) / (total * Hz.shape[0]),
        "mesh_axes": axes,
    }


__all__ = ["run_bb_memory_sharded"]
