"""Mesh-sharded DE population evaluation (SURVEY 2d parallel axis #3).

The reference evaluates its DE population serially
(reference: optimize_cz_gate.py:1052-1114). optimize/engine.py already
turns a whole generation into one vmapped device call; this module
shards that call's member axis over a jax.sharding.Mesh so a population
spreads across chips with NO change to the optimizer driver — the
returned callable is a drop-in `population objective` for
optimize/de.differential_evolution (which keeps cost evaluation outside
its own jit, so sharded objectives compose with it directly).

Members are padded to a multiple of the mesh size (cost = +inf-free:
padding replicates the first member and is sliced off the results).
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..optimize.engine import FixedProblem, _make_eval_core, _check_protocol
from ..utils.transfer import device_put_complex
from .mesh import make_mesh


def make_population_objective_sharded(problem: FixedProblem, protocol: str,
                                      mesh: Optional[Mesh] = None,
                                      axis: Optional[str] = None,
                                      **builder_kwargs) -> Callable:
    """Population objective with the member axis sharded over the mesh.

    Uses the same eval core (phase-frame fast path when eligible) as the
    single-chip path; XLA partitions the vmapped computation over the
    named axis — members are pure data parallelism, so no collectives
    are needed until the host reads the results back.
    """
    if mesh is None:
        mesh = make_mesh(axis_names=("pop",))
    axis = axis or mesh.axis_names[0]
    n_dev = int(np.prod(mesh.devices.shape))

    key = _check_protocol(protocol)
    core, consts = _make_eval_core(problem, key, builder_kwargs)
    n_const = len(consts)
    vm = jax.vmap(core, in_axes=(0,) + (None,) * n_const)

    pop_sharding = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    fn = jax.jit(vm, in_shardings=(pop_sharding,) + (rep,) * n_const,
                 out_shardings=(pop_sharding,
                                jax.tree_util.tree_map(
                                    lambda _: pop_sharding,
                                    _metric_structure())))
    dev = tuple(jax.device_put(device_put_complex(np.asarray(a)), rep)
                for a in consts)

    def call(population):
        population = np.asarray(population)
        P_n = population.shape[0]
        pad = (-P_n) % n_dev
        if pad:
            population = np.concatenate(
                [population, np.repeat(population[:1], pad, axis=0)])
        pop_dev = jax.device_put(jnp.asarray(population), pop_sharding)
        costs, metrics = fn(pop_dev, *dev)
        if pad:
            costs = costs[:P_n]
            metrics = {k: v[:P_n] for k, v in metrics.items()}
        return costs, metrics

    call.mesh = mesh
    return call


def _metric_structure():
    """Pytree prototype matching _evaluate_* metric dicts (all leaves get
    the same sharding; values are ignored)."""
    keys = ("avg_fidelity", "f00", "f01", "f10", "f11",
            "cz_phase_fidelity", "controlled_phase_deg",
            "phase_error_deg", "gate_time_us")
    return {k: 0 for k in keys}


__all__ = ["make_population_objective_sharded"]
