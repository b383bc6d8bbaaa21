"""Differential evolution with whole-population device evaluation.

The reference drives scipy.optimize.differential_evolution with a serial
Python objective (reference: optimize_cz_gate.py:1052-1114, maxiter=80,
popsize=15 -> ~1200 sequential gate sims). Here each generation is ONE
vmapped call: the proposal is jitted, the objective evaluates the whole
trial population in its own jitted call (constants as arguments — see
engine.make_population_objective), and selection is a tiny host update.

Strategy: rand1bin (the scipy default), with best-member elitism.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


@dataclass
class DEResult:
    x: np.ndarray
    fun: float
    nfev: int
    nit: int
    history: np.ndarray  # best cost per generation
    population: np.ndarray
    energies: np.ndarray


def _de_propose(key, pop, lower, upper, mutation, recombination):
    """rand/1/bin trial population (jitted separately from the cost so
    host-side cost functions — e.g. per-member spacing re-planning — can
    evaluate between propose and select)."""
    P, D = pop.shape
    k1, k2, k3, k4 = jax.random.split(key, 4)

    # rand/1: x_r1 + F (x_r2 - x_r3), distinct random members
    idx = jax.vmap(lambda k: jax.random.choice(k, P, (3,), replace=False))(
        jax.random.split(k1, P))
    r1, r2, r3 = pop[idx[:, 0]], pop[idx[:, 1]], pop[idx[:, 2]]
    F = jax.random.uniform(k2, (P, 1), minval=mutation[0], maxval=mutation[1])
    mutant = r1 + F * (r2 - r3)
    mutant = jnp.clip(mutant, lower, upper)

    # binomial crossover with guaranteed one mutated coordinate
    cross = jax.random.uniform(k3, (P, D)) < recombination
    force = jax.nn.one_hot(jax.random.randint(k4, (P,), 0, D), D, dtype=bool)
    return jnp.where(cross | force, mutant, pop)




def differential_evolution(
    cost_fn: Callable,           # (P, D) -> ((P,), aux)
    bounds,
    x0: Optional[np.ndarray] = None,
    popsize: int = 15,
    maxiter: int = 80,
    mutation: Tuple[float, float] = (0.5, 1.0),
    recombination: float = 0.7,
    tol: float = 0.0,
    seed: int = 42,
    init_population: Optional[np.ndarray] = None,
) -> DEResult:
    """Minimize cost_fn over box bounds. cost_fn takes the whole population.

    The cost function always evaluates OUTSIDE the jitted propose step:
    objectives carry their constant complex operands as arguments of
    their own jit (engine.make_population_objective), and inlining them
    into an outer jit would embed device arrays as MLIR constants — a
    host fetch of complex data that tunneled TPU backends cannot do.
    This also permits host-side costs (per-member spacing re-planning)
    with no separate code path."""
    bounds = np.asarray(bounds, dtype=float)
    lower = jnp.asarray(bounds[:, 0])
    upper = jnp.asarray(bounds[:, 1])
    D = bounds.shape[0]
    P = max(popsize, 4)

    key = jax.random.PRNGKey(seed)
    key, k_init = jax.random.split(key)
    if init_population is not None:
        pop = jnp.asarray(init_population)
        P = pop.shape[0]
    else:
        u = jax.random.uniform(k_init, (P, D))
        pop = lower + u * (upper - lower)
        if x0 is not None:
            pop = pop.at[0].set(jnp.clip(jnp.asarray(x0), lower, upper))

    energies, _ = cost_fn(pop)
    energies = np.asarray(energies)
    pop = np.asarray(pop)

    propose = jax.jit(partial(_de_propose, mutation=mutation,
                              recombination=recombination,
                              lower=lower, upper=upper))

    def step(k, pop, energies):
        trial = np.asarray(propose(k, jnp.asarray(pop)))
        trial_E, _ = cost_fn(trial)
        trial_E = np.asarray(trial_E)
        accept = trial_E < energies
        pop = np.where(accept[:, None], trial, pop)
        energies = np.where(accept, trial_E, energies)
        return pop, energies

    history = []
    nfev = P
    for it in range(maxiter):
        key, k = jax.random.split(key)
        pop, energies = step(k, pop, energies)
        nfev += P
        best = float(np.min(energies))
        history.append(best)
        if tol > 0 and it > 5:
            spread = float(np.std(energies))
            if spread <= tol * abs(float(np.mean(energies)) + 1e-12):
                break

    energies_np = np.asarray(energies)
    pop_np = np.asarray(pop)
    ib = int(np.argmin(energies_np))
    return DEResult(x=pop_np[ib], fun=float(energies_np[ib]), nfev=nfev,
                    nit=len(history), history=np.asarray(history),
                    population=pop_np, energies=energies_np)


__all__ = ["differential_evolution", "DEResult"]
