"""Vectorized protocol-parameter objective engine.

This is the TPU replacement for the reference's DE objective loop
(reference: optimize_cz_gate.py:1081-1114, ~1200 sequential
simulate_CZ_gate calls per run): here an ENTIRE population of protocol
parameter vectors is evaluated in one vmapped device call, and every
objective is differentiable (jax.grad through the expm propagator), which
the reference cannot do at all.

Key structure: for a fixed apparatus the Liouvillian pieces
(L0_bare, Cd, Cp, Cm) are constant; protocol parameters only build a
Schedule (amps, phases, dts, dets). See ops/lindblad.superop_basis.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core.configs import SmoothJPSimulationInputs
from ..physics.protocols import compute_phase_shift_xi_jax
from ..solver.propagator import Schedule, evolve_rhos
from ..gate.fidelity import compute_cz_fidelity
from ..gate.simulate import plan_cz_gate
from .apparatus import ApparatusConstraints
from .cost import compute_cost_arrays


@dataclass
class FixedProblem:
    """Constant arrays for one apparatus + noise setting (host numpy;
    device transfer happens in make_population_objective)."""
    L0_bare: np.ndarray    # Liouvillian WITHOUT the -Delta|r><r| term
    Cd: np.ndarray         # detuning channel (multiply by +Delta)
    Cp: np.ndarray
    Cm: np.ndarray
    rho0s: np.ndarray
    kets: Dict[str, np.ndarray]
    Omega: float
    V: float
    Delta_e: float
    V_over_Omega: float


def build_fixed_problem(apparatus: ApparatusConstraints,
                        noise_cfg, include_noise: bool = True,
                        dtype=None) -> FixedProblem:
    """Plan once with Delta=0 in L0; detuning is applied per-segment via Cd."""
    from ..ops.lindblad import hamiltonian_superop_linear
    from ..ops.hilbert import HS3, sym_two_atom
    if dtype is None:
        dtype = jnp.complex128 if jax.config.jax_enable_x64 else jnp.complex64

    si = SmoothJPSimulationInputs(excitation=apparatus.make_excitation_config(),
                                  noise=noise_cfg)
    plan = plan_cz_gate(si, include_noise=include_noise, **apparatus.sim_kwargs())
    # remove the planned smooth-JP detuning from L0 -> L0_bare
    Cd = hamiltonian_superop_linear(-sym_two_atom(HS3.projectors["r"]))
    L0_bare = plan.L0 - plan.Delta * Cd
    # keep the constants as HOST numpy: device transfer happens once, in
    # make_population_objective, via device_put_complex (tunneled TPU
    # backends can neither serialize complex buffers nor fetch complex
    # device arrays back)
    ndt = np.dtype(jnp.dtype(dtype).name)
    return FixedProblem(
        L0_bare=np.asarray(L0_bare, ndt),
        Cd=np.asarray(Cd, ndt),
        Cp=np.asarray(plan.Cp, ndt),
        Cm=np.asarray(plan.Cm, ndt),
        rho0s=np.asarray(plan.rho0s, ndt),
        kets=plan.kets,
        Omega=plan.Omega, V=plan.V, Delta_e=float(si.excitation.Delta_e),
        V_over_Omega=plan.V_over_Omega,
    )


def _evaluate_arrays(schedule: Schedule, L0_bare, Cd, Cp, Cm, rho0s, kets):
    """Array-argument core: complex operands enter as jit ARGUMENTS, never
    closures (closured complex device arrays are inlined as MLIR constants,
    which tunneled TPU backends cannot fetch — see utils/transfer.py)."""
    rhos = evolve_rhos(L0_bare, Cp, Cm, schedule, rho0s, Cd=Cd)
    fids, avg, phase_info = compute_cz_fidelity(rhos, kets)
    gate_time_us = jnp.sum(schedule.dts) * 1e6
    cost = compute_cost_arrays(avg, fids["11"],
                               phase_info["cz_phase_fidelity"], gate_time_us)
    metrics = {
        "avg_fidelity": avg, "f00": fids["00"], "f01": fids["01"],
        "f10": fids["10"], "f11": fids["11"],
        "cz_phase_fidelity": phase_info["cz_phase_fidelity"],
        "controlled_phase_deg": phase_info["controlled_phase_deg"],
        "phase_error_deg": phase_info["phase_error_from_pi_deg"],
        "gate_time_us": gate_time_us,
    }
    return cost, metrics


def _evaluate(problem: FixedProblem, schedule: Schedule):
    return _evaluate_arrays(schedule, problem.L0_bare, problem.Cd,
                            problem.Cp, problem.Cm, problem.rho0s,
                            problem.kets)


# =============================================================================
# schedules from parameter vectors (all traced)
# =============================================================================

def lp_schedule_from_params(params, problem: FixedProblem):
    """params = [delta_over_omega, omega_tau].
    (optimize_cz_gate.py:339-352 _build_lp_inputs)"""
    dow, ot = params[0], params[1]
    Omega = problem.Omega
    Delta = dow * Omega
    tau = ot / Omega
    xi = compute_phase_shift_xi_jax(Delta, Omega, tau)
    xi_phase = jnp.angle(xi)
    amps = jnp.ones((2,))
    phases = jnp.stack([jnp.zeros_like(xi_phase), xi_phase])
    dts = jnp.stack([tau, tau])
    dets = jnp.stack([Delta, Delta])
    return Schedule(amps, phases, dts, dets)


def smooth_jp_schedule_from_params(params, problem: FixedProblem,
                                   n_steps: int = 300):
    """params = [omega_tau, A, omega_mod_ratio, phi_offset, delta_over_omega].
    (optimize_cz_gate.py:518-543). The dark-state sign rule maps |dow| to
    the sign opposite Delta_e (simulation.py:3477-3483)."""
    ot, A, omr, phi0, dow_mag = (params[0], params[1], params[2],
                                 params[3], params[4])
    Omega = problem.Omega
    sign = -1.0 if problem.Delta_e > 0 else 1.0
    Delta = sign * jnp.abs(dow_mag) * Omega
    tau = ot / Omega
    dt = tau / n_steps
    t_mid = (jnp.arange(n_steps) + 0.5) * dt
    phases = A * jnp.cos(omr * Omega * t_mid - phi0)
    amps = jnp.ones((n_steps,))
    dts = jnp.full((n_steps,), 1.0) * dt
    dets = jnp.full((n_steps,), 1.0) * Delta
    return Schedule(amps, phases, dts, dets)


def bangbang_schedule_from_params(params, problem: FixedProblem,
                                  n_segments: int = 5):
    """Fractional parameterisation, ordering guaranteed by sorting:
    params = [omega_tau, f_1..f_{N-1}, phi_0..phi_{N-1}].
    (optimize_cz_gate.py:365-400 _build_jp_bangbang_inputs)"""
    ot = params[0]
    n_switch = n_segments - 1
    fracs = jnp.sort(params[1:1 + n_switch])
    phases = params[1 + n_switch:1 + n_switch + n_segments]
    Omega = problem.Omega
    bounds = jnp.concatenate([jnp.zeros((1,)), fracs * ot,
                              jnp.reshape(ot, (1,))])
    dts = jnp.clip(bounds[1:] - bounds[:-1], 0.0, None) / Omega
    amps = jnp.ones((n_segments,))
    dets = jnp.zeros((n_segments,))
    return Schedule(amps, phases, dts, dets)


SCHEDULE_BUILDERS: Dict[str, Callable] = {
    "levine_pichler": lp_schedule_from_params,
    "lp": lp_schedule_from_params,
    "smooth_jp": smooth_jp_schedule_from_params,
    "jandura_pupillo": bangbang_schedule_from_params,
    "jp_bangbang": bangbang_schedule_from_params,
}


def make_objective(problem: FixedProblem, protocol: str,
                   **builder_kwargs) -> Callable:
    """Returns cost_fn(params)->(cost, metrics), jit/vmap/grad-ready."""
    key = protocol.lower().replace("-", "_")
    if key not in SCHEDULE_BUILDERS:
        raise ValueError(f"Unknown protocol for optimization: {protocol}")
    builder = SCHEDULE_BUILDERS[key]

    def objective(params):
        sched = builder(jnp.asarray(params), problem, **builder_kwargs)
        return _evaluate(problem, sched)

    return objective


def make_population_objective(problem: FixedProblem, protocol: str,
                              **builder_kwargs) -> Callable:
    """Whole-population evaluation: (P, D) params -> (P,) costs, dict of (P,)
    metrics — ONE device call per DE generation.

    The constant complex operands are passed as jit ARGUMENTS (transferred
    once via device_put_complex), so this runs on tunneled TPU backends
    too — closured complex constants would crash there."""
    from ..utils.transfer import device_put_complex
    key = protocol.lower().replace("-", "_")
    if key not in SCHEDULE_BUILDERS:
        raise ValueError(f"Unknown protocol for optimization: {protocol}")
    builder = SCHEDULE_BUILDERS[key]
    kets = problem.kets

    def one(params, L0_bare, Cd, Cp, Cm, rho0s):
        sched = builder(params, problem, **builder_kwargs)
        return _evaluate_arrays(sched, L0_bare, Cd, Cp, Cm, rho0s, kets)

    vm = jax.jit(jax.vmap(one, in_axes=(0, None, None, None, None, None)))
    dev = tuple(device_put_complex(np.asarray(a))
                for a in (problem.L0_bare, problem.Cd, problem.Cp,
                          problem.Cm, problem.rho0s))

    def call(population):
        return vm(jnp.asarray(population), *dev)

    return call


__all__ = ["FixedProblem", "build_fixed_problem", "make_objective",
           "make_population_objective", "lp_schedule_from_params",
           "smooth_jp_schedule_from_params", "bangbang_schedule_from_params"]
