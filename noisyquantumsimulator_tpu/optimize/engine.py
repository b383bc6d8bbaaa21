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
from ..ops.expm import expm
from ..physics.protocols import compute_phase_shift_xi_jax
from ..solver.propagator import Schedule, evolve_rhos, evolve_rhos_phased
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
    g: Optional[np.ndarray] = None  # phase-frame generator (ops/phase_frame)
    # real Hermitian-basis operands (solver/real_rep.py): present whenever
    # g is — the uniform fast core then runs FULLY REAL (real expm + one
    # real matmul per segment, ~4x less MXU work than the complex path)
    R_L0: Optional[np.ndarray] = None      # Re(W L0_bare W^dagger)
    R_Cd: Optional[np.ndarray] = None      # Re(W Cd W^dagger)
    R_drive: Optional[np.ndarray] = None   # Re(W (Cp + Cm) W^dagger)
    x0r: Optional[np.ndarray] = None       # real coords of rho0s (S, D^2)
    Wr: Optional[np.ndarray] = None
    Wi: Optional[np.ndarray] = None
    cq: Optional[np.ndarray] = None        # (P,) pair charges
    repP: int = 0                          # pair count


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
    # phase-frame generator validated against L0_bare + Cd (the detuning
    # channel is diagonal, so a uniform per-schedule detuning keeps the
    # one-expm factorization exact); None -> general per-segment path
    from ..ops.phase_frame import phase_frame_generator
    g = phase_frame_generator(L0_bare + Cd, plan.Cp, plan.Cm, HS3)
    real_fields = {}
    if g is not None:
        # real Hermitian-basis operands (f64 host transform; Liouvillian
        # generators are Hermiticity-preserving, asserted inside)
        from ..solver.real_rep import build_real_rep, real_propagator_host
        rdt = np.float32 if ndt == np.complex64 else np.float64
        D = plan.rho0s.shape[-1]
        rep = build_real_rep(g, D)
        vec = plan.rho0s.reshape(plan.rho0s.shape[0], D * D)
        x0r = (vec.real @ rep.Wr.T - vec.imag @ rep.Wi.T)
        real_fields = dict(
            R_L0=real_propagator_host(L0_bare, rep).astype(rdt),
            R_Cd=real_propagator_host(Cd, rep).astype(rdt),
            R_drive=real_propagator_host(plan.Cp + plan.Cm,
                                         rep).astype(rdt),
            x0r=x0r.astype(rdt),
            Wr=rep.Wr.astype(rdt), Wi=rep.Wi.astype(rdt),
            cq=rep.cq.astype(rdt), repP=rep.P,
        )
    return FixedProblem(
        L0_bare=np.asarray(L0_bare, ndt),
        Cd=np.asarray(Cd, ndt),
        Cp=np.asarray(plan.Cp, ndt),
        Cm=np.asarray(plan.Cm, ndt),
        rho0s=np.asarray(plan.rho0s, ndt),
        kets=plan.kets,
        Omega=plan.Omega, V=plan.V, Delta_e=float(si.excitation.Delta_e),
        V_over_Omega=plan.V_over_Omega,
        g=g,
        **real_fields,
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


def _cost_and_metrics(rhos, kets, gate_time_us):
    fids, avg, phase_info = compute_cz_fidelity(rhos, kets)
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


def _evaluate_uniform_arrays(phases, dt, det, g, L0_bare, Cd, Cp, Cm,
                             rho0s, kets):
    """Phase-frame fast core for uniform-(amp=1, dt, det) schedules: ONE
    expm + diagonal-rescaled matmul tree per evaluation instead of one
    expm per segment (solver/propagator.total_propagator_phased). det and
    dt are traced scalars, so this stays fully differentiable in all
    protocol parameters (including gate time)."""
    A = (L0_bare + det * Cd + (Cp + Cm)) * dt
    Ub = expm(A)
    rhos = evolve_rhos_phased(Ub, g, phases, rho0s)
    return _cost_and_metrics(rhos, kets, phases.shape[0] * dt * 1e6)


def _evaluate_uniform_real(phases, dt, det, cq, R_L0, R_Cd, R_drive,
                           x0r, Wr, Wi, kets, P):
    """The uniform fast core run FULLY REAL (solver/real_rep.py): the
    Liouvillian pieces arrive pre-transformed to the Hermitian operator
    basis, so the per-evaluation expm is a REAL matrix exponential
    (6 real matmuls vs the complex path's ~18 f32-plane ones) and the
    segment scan is one real matvec per step. Exact same physics — the
    basis change is unitary and the tests pin this core to the general
    per-segment path. Fully differentiable in (phases, dt, det)."""
    from ..solver.real_rep import evolve_real_phased, from_real_coords
    A = (R_L0 + det * R_Cd + R_drive) * dt
    Ur = expm(A)
    n = x0r.shape[-1]
    D = int(round(np.sqrt(n)))
    x = evolve_real_phased(Ur, cq, phases, x0r, D, P)
    rhos = from_real_coords(x, Wr, Wi)
    return _cost_and_metrics(rhos, kets, phases.shape[0] * dt * 1e6)


# =============================================================================
# schedules from parameter vectors (all traced)
# =============================================================================

def lp_schedule_from_params(params, problem: FixedProblem):
    """params = [delta_over_omega, omega_tau].
    (optimize_cz_gate.py:339-352 _build_lp_inputs). Delegates the
    parameter decode to lp_uniform_from_params so the fast (phase-frame)
    and general paths can never diverge."""
    phases, dt, Delta = lp_uniform_from_params(params, problem)
    n = phases.shape[0]
    amps = jnp.ones((n,))
    dts = jnp.full((n,), 1.0) * dt
    dets = jnp.full((n,), 1.0) * Delta
    return Schedule(amps, phases, dts, dets)


def smooth_jp_schedule_from_params(params, problem: FixedProblem,
                                   n_steps: int = 300):
    """params = [omega_tau, A, omega_mod_ratio, phi_offset, delta_over_omega].
    (optimize_cz_gate.py:518-543). Delegates the decode (incl. the
    dark-state sign rule) to smooth_jp_uniform_from_params — one source
    of truth for both evaluation paths."""
    phases, dt, Delta = smooth_jp_uniform_from_params(params, problem,
                                                      n_steps=n_steps)
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


def lp_uniform_from_params(params, problem: FixedProblem):
    """(phases, dt, det) for the phase-frame fast core (LP square)."""
    dow, ot = params[0], params[1]
    Omega = problem.Omega
    Delta = dow * Omega
    tau = ot / Omega
    xi = compute_phase_shift_xi_jax(Delta, Omega, tau)
    xi_phase = jnp.angle(xi)
    phases = jnp.stack([jnp.zeros_like(xi_phase), xi_phase])
    return phases, tau, Delta


def smooth_jp_uniform_from_params(params, problem: FixedProblem,
                                  n_steps: int = 300):
    """(phases, dt, det) for the phase-frame fast core (smooth JP)."""
    ot, A, omr, phi0, dow_mag = (params[0], params[1], params[2],
                                 params[3], params[4])
    Omega = problem.Omega
    sign = -1.0 if problem.Delta_e > 0 else 1.0
    Delta = sign * jnp.abs(dow_mag) * Omega
    tau = ot / Omega
    dt = tau / n_steps
    t_mid = (jnp.arange(n_steps) + 0.5) * dt
    phases = A * jnp.cos(omr * Omega * t_mid - phi0)
    return phases, dt, Delta


def free_phases_uniform_from_params(params, problem: FixedProblem, *,
                                    omega_tau: float,
                                    delta_over_omega: float):
    """(phases, dt, det) with EVERY per-segment phase a free parameter —
    GRAPE-style optimal control (piecewise-constant phase modulation at
    fixed Omega, gate time and detuning).

    omega_tau / delta_over_omega are REQUIRED: the phases are only
    meaningful at the gate time and detuning the pulse was built for, so
    silently evaluating at literature defaults would return plausible but
    wrong fidelities (callers derive them from their own x0, as
    forward._optimize_grape does).

    params = the (n_steps,) phase vector itself. No protocol ansatz: the
    gradient of the cost w.r.t. all n_steps phases flows through the
    phase-frame propagator in one backward pass, so a 300-dimensional
    pulse shape optimizes as cheaply as the 5-parameter smooth-JP fit.
    The reference cannot do this at all (scipy DE over its per-step
    QuTiP loop would need ~10^5 full simulations per generation)."""
    Omega = problem.Omega
    sign = -1.0 if problem.Delta_e > 0 else 1.0
    Delta = sign * jnp.abs(delta_over_omega) * Omega
    tau = omega_tau / Omega
    dt = tau / params.shape[0]
    return params, dt, Delta


def free_phases_schedule_from_params(params, problem: FixedProblem, *,
                                     omega_tau: float,
                                     delta_over_omega: float):
    phases, dt, Delta = free_phases_uniform_from_params(
        params, problem, omega_tau=omega_tau,
        delta_over_omega=delta_over_omega)
    n = phases.shape[0]
    return Schedule(jnp.ones((n,)), phases, jnp.full((n,), 1.0) * dt,
                    jnp.full((n,), 1.0) * Delta)


SCHEDULE_BUILDERS: Dict[str, Callable] = {
    "levine_pichler": lp_schedule_from_params,
    "lp": lp_schedule_from_params,
    "smooth_jp": smooth_jp_schedule_from_params,
    "jandura_pupillo": bangbang_schedule_from_params,
    "jp_bangbang": bangbang_schedule_from_params,
    "free_phases": free_phases_schedule_from_params,
    "grape": free_phases_schedule_from_params,
}

# protocols whose schedules are uniform in (amp, dt, det): eligible for the
# one-expm phase-frame core whenever problem.g exists
UNIFORM_BUILDERS: Dict[str, Callable] = {
    "levine_pichler": lp_uniform_from_params,
    "lp": lp_uniform_from_params,
    "smooth_jp": smooth_jp_uniform_from_params,
    "free_phases": free_phases_uniform_from_params,
    "grape": free_phases_uniform_from_params,
}


def _make_eval_core(problem: FixedProblem, key: str, builder_kwargs: dict):
    """(params, *consts) -> (cost, metrics) traced core + the constant
    operand tuple (host numpy, in argument order). Picks the phase-frame
    fast core when the protocol's schedule is uniform and the generator
    exists; the general per-segment path otherwise."""
    kets = problem.kets
    if key in UNIFORM_BUILDERS and problem.g is not None:
        ubuilder = UNIFORM_BUILDERS[key]
        P = problem.repP

        def core(params, cq, R_L0, R_Cd, R_drive, x0r, Wr, Wi):
            phases, dt, det = ubuilder(params, problem, **builder_kwargs)
            return _evaluate_uniform_real(phases, dt, det, cq, R_L0,
                                          R_Cd, R_drive, x0r, Wr, Wi,
                                          kets, P)

        # R_L0 second (the spacing path batches the operand at index 1,
        # matching the old (g, L0_bare, ...) layout)
        consts = (problem.cq, problem.R_L0, problem.R_Cd,
                  problem.R_drive, problem.x0r, problem.Wr, problem.Wi)
        return core, consts

    builder = SCHEDULE_BUILDERS[key]

    def core(params, L0_bare, Cd, Cp, Cm, rho0s):
        sched = builder(params, problem, **builder_kwargs)
        return _evaluate_arrays(sched, L0_bare, Cd, Cp, Cm, rho0s, kets)

    consts = (problem.L0_bare, problem.Cd, problem.Cp, problem.Cm,
              problem.rho0s)
    return core, consts


def _device_consts(consts):
    from ..utils.transfer import device_put_complex
    return tuple(device_put_complex(np.asarray(a)) for a in consts)


def _check_protocol(protocol: str) -> str:
    key = protocol.lower().replace("-", "_")
    if key not in SCHEDULE_BUILDERS:
        raise ValueError(f"Unknown protocol for optimization: {protocol}")
    return key


def make_objective(problem: FixedProblem, protocol: str,
                   **builder_kwargs) -> Callable:
    """Returns cost_fn(params)->(cost, metrics). Like the population path,
    the constant complex operands enter as jit ARGUMENTS (transferred once
    via device_put_complex), so the scalar objective runs on tunneled TPU
    backends too."""
    key = _check_protocol(protocol)
    core, consts = _make_eval_core(problem, key, builder_kwargs)
    fn = jax.jit(core)
    dev = _device_consts(consts)

    def objective(params):
        return fn(jnp.asarray(params), *dev)

    return objective


def make_value_and_grad(problem: FixedProblem, protocol: str,
                        **builder_kwargs) -> Callable:
    """cost_and_grad(params) -> (cost, dcost/dparams), jitted with the
    constant operands as arguments (axon-safe). This is the gradient-polish
    engine: jax.grad flows through the expm propagator / phase-frame tree
    into every protocol parameter (the reference has no analog)."""
    key = _check_protocol(protocol)
    core, consts = _make_eval_core(problem, key, builder_kwargs)

    def cost_only(params, *ops):
        return core(params, *ops)[0]

    vg = jax.jit(jax.value_and_grad(cost_only))
    dev = _device_consts(consts)

    def call(params):
        return vg(jnp.asarray(params), *dev)

    return call


def make_population_objective(problem: FixedProblem, protocol: str,
                              **builder_kwargs) -> Callable:
    """Whole-population evaluation: (P, D) params -> (P,) costs, dict of (P,)
    metrics — ONE device call per DE generation.

    The constant complex operands are passed as jit ARGUMENTS (transferred
    once via device_put_complex), so this runs on tunneled TPU backends
    too — closured complex constants would crash there."""
    key = _check_protocol(protocol)
    core, consts = _make_eval_core(problem, key, builder_kwargs)
    n_const = len(consts)
    vm = jax.jit(jax.vmap(core, in_axes=(0,) + (None,) * n_const))
    dev = _device_consts(consts)

    def call(population):
        return vm(jnp.asarray(population), *dev)

    return call


def make_spacing_population_objective(apparatus: ApparatusConstraints,
                                      noise_cfg, protocol: str,
                                      include_noise: bool = True,
                                      **builder_kwargs) -> Callable:
    """Population objective with spacing_factor as the LAST parameter
    dimension (reference: optimize_cz_gate.py:1043-1051).

    Spacing changes the blockade V *and every trap-dependent noise rate*,
    so each member's Liouvillian is re-planned host-side for its spacing
    (cached by rounded value, mirroring the reference's 4-decimal cache
    keys) — exact physics parity, not just the coherent V(R) scaling.
    All members still evaluate in ONE vmapped device call: only L0_bare
    is batched (Cp/Cm/Cd/rho0s/Omega are spacing-independent)."""
    from collections import OrderedDict
    from dataclasses import replace as dc_replace
    from ..utils.transfer import device_put_complex
    key = _check_protocol(protocol)

    # LRU-capped: DE proposes continuous spacings, so hits are rare and an
    # unbounded cache would grow by ~popsize problems per generation
    _cache: "OrderedDict[float, FixedProblem]" = OrderedDict()
    _CACHE_CAP = 256

    def problem_for(sf: float) -> FixedProblem:
        k = round(float(sf), 4)
        if k in _cache:
            _cache.move_to_end(k)
            return _cache[k]
        app = dc_replace(apparatus, spacing_factor=k)
        prob = build_fixed_problem(app, noise_cfg,
                                   include_noise=include_noise)
        _cache[k] = prob
        if len(_cache) > _CACHE_CAP:
            _cache.popitem(last=False)
        return prob

    p0 = problem_for(apparatus.spacing_factor)
    core, consts = _make_eval_core(p0, key, builder_kwargs)
    # batch axis 0 on params AND on L0_bare (the only spacing-dependent
    # constant); L0_bare sits right after g in the uniform core's argument
    # order, or first in the general core's
    n_const = len(consts)
    l0_pos = 1 if (key in UNIFORM_BUILDERS and p0.g is not None) else 0
    in_axes = (0,) + tuple(0 if i == l0_pos else None
                           for i in range(n_const))
    vm = jax.jit(jax.vmap(core, in_axes=in_axes))
    dev_static = tuple(device_put_complex(np.asarray(a))
                       for i, a in enumerate(consts) if i != l0_pos)

    uses_phase_frame = l0_pos == 1

    def call(population):
        population = np.asarray(population)
        prot_params = population[:, :-1]
        sfs = population[:, -1]
        probs = [problem_for(sf) for sf in sfs]
        if uses_phase_frame:
            # the fast core was traced for the phase-frame factorization;
            # build_fixed_problem re-verifies the generator per re-planned
            # spacing (exact host-side support check) — refuse to run a
            # member whose physics stopped being phase-covariant rather
            # than silently evaluate it wrong
            for sf, pr in zip(sfs, probs):
                if pr.g is None:
                    raise RuntimeError(
                        f"spacing_factor={float(sf):.4f}: re-planned "
                        "Liouvillian is not phase-frame compatible; "
                        "rebuild the objective with a non-uniform protocol")
        L0s = np.stack([pr.R_L0 if uses_phase_frame else pr.L0_bare
                        for pr in probs])
        L0_dev = device_put_complex(L0s)
        dev = list(dev_static)
        dev.insert(l0_pos, L0_dev)
        return vm(jnp.asarray(prot_params), *dev)

    call.problem_for = problem_for
    call.base_problem = p0
    return call


__all__ = ["FixedProblem", "build_fixed_problem", "make_objective",
           "make_value_and_grad", "make_population_objective",
           "make_spacing_population_objective",
           "lp_schedule_from_params", "smooth_jp_schedule_from_params",
    "free_phases_schedule_from_params", "free_phases_uniform_from_params",
           "bangbang_schedule_from_params"]
