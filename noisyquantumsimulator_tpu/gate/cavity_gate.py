"""Engine-driven cavity-QED entangling gate: a real Lindblad simulation on
the atom (x) atom (x) cavity-mode Hilbert space.

Implements the reference's comment-only cavity-QED micro-physics layer
(reference: src/qpu_simulator/micro_physics/cavity_qed/** — Jaynes-
Cummings cavity gates producing CPTP maps + durations) as a SIMULATION
through the shared open-system pipeline (gate/open_system.py), not a
formula sheet: the analytic cooperativity budget in
physics/cavity_qed.photon_mediated_gate is demoted to a cross-check
(tests/test_cavity_gate.py pins its scalings against this engine).

Physics. Two two-level atoms couple to one cavity mode (Tavis-Cummings),
in the frame rotating at the atomic frequency:

    H_rot = Delta_c a^dag a + g sum_i (a sigma+_i + a^dag sigma-_i),

Delta_c = omega_c - omega_a. Every collapse operator used here (cavity
decay a / thermal a^dag, atomic sigma-, atomic sigma_z) maps to itself
times a pure phase under that rotation, so the rotating-frame
Lindbladian is constant EXACTLY and the gate channel is one batched
expm, zero discretization — the same structure as gate/ms_gate.py.

Closed photon-exchange gate. In the one-excitation sector the bright
state |b> = (|eg>+|ge>)/sqrt(2) and the photon |gg,1> form a two-level
system with coupling sqrt(2) g and splitting R = sqrt(Delta_c^2/4+2g^2);
the dark state (|eg>-|ge>)/sqrt(2) never moves. Choosing the CLOSURE
conditions (n_loops = m >= 2)

    R tau = m pi          (photon returns to vacuum exactly)
    Delta_c tau = 2 (m-1) pi   (bright state returns with phase -1)

fixes  Delta_c = g sqrt(8 (m-1)^2 / (2m-1))  and  tau = 2 pi (m-1) /
Delta_c, and makes the one-excitation dynamics EXACT:
|ge> -> -|eg>, |eg> -> -|ge>, |gg> -> |gg>. The doubly-excited state
evolves through the 3-level block {|ee,0>, (|eg,1>+|ge,1>)/sqrt(2),
|gg,2>} whose spectrum is not commensurate with the closure; its exact
return amplitude A_ee = <ee,0| e^{-i H_2 tau} |ee,0> gives the ideal
target phase phi_ee = arg(A_ee) and the scheme's intrinsic
nonadiabatic floor 1-|A_ee|^2 (2.4e-3 at m=21, falling ~ m^-2.7 —
reported as `model_floor`, never hidden). The target

    U_ideal = diag-phase gate {1, -SWAP_block, e^{i phi_ee}}
            = SWAP . (Z x Z) . CPHASE(phi_ee),   phi_ee -> -pi as m grows

is locally equivalent to iSWAP-class maximal entanglers (CPHASE angle
phi_ee ~= -pi), with phi_ee derived from the closure algebra alone —
nothing is fit to the noisy run.

Purcell physics emerges rather than being inserted: atomic decay enters
only as the free-space sigma- rate; the cavity-enhanced part comes out
of the g-coupled dynamics with kappa on the mode (physics/cavity_qed
.purcell_decay_rate is the analytic cross-check).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from ..core.constants import TWO_PI
from .open_system import (I2, SZ, gh_nodes, kron3, propagators_host,
                          qubit_channel_host, qubit_channel_jax,
                          thermal_state)

__all__ = ["CavityGateSimResult", "build_jc_system", "simulate_cavity_gate",
           "cavity_calibration_record", "exchange_closure_params"]

_SM = np.zeros((2, 2), dtype=complex)
_SM[0, 1] = 1.0                      # sigma- = |g><e|, |g>=0, |e>=1


def exchange_closure_params(g: float, n_loops: int):
    """(Delta_c, tau) solving the two closure conditions for m loops."""
    m = int(n_loops)
    if m < 2:
        raise ValueError("n_loops must be >= 2 (m = 1 leaves no room for "
                         "the bright-state pi phase)")
    delta_c = g * np.sqrt(8.0 * (m - 1) ** 2 / (2.0 * m - 1.0))
    tau = TWO_PI * (m - 1) / delta_c
    return float(delta_c), float(tau)


def _ee_return_amplitude(g: float, delta_c: float, tau: float) -> complex:
    """Exact <ee,0| e^{-i H_2 tau} |ee,0> from the two-excitation 3-level
    block {|ee,0>, bright(1 photon), |gg,2>} — the ideal-target phase and
    the scheme's intrinsic floor."""
    H2 = np.array([[0.0, np.sqrt(2.0) * g, 0.0],
                   [np.sqrt(2.0) * g, delta_c, 2.0 * g],
                   [0.0, 2.0 * g, 2.0 * delta_c]])
    w, V = np.linalg.eigh(H2)
    amp = (V[0, :] * np.exp(-1j * w * tau)) @ V[0, :].conj()
    return complex(amp)


def build_jc_system(
    g: float = TWO_PI * 10e6,
    n_loops: int = 9,
    n_fock: int = 6,
    kappa: float = 0.0,
    gamma_spont: float = 0.0,
    dephasing_rate: float = 0.0,
    nbar_cavity: float = 0.0,
):
    """Assemble (H_rot, c_ops, tau, meta) for the closed exchange gate."""
    delta_c, tau = exchange_closure_params(g, n_loops)
    a = np.zeros((n_fock, n_fock), dtype=complex)
    a[np.arange(n_fock - 1), np.arange(1, n_fock)] = \
        np.sqrt(np.arange(1, n_fock, dtype=float))
    Im = np.eye(n_fock, dtype=complex)
    num = a.conj().T @ a

    Nfull = kron3(I2, I2, num)
    H = (delta_c * Nfull
         + g * (kron3(_SM.conj().T, I2, a) + kron3(_SM, I2, a.conj().T)
                + kron3(I2, _SM.conj().T, a) + kron3(I2, _SM, a.conj().T)))

    c_ops: List[np.ndarray] = []
    if kappa > 0:
        afull = kron3(I2, I2, a)
        c_ops.append(np.sqrt(kappa * (1.0 + nbar_cavity)) * afull)
        if nbar_cavity > 0:
            c_ops.append(np.sqrt(kappa * nbar_cavity) * afull.conj().T)
    if gamma_spont > 0:
        # FREE-SPACE atomic decay only — the Purcell-enhanced channel is
        # not a c_op, it emerges from g + kappa in the dynamics
        gsp = np.sqrt(gamma_spont)
        c_ops.append(gsp * kron3(_SM, I2, Im))
        c_ops.append(gsp * kron3(I2, _SM, Im))
    if dephasing_rate > 0:
        gph = np.sqrt(dephasing_rate / 2.0)
        c_ops.append(gph * kron3(SZ, I2, Im))
        c_ops.append(gph * kron3(I2, SZ, Im))

    meta = dict(g=g, n_loops=int(n_loops), delta_c=delta_c, tau=tau,
                n_fock=n_fock, nbar_cavity=nbar_cavity)
    return H, c_ops, tau, meta


def _ideal_exchange_unitary(phi_ee: float) -> np.ndarray:
    """U_ideal in basis (gg, ge, eg, ee): exact closure values."""
    U = np.zeros((4, 4), dtype=complex)
    U[0, 0] = 1.0
    U[2, 1] = -1.0
    U[1, 2] = -1.0
    U[3, 3] = np.exp(1j * phi_ee)
    return U


@dataclass
class CavityGateSimResult:
    """Spec contract (cavity_qed gate -> CPTP map + duration) + extras."""
    duration: float
    fidelity: float                  # avg gate fidelity vs U_ideal
    error_map_pauli: np.ndarray      # (16,) twirled 2-qubit error probs
    crosstalk: float                 # spectator-mode estimate (analytic)
    error_budget: Dict[str, float] = field(default_factory=dict)
    superop: Optional[np.ndarray] = None     # (16,16) qubit channel
    process_fidelity: float = 0.0
    completely_positive: bool = True
    trace_preserving: bool = True
    leakage: float = 0.0             # trace pushed past the Fock cutoff
    cphase_angle: float = 0.0        # entangling CPHASE content (phi_ee)
    cooperativity: float = 0.0
    parameters: Dict = field(default_factory=dict)

    def print_summary(self) -> None:
        print(f"cavity exchange gate: tau = {self.duration * 1e6:.2f} us, "
              f"F_avg = {self.fidelity:.6f}, C = {self.cooperativity:.0f}")
        for k, v in sorted(self.error_budget.items(),
                           key=lambda kv: -kv[1]):
            print(f"  {k:>22s}: {v:.2e}")


def simulate_cavity_gate(
    g: float = TWO_PI * 10e6,
    kappa: float = TWO_PI * 100e3,
    gamma_spont: float = TWO_PI * 30e3,
    dephasing_rate: float = 0.0,
    nbar_cavity: float = 0.0,
    cavity_drift_sigma: float = 0.0,
    n_loops: int = 9,
    n_fock: int = 6,
    neighbor_mode_splitting: float = 0.0,
    gh_points: int = 7,
    engine: str = "jax",
    include_budget: bool = True,
) -> CavityGateSimResult:
    """Simulate the closed photon-exchange gate through the Lindblad
    engine and extract the CPTP qubit channel.

    cavity_drift_sigma: rms of a QUASISTATIC cavity-frequency offset
    (Gauss-Hermite averaged, same machinery as the MS gate's motional
    dephasing) — slow mirror drift / thermal length noise.
    """
    from ..channels.conversions import (average_gate_fidelity, is_cptp,
                                        process_fidelity)
    from ..channels.pauli import twirled_error_probs
    from ..ops.lindblad import dissipator_superop, hamiltonian_superop

    if engine not in ("jax", "host"):
        raise ValueError("engine must be 'jax' or 'host'")

    def liouvillian_stack(kap, gam, deph, nb, drift_sigma):
        H, c_ops, tau, meta = build_jc_system(
            g=g, n_loops=n_loops, n_fock=n_fock, kappa=kap,
            gamma_spont=gam, dephasing_rate=deph, nbar_cavity=nb)
        D = H.shape[0]
        L = hamiltonian_superop(H) + dissipator_superop(c_ops, D)
        if drift_sigma > 0:
            num = np.diag(np.arange(n_fock, dtype=float)).astype(complex)
            LN = hamiltonian_superop(kron3(I2, I2, num))
            eps, w = gh_nodes(gh_points, drift_sigma)
            return np.stack([L + e * LN for e in eps]), w, tau, meta
        return L[None], np.ones(1), tau, meta

    cases = {"full": (kappa, gamma_spont, dephasing_rate, nbar_cavity,
                      cavity_drift_sigma)}
    if include_budget:
        cases.update({
            "floor": (0.0, 0.0, 0.0, 0.0, 0.0),
            "cavity_decay": (kappa, 0.0, 0.0, 0.0, 0.0),
            "spontaneous_emission": (0.0, gamma_spont, 0.0, 0.0, 0.0),
            "dephasing": (0.0, 0.0, dephasing_rate, 0.0, 0.0),
            "thermal_photons": (kappa, 0.0, 0.0, nbar_cavity, 0.0),
            "cavity_drift": (0.0, 0.0, 0.0, 0.0, cavity_drift_sigma),
        })

    delta_c, tau0 = exchange_closure_params(g, n_loops)
    amp_ee = _ee_return_amplitude(g, delta_c, tau0)
    phi_ee = float(np.angle(amp_ee))
    U_target = _ideal_exchange_unitary(phi_ee)

    fids: Dict[str, float] = {}
    chan_full = None
    tau = meta = None
    for name, (kap, gam, deph, nb, ds) in cases.items():
        Ls, w, tau, meta = liouvillian_stack(kap, gam, deph, nb, ds)
        rho_mode = thermal_state(n_fock, nb)
        if engine == "jax":
            S16 = qubit_channel_jax(Ls, np.asarray(w), tau, rho_mode,
                                    n_fock)
        else:
            props = propagators_host(Ls, tau)
            S16 = qubit_channel_host(props, w, rho_mode, n_fock)
        fids[name] = average_gate_fidelity(S16, U_target)
        if name == "full":
            chan_full = S16

    F = fids["full"]
    floor = 1.0 - fids.get("floor", 1.0)
    budget = {}
    if include_budget:
        budget = {k: max(0.0, (1.0 - fids[k]) - floor)
                  for k in ("cavity_decay", "spontaneous_emission",
                            "dephasing", "thermal_photons", "cavity_drift")}
        # thermal_photons already contains cavity_decay; report the excess
        budget["thermal_photons"] = max(
            0.0, budget["thermal_photons"] - budget["cavity_decay"])
        budget["model_floor"] = floor
    # spectator cavity mode (outside this Hilbert space): same
    # leading-order estimate style as the MS gate's spectator entry
    eps_spect = 0.0
    if neighbor_mode_splitting > 0:
        eps_spect = (g / neighbor_mode_splitting) ** 2
        budget["spectator_mode(analytic)"] = eps_spect

    cp, tp = is_cptp(chan_full)
    out_mm = (chan_full @ (np.eye(4).reshape(16) / 4.0)).reshape(4, 4)
    leak = float(max(0.0, 1.0 - np.real(np.trace(out_mm))))
    probs = twirled_error_probs(chan_full, U_target)
    C = (g ** 2 / (kappa * gamma_spont)
         if kappa > 0 and gamma_spont > 0 else float("inf"))

    params = dict(meta, kappa=kappa, gamma_spont=gamma_spont,
                  dephasing_rate=dephasing_rate,
                  cavity_drift_sigma=cavity_drift_sigma,
                  phi_ee=phi_ee, engine=engine)
    return CavityGateSimResult(
        duration=float(tau), fidelity=float(F),
        error_map_pauli=np.asarray(probs, dtype=float),
        crosstalk=float(eps_spect),
        error_budget=budget, superop=chan_full,
        process_fidelity=float(process_fidelity(chan_full, U_target)),
        completely_positive=bool(cp), trace_preserving=bool(tp),
        leakage=leak, cphase_angle=phi_ee,
        cooperativity=float(C) if np.isfinite(C) else -1.0,
        parameters=params)


def cavity_calibration_record(result: CavityGateSimResult, regime: str):
    """CalibrationRecord for the cavity backend (same store/schema as the
    Rydberg CZ and trapped-ion MS paths, calibration_data/README.md)."""
    from ..channels.calibration import (CalibrationRecord,
                                        _complex_matrix_to_json)
    from ..channels.conversions import pauli_basis
    labels, _ = pauli_basis(2)
    return CalibrationRecord(
        platform="cavity_qed",
        operation="exchange_gate",
        regime=regime,
        parameters={k: v for k, v in result.parameters.items()
                    if isinstance(v, (int, float, str, bool))},
        error_rates={
            "avg_gate_infidelity": 1.0 - result.fidelity,
            "process_infidelity": 1.0 - result.process_fidelity,
            "leakage_mean": result.leakage,
            "crosstalk": result.crosstalk,
        },
        duration=result.duration,
        pauli_error_probs=[float(p) for p in result.error_map_pauli],
        pauli_labels=list(labels),
        superop=_complex_matrix_to_json(result.superop),
        metadata={"generator": "noisyquantumsimulator_tpu.gate.cavity_gate",
                  "error_budget": {k: float(v) for k, v in
                                   result.error_budget.items()}},
    )
