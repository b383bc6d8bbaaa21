"""Schedule executor: the reference's full simulation loop.

Implements the loop the reference's simulator stub describes
(reference: architecture/simulator.py:22-30 — "load schedule, apply
operations with errors, track syndromes, decode, report metrics"):
consume a CompiledCircuit from the compiler, price every scheduled
operation with the Layer-1 primitive error models (which themselves come
from the Layer-0 Lindblad calibration), inject the resulting Pauli
channels into a Circuit, and run it through the stochastic engine.

The executor performs errors-only frame Monte Carlo: gate unitaries act
as the ideal circuit (the frame tracks deviations), so arbitrary-angle
rz/rxy are supported — their CONTRIBUTION is their error channel, which
is exactly what architecture-level studies need. Full-unitary simulation
of small compiled circuits is available through
solver.circuit_sim.TrajectorySimulator on the same emitted Circuit when
the gate set is Clifford.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from .circuits import Circuit


@dataclass
class ExecutionResult:
    """(simulator.py:28-30 'report metrics')"""
    shots: int
    n_ops: int
    total_time: float                    # schedule makespan [s]
    p_any_error: float                   # P(any residual Pauli on any qubit)
    per_qubit_flip_rate: np.ndarray      # (n,) X-or-Y rate at end
    per_qubit_phase_rate: np.ndarray     # (n,) Z-or-Y rate at end
    error_budget: Dict[str, float] = field(default_factory=dict)

    def summary(self) -> str:
        worst = int(np.argmax(self.per_qubit_flip_rate))
        return (f"ExecutionResult: {self.n_ops} ops, "
                f"T={self.total_time*1e6:.1f} us, "
                f"P(any error)={self.p_any_error:.4f}, worst qubit "
                f"{worst} flip={self.per_qubit_flip_rate[worst]:.4f}")


def compiled_to_error_circuit(compiled, backend=None,
                              cz_pauli_probs: Optional[np.ndarray] = None,
                              p1: Optional[float] = None,
                              p_meas: Optional[float] = None,
                              t1: float = 4.0, t2: float = 1.0) -> Circuit:
    """Emit the errors-only Circuit for a CompiledCircuit.

    Error sources per op (all overridable):
      rz     — virtual (frame rotation): error-free
      rxy    — depolarizing from the SingleQubitGate fidelity
      cz     — calibrated 16-entry Pauli channel (Layer-0 -> Layer-1)
      measure— record flip + reset
      idle   — T1/T2 Pauli rates over each qubit's idle windows
    """
    ms_pauli_probs = None
    if backend is not None:
        if cz_pauli_probs is None:
            cz = backend.cz()
            cz_pauli_probs = np.asarray(cz.pauli_error_probs)
        # platform-native MS channel (IonBackend): price "ms" ops with
        # the calibrated MS Pauli probs, not the derived-CZ ones
        if hasattr(backend, "ms"):
            ms_pauli_probs = np.asarray(backend.ms().pauli_error_probs)
        if p1 is None:
            sq = backend.rx(0, np.pi / 2)
            p1 = max(0.0, 1.0 - sq.fidelity)
        if p_meas is None:
            p_meas = max(0.0, 1.0 - backend.measure().fidelity)
        t1, t2 = backend.T1, backend.T2
    cz_pauli_probs = (np.asarray(cz_pauli_probs) if cz_pauli_probs
                      is not None else None)
    p1 = 1e-4 if p1 is None else p1
    p_meas = 2e-3 if p_meas is None else p_meas

    n = 1 + max((max(op.qubits) for op in compiled.ops
                 if op.qubits), default=0)
    c = Circuit(n_qubits=n)
    for op in compiled.ops:
        name = op.name.lower()
        if name == "rz":
            continue                     # virtual
        if name in ("rxy", "rx", "ry", "sq"):
            c.append("DEPOLARIZE1", list(op.qubits), arg=p1)
        elif name in ("cz", "cx", "ms"):
            pair = np.asarray([list(op.qubits)], dtype=np.int32)
            probs2 = (ms_pauli_probs if (name == "ms"
                                         and ms_pauli_probs is not None)
                      else cz_pauli_probs)
            if probs2 is not None:
                c.append("PAULI_CHANNEL_2", pair, probs=probs2)
            else:
                c.append("DEPOLARIZE2", pair, arg=10 * p1)
        elif name in ("m", "measure", "mr", "readout"):
            c.append("MR", list(op.qubits), arg=p_meas)
        elif name in ("move", "cool", "i", "idle"):
            pass                         # captured by idle windows below

    # idle-window dephasing from the schedule
    # (lazy import: channels/__init__ reaches gate.simulate via tomography,
    # which would cycle back through solver -> qec at import time)
    from ..channels.pauli import t1_t2_to_pauli_rates
    if compiled.schedule is not None:
        for q, idle_s in compiled.schedule.idle_time_per_qubit.items():
            if idle_s <= 0 or q >= n:
                continue
            px, py, pz = t1_t2_to_pauli_rates(t1, t2, idle_s)
            c.append("X_ERROR", [q], arg=px + py)
            c.append("Z_ERROR", [q], arg=pz + py)
    return c


def execute(compiled, backend=None, shots: int = 10000, seed: int = 0,
            **noise_kw) -> ExecutionResult:
    """Run the full loop: schedule -> error circuit -> frame MC -> metrics."""
    import jax
    import jax.numpy as jnp
    from .pauli_frame import _apply_channel, _bern

    circuit = compiled_to_error_circuit(compiled, backend, **noise_kw)
    n = circuit.n_qubits

    # errors-only frame Monte Carlo (no records needed): evolve x/z frames
    # through the channel instructions; gates are ideal
    def run(key):
        x = jnp.zeros((shots, n), dtype=jnp.uint8)
        z = jnp.zeros((shots, n), dtype=jnp.uint8)
        for ins in circuit.instructions:
            nm, t = ins.name, ins.targets
            if nm in ("X_ERROR", "Z_ERROR", "DEPOLARIZE1", "DEPOLARIZE2",
                      "PAULI_CHANNEL_2", "ERASE"):
                key, k = jax.random.split(key)
                x, z = _apply_channel(nm, k, x, z, jnp.asarray(t),
                                      ins.arg or 0.0, ins.probs, shots)
            elif nm == "MR":
                tt = jnp.asarray(t)
                key, k = jax.random.split(key)
                x = x.at[:, tt].set(0)
                z = z.at[:, tt].set(0)
        return x, z

    x, z = jax.jit(run)(jax.random.PRNGKey(seed))
    x = np.asarray(x)
    z = np.asarray(z)
    any_err = float(np.mean((x | z).any(axis=1)))
    total_time = (compiled.schedule.total_time
                  if compiled.schedule is not None else 0.0)
    budget: Dict[str, float] = {}
    for op in compiled.ops:
        budget[op.name] = budget.get(op.name, 0.0) + 1.0
    return ExecutionResult(
        shots=shots, n_ops=len(compiled.ops), total_time=total_time,
        p_any_error=any_err,
        per_qubit_flip_rate=x.mean(axis=0),
        per_qubit_phase_rate=z.mean(axis=0),
        error_budget=budget)


__all__ = ["ExecutionResult", "compiled_to_error_circuit", "execute"]
