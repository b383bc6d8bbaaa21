"""Exact circuit-level simulators: density-matrix CPTP and trajectories.

Implements the remaining two of the reference's four planned simulation
modes (reference: architecture/simulator.py:5-30 — "Stim Clifford,
state-vector, density-matrix (CPTP application), Monte-Carlo error
sampling"; the Clifford/Pauli-frame modes live in qec/pauli_frame.py and
qec/fast_sampler.py). Both engines consume the SAME Circuit IR as the
stabilizer samplers, so any small circuit can be cross-validated exactly.

DensityMatrixSimulator — exact CPTP evolution of rho (2^n x 2^n):
    unitaries as tensor contractions on the (2,)*2n reshaped rho; noise
    channels applied in Kraus/Pauli-mixture form. n <= ~7 qubits.

TrajectorySimulator — vmapped state-vector Monte Carlo:
    every trajectory holds a (2^n,) state; Pauli channels sample a branch
    per trajectory, measurements sample outcomes (Born rule) with the
    inverse-CDF trick under jit. Whole batches of trajectories evolve in
    one jitted call — the MC analog of the frame sampler with full
    non-Clifford support.

TPU notes: states are (T, 2^n) complex batches — gate application is a
batched matmul over the target-axis reshape, which XLA maps onto the MXU
for large T. Static circuit structure -> the instruction loop unrolls at
trace time.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from typing import TYPE_CHECKING

if TYPE_CHECKING:  # Circuit is only an annotation; a runtime import would
    from ..qec.circuits import Circuit  # cycle solver -> qec -> executor

_H = np.array([[1, 1], [1, -1]], dtype=np.complex64) / np.sqrt(2)
_S = np.diag([1, 1j]).astype(np.complex64)
_X = np.array([[0, 1], [1, 0]], dtype=np.complex64)
_Y = np.array([[0, -1j], [1j, 0]], dtype=np.complex64)
_Z = np.diag([1, -1]).astype(np.complex64)
_I = np.eye(2, dtype=np.complex64)
_CX = np.eye(4, dtype=np.complex64)[[0, 1, 3, 2]]
_CZ = np.diag([1, 1, 1, -1]).astype(np.complex64)
_SWAP = np.eye(4, dtype=np.complex64)[[0, 2, 1, 3]]

_GATES1 = {"H": _H, "S": _S, "X": _X, "Y": _Y, "Z": _Z, "I": _I}
_GATES2 = {"CX": _CX, "CZ": _CZ, "SWAP": _SWAP}
_PAULI1 = (_I, _X, _Y, _Z)


def _apply_1q(psi, U, q, n):
    """psi (..., 2^n); apply U on qubit q (qubit 0 = most significant)."""
    shape = psi.shape
    psi = psi.reshape(shape[:-1] + (1 << q, 2, 1 << (n - q - 1)))
    psi = jnp.einsum("ab,...bk->...ak", U, psi)
    return psi.reshape(shape)


def _apply_2q(psi, U, qa, qb, n):
    if qa > qb:
        # reorder via U conjugated by SWAP on its own indices
        U = U.reshape(2, 2, 2, 2).transpose(1, 0, 3, 2).reshape(4, 4)
        qa, qb = qb, qa
    shape = psi.shape
    psi = psi.reshape(shape[:-1] + (1 << qa, 2, 1 << (qb - qa - 1), 2,
                                    1 << (n - qb - 1)))
    U4 = U.reshape(2, 2, 2, 2)
    psi = jnp.einsum("acbd,...bjdk->...ajck", U4, psi)
    return psi.reshape(shape)


class DensityMatrixSimulator:
    """Exact CPTP density-matrix evolution of a Circuit (n <= ~7).

    run() -> {"rho": (2^n, 2^n), "measurement_probs": list of per-M
    marginal p(1) arrays}. Measurements are treated as dephasing +
    recorded marginals (the exact ensemble view); R projects to |0>."""

    def __init__(self, circuit: 'Circuit'):
        self.circuit = circuit
        self.n = circuit.n_qubits
        if self.n > 12:
            raise ValueError(f"density-matrix sim limited to 12 qubits, "
                             f"got {self.n}")

    def run(self) -> Dict:
        n = self.n
        dim = 1 << n
        rho = jnp.zeros((dim, dim), dtype=jnp.complex64)
        rho = rho.at[0, 0].set(1.0)

        # U rho U^dag as two leg contractions: vmap the ket-application
        # over the opposite density-matrix leg
        def L1(rho, U, q):
            f = lambda col: _apply_1q(col, jnp.asarray(U), q, n)
            rho = jax.vmap(f, in_axes=1, out_axes=1)(rho)      # U rho
            g = lambda row: _apply_1q(row, jnp.asarray(U).conj(), q, n)
            return jax.vmap(g, in_axes=0, out_axes=0)(rho)     # ... U^dag

        def L2(rho, U, qa, qb):
            f = lambda col: _apply_2q(col, jnp.asarray(U), qa, qb, n)
            rho = jax.vmap(f, in_axes=1, out_axes=1)(rho)
            g = lambda row: _apply_2q(row, jnp.asarray(U).conj(), qa, qb, n)
            return jax.vmap(g, in_axes=0, out_axes=0)(rho)

        def pauli_mix1(rho, q, probs4):
            out = probs4[0] * rho
            for k in (1, 2, 3):
                out = out + probs4[k] * L1(rho, _PAULI1[k], q)
            return out

        def z1_probs(rho, q):
            """p(measure 1) on qubit q from the diagonal."""
            diag = jnp.real(jnp.diagonal(rho))
            bits = (jnp.arange(dim) >> (n - q - 1)) & 1
            return jnp.sum(diag * bits)

        def project_reset(rho, q):
            """Measure-and-reset to |0> (trace out the outcome)."""
            P0 = np.diag([1, 0]).astype(np.complex64)
            P1 = np.diag([0, 1]).astype(np.complex64)
            r0 = L1(rho, P0, q)
            r1 = L1(rho, P1, q)
            return r0 + L1(r1, _X, q)   # outcome-1 branch flipped to |0>

        meas_probs: List = []
        for ins in self.circuit.instructions:
            name, t = ins.name, ins.targets
            p = ins.arg or 0.0
            if name in _GATES1:
                for q in np.atleast_1d(t):
                    rho = L1(rho, _GATES1[name], int(q))
            elif name in _GATES2:
                for qa, qb in t:
                    rho = L2(rho, _GATES2[name], int(qa), int(qb))
            elif name == "X_ERROR" and p > 0:
                for q in np.atleast_1d(t):
                    rho = pauli_mix1(rho, int(q),
                                     jnp.asarray([1 - p, p, 0, 0]))
            elif name == "Z_ERROR" and p > 0:
                for q in np.atleast_1d(t):
                    rho = pauli_mix1(rho, int(q),
                                     jnp.asarray([1 - p, 0, 0, p]))
            elif name == "DEPOLARIZE1" and p > 0:
                for q in np.atleast_1d(t):
                    rho = pauli_mix1(rho, int(q),
                                     jnp.asarray([1 - p, p / 3, p / 3,
                                                  p / 3]))
            elif name in ("DEPOLARIZE2", "PAULI_CHANNEL_2"):
                if name == "DEPOLARIZE2":
                    probs = np.full(16, p / 15.0)
                    probs[0] = 1 - p
                else:
                    probs = np.asarray(ins.probs, dtype=np.float64)
                if probs[1:].sum() <= 0:
                    continue
                for qa, qb in t:
                    acc = probs[0] * rho
                    for idx in range(1, 16):
                        if probs[idx] <= 0:
                            continue
                        pa, pb = idx // 4, idx % 4
                        r = rho
                        if pa:
                            r = L1(r, _PAULI1[pa], int(qa))
                        if pb:
                            r = L1(r, _PAULI1[pb], int(qb))
                        acc = acc + probs[idx] * r
                    rho = acc
            elif name in ("M", "MR"):
                for q in np.atleast_1d(t):
                    pm = z1_probs(rho, int(q))
                    if p > 0:   # classical flip noise on the record
                        pm = pm * (1 - p) + (1 - pm) * p
                    meas_probs.append(pm)
                    # dephase in Z (measurement backaction on the ensemble)
                    rho = 0.5 * (rho + L1(rho, _Z, int(q)))
                if name == "MR":
                    for q in np.atleast_1d(t):
                        rho = project_reset(rho, int(q))
            elif name == "R":
                for q in np.atleast_1d(t):
                    rho = project_reset(rho, int(q))
            elif name == "ERASE" and p > 0:
                for q in np.atleast_1d(t):
                    rho = pauli_mix1(rho, int(q),
                                     jnp.asarray([1 - 3 * p / 4, p / 4,
                                                  p / 4, p / 4]))
        return {"rho": rho,
                "measurement_probs": jnp.stack(meas_probs)
                if meas_probs else jnp.zeros((0,))}


class TrajectorySimulator:
    """Vmapped state-vector Monte Carlo over a Circuit.

    sample(key) -> {"measurements": (T, n_meas) uint8} — per-trajectory
    sampled records, directly comparable with the Pauli-frame samplers."""

    def __init__(self, circuit: 'Circuit', trajectories: int = 1024):
        self.circuit = circuit
        self.n = circuit.n_qubits
        self.T = trajectories
        if self.n > 14:
            raise ValueError("trajectory sim limited to 14 qubits")
        self._fn = jax.jit(self._build())

    def _build(self):
        n, dim, T = self.n, 1 << self.n, self.T
        instructions = list(self.circuit.instructions)

        def sample(key):
            psi = jnp.zeros((T, dim), dtype=jnp.complex64)
            psi = psi.at[:, 0].set(1.0)
            records = []

            def bit_of(q):
                return (jnp.arange(dim) >> (n - q - 1)) & 1

            def sample_z(psi, q, key):
                p1 = jnp.sum(jnp.abs(psi) ** 2 * bit_of(q)[None, :], axis=1)
                u = jax.random.uniform(key, (T,))
                m = (u < p1).astype(jnp.uint8)
                mask = jnp.where((bit_of(q)[None, :] == m[:, None]), 1.0, 0.0)
                psi = psi * mask
                norm = jnp.sqrt(jnp.sum(jnp.abs(psi) ** 2, axis=1,
                                        keepdims=True))
                return psi / jnp.maximum(norm, 1e-30), m

            def apply_pauli_sampled(psi, q, kinds):
                """kinds: (T,) 0..3 -> apply I/X/Y/Z per trajectory."""
                b = bit_of(q)[None, :]
                flip = (kinds == 1) | (kinds == 2)
                phase = (kinds == 2) | (kinds == 3)
                # X part: swap amplitudes along axis q
                psi_x = _apply_1q(psi, jnp.asarray(_X), q, n)
                psi = jnp.where(flip[:, None], psi_x, psi)
                # Z part: phase on |1> component (Y = iXZ up to global phase)
                zsign = jnp.where(b == 1, -1.0, 1.0)
                psi = jnp.where(phase[:, None], psi * zsign, psi)
                return psi

            for ins in instructions:
                name, t = ins.name, ins.targets
                p = ins.arg or 0.0
                if name in _GATES1:
                    for q in np.atleast_1d(t):
                        psi = _apply_1q(psi, jnp.asarray(_GATES1[name]),
                                        int(q), n)
                elif name in _GATES2:
                    for qa, qb in t:
                        psi = _apply_2q(psi, jnp.asarray(_GATES2[name]),
                                        int(qa), int(qb), n)
                elif name in ("X_ERROR", "Z_ERROR") and p > 0:
                    kind = 1 if name == "X_ERROR" else 3
                    for q in np.atleast_1d(t):
                        key, k = jax.random.split(key)
                        hit = jax.random.bernoulli(k, p, (T,))
                        psi = apply_pauli_sampled(
                            psi, int(q),
                            jnp.where(hit, kind, 0).astype(jnp.int32))
                elif name == "DEPOLARIZE1" and p > 0:
                    for q in np.atleast_1d(t):
                        key, k = jax.random.split(key)
                        u = jax.random.uniform(k, (T,))
                        kinds = jnp.clip(
                            jnp.floor(u / (p / 3.0)).astype(jnp.int32) + 1,
                            0, 3)
                        kinds = jnp.where(u < p, kinds, 0)
                        psi = apply_pauli_sampled(psi, int(q), kinds)
                elif name in ("DEPOLARIZE2", "PAULI_CHANNEL_2") and (
                        name == "PAULI_CHANNEL_2" or p > 0):
                    if name == "DEPOLARIZE2":
                        cum = np.cumsum(np.full(15, p / 15.0))
                    else:
                        cum = np.cumsum(np.asarray(ins.probs)[1:])
                        if cum[-1] <= 0:
                            continue
                    cumj = jnp.asarray(cum, jnp.float32)
                    for qa, qb in t:
                        key, k = jax.random.split(key)
                        u = jax.random.uniform(k, (T, 1))
                        idx = jnp.sum((u >= cumj[None, :]).astype(jnp.int32),
                                      axis=1)
                        idx = jnp.where(u[:, 0] < cumj[-1], idx + 1, 0)
                        psi = apply_pauli_sampled(psi, int(qa), idx // 4)
                        psi = apply_pauli_sampled(psi, int(qb), idx % 4)
                elif name in ("M", "MR"):
                    for q in np.atleast_1d(t):
                        key, k = jax.random.split(key)
                        psi, m = sample_z(psi, int(q), k)
                        if p > 0:
                            key, k2 = jax.random.split(key)
                            m = m ^ jax.random.bernoulli(
                                k2, p, (T,)).astype(jnp.uint8)
                        records.append(m)
                    if name == "MR":
                        for q in np.atleast_1d(t):
                            # reset: flip |1> outcomes back to |0>
                            b1 = jnp.sum(jnp.abs(psi) ** 2
                                         * bit_of(int(q))[None, :], axis=1)
                            need = (b1 > 0.5).astype(jnp.int32)
                            psi = apply_pauli_sampled(psi, int(q), need)
                elif name == "R":
                    for q in np.atleast_1d(t):
                        key, k = jax.random.split(key)
                        psi, m = sample_z(psi, int(q), k)
                        psi = apply_pauli_sampled(psi, int(q),
                                                  m.astype(jnp.int32))
                elif name == "ERASE" and p > 0:
                    for q in np.atleast_1d(t):
                        key, k = jax.random.split(key)
                        u = jax.random.uniform(k, (T,))
                        kinds = jnp.clip(
                            jnp.floor(u / (p / 4.0)).astype(jnp.int32), 0, 3)
                        kinds = jnp.where(u < 3 * p / 4, kinds + 1, 0)
                        psi = apply_pauli_sampled(psi, int(q),
                                                  jnp.minimum(kinds, 3))

            meas = (jnp.stack(records, axis=1) if records
                    else jnp.zeros((T, 0), jnp.uint8))
            return {"measurements": meas}

        return sample

    def sample(self, key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        return self._fn(key)


__all__ = ["DensityMatrixSimulator", "TrajectorySimulator"]
