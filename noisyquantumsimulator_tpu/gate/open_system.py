"""Shared open-system channel extraction for engine-driven gate sims.

Micro-physics gate engines (gate/ms_gate.py trapped ions, gate/
cavity_gate.py cavity QED) share one pipeline: assemble a rotating-frame
Liouvillian stack on qubit (x) qubit (x) bosonic-mode Hilbert space
(dim D = 4 n_mode), exponentiate each member through the solver's expm
family, project onto the 16 two-qubit operator-basis probes
|k><l| (x) rho_mode, and weight-sum into a (16, 16) qubit superoperator.
This module holds that pipeline plus the small operator/statistics
helpers both engines need.

Reference role: the micro-physics layer contract "gate model -> CPTP
map + duration" (/root/reference/src/qpu_simulator/micro_physics/
trapped_ions/qccd/gates.py:20-28 and .../cavity_qed/cavity_gates.py,
which names the same outputs for the cavity platform).
"""
from __future__ import annotations

import numpy as np

__all__ = ["SX", "SY", "SZ", "I2", "kron3", "thermal_state", "gh_nodes",
           "qubit_channel_jax", "qubit_channel_host", "propagators_host",
           "probe_basis"]

SX = np.array([[0.0, 1.0], [1.0, 0.0]], dtype=complex)
SY = np.array([[0.0, -1j], [1j, 0.0]], dtype=complex)
SZ = np.array([[1.0, 0.0], [0.0, -1.0]], dtype=complex)
I2 = np.eye(2, dtype=complex)


def kron3(op_q1: np.ndarray, op_q2: np.ndarray,
          op_m: np.ndarray) -> np.ndarray:
    """qubit1 (x) qubit2 (x) mode embedding."""
    return np.kron(np.kron(op_q1, op_q2), op_m)


def thermal_state(n_levels: int, nbar: float) -> np.ndarray:
    """Truncated thermal (geometric) mode state; vacuum at nbar <= 0."""
    if nbar <= 0:
        p = np.zeros(n_levels)
        p[0] = 1.0
    else:
        r = nbar / (1.0 + nbar)
        p = r ** np.arange(n_levels)
        p /= p.sum()
    return np.diag(p).astype(complex)


def gh_nodes(n: int, sigma: float):
    """Gauss-Hermite nodes/weights for averaging f(eps), eps~N(0,sigma^2)."""
    x, w = np.polynomial.hermite_e.hermegauss(n)
    return sigma * x, w / w.sum()


def probe_basis(rho_mode: np.ndarray, n_mode: int) -> np.ndarray:
    """Real (16, D^2) row-major vec of the inputs |k><l| (x) rho_mode
    (rho_mode is a real diagonal state, so every probe is real)."""
    D = 4 * n_mode
    rhos = np.zeros((16, D * D))
    for k in range(4):
        for l_ in range(4):
            q = np.zeros((4, 4))
            q[k, l_] = 1.0
            rhos[k * 4 + l_] = np.kron(q, rho_mode.real).reshape(-1)
    return rhos


def propagators_host(Ls: np.ndarray, tau: float) -> np.ndarray:
    """exp(L tau) for a stack of Liouvillians (M, D^2, D^2): the scipy
    complex128 oracle (engine="host")."""
    from scipy.linalg import expm as scipy_expm
    return np.stack([scipy_expm(L * tau) for L in Ls])


def qubit_channel_host(U_props: np.ndarray, weights: np.ndarray,
                       rho_mode: np.ndarray, n_mode: int) -> np.ndarray:
    """Average the propagator ensemble and project to the 2-qubit channel:
    S[:, 4k+l] = vec( Tr_mode[ U (|k><l| (x) rho_mode) ] ), row-major vec."""
    D = 4 * n_mode
    rhos = np.zeros((16, D, D), dtype=complex)
    for k in range(4):
        for l_ in range(4):
            q = np.zeros((4, 4), dtype=complex)
            q[k, l_] = 1.0
            rhos[k * 4 + l_] = np.kron(q, rho_mode)
    vec = rhos.reshape(16, D * D)
    S16 = np.zeros((16, 16), dtype=complex)
    for U, w in zip(U_props, weights):
        out = vec @ U.T                                 # (16, D^2)
        outm = out.reshape(16, 4, n_mode, 4, n_mode)
        q_out = np.einsum("binjn->bij", outm)            # trace mode
        S16 += w * q_out.reshape(16, 16).T               # column per input
    return S16


def qubit_channel_jax(Ls: np.ndarray, w: np.ndarray, tau: float,
                      rho_mode: np.ndarray, n_mode: int) -> np.ndarray:
    """engine="jax": the repo's device solver path — batched float64-PLANE
    expm (ops/expm.expm_planes, the same kernel behind the gate engine's
    on-device f64 parity tier; TPU rejects complex128 but emulates f64)
    plus the mode-trace projection ON DEVICE, weight-summed on device.

    Only the (16,16) channel planes cross the device->host link. That is
    load-bearing, not a nicety: the axon transport cannot move complex
    buffers at all (a (D^2, D^2) c64 get fails UNIMPLEMENTED; even a
    16x16 c64 get hangs — measured round 4), so the heavy operands must
    stay resident and the result must come home as float planes.
    """
    import jax
    import jax.numpy as jnp
    from ..ops.expm import expm_planes
    vec = probe_basis(rho_mode, n_mode)
    with jax.enable_x64(True):
        # per-node plane puts keep each host->device transfer ~(D^2)^2*8B
        Ur_l, Ui_l = [], []
        for m in range(Ls.shape[0]):
            Lr = jnp.asarray((Ls[m].real * tau).astype(np.float64))
            Li = jnp.asarray((Ls[m].imag * tau).astype(np.float64))
            r, i = expm_planes(Lr, Li)
            Ur_l.append(r)
            Ui_l.append(i)
        Ur = jnp.stack(Ur_l)
        Ui = jnp.stack(Ui_l)
        V = jnp.asarray(vec.astype(np.float64))
        wj = jnp.asarray(np.asarray(w, np.float64))
        # out[m, b, j] = (V @ U_m^T)[b, j]; trace the mode; weight-sum
        outr = jnp.einsum("bi,mji->mbj", V, Ur)
        outi = jnp.einsum("bi,mji->mbj", V, Ui)
        M = Ls.shape[0]
        shp = (M, 16, 4, n_mode, 4, n_mode)
        qr = jnp.einsum("m,mbinjn->bij", wj, outr.reshape(shp))
        qi = jnp.einsum("m,mbinjn->bij", wj, outi.reshape(shp))
        # column per input (the host path's .T)
        Sr = np.asarray(qr.reshape(16, 16).T)
        Si = np.asarray(qi.reshape(16, 16).T)
    return Sr + 1j * Si
