"""Vectorized Pauli-frame sampler — the Stim-replacement engine.

TPU-native implementation of the reference's planned Clifford simulation
mode (reference: architecture/simulator.py:6-9 "Stim-based, Pauli frame
tracking, detector error models" — never implemented there).

Model: the frame (x, z) tracks a Pauli error relative to the ideal circuit.
All shots evolve simultaneously as (shots, n_qubits) uint8 arrays — pure
elementwise XOR/AND work that XLA maps onto the VPU; a full memory-
experiment sample is ONE jitted call. Measurement records are the frame's
x bits (a Z-basis measurement flips iff an X-type error is present) plus
classical flip noise; detectors/observables are GF(2) combinations of the
record matrix.

Frame randomization: after reset, the z frame is randomized (Stim's
trick making the frame distribution correct for circuits with resets).
"""
from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .circuits import Circuit, detector_matrix, observable_matrix


def _u8(x):
    return x.astype(jnp.uint8)


def _bern(key, p, shape):
    return _u8(jax.random.bernoulli(key, p, shape))


def _apply_gate(name, x, z, t):
    """Frame propagation through Clifford gates (heisenberg picture)."""
    if name in ("I", "X", "Z", "Y"):
        return x, z  # Paulis commute with the frame up to sign
    if name == "H":
        xt, zt = x[:, t], z[:, t]
        x = x.at[:, t].set(zt)
        z = z.at[:, t].set(xt)
        return x, z
    if name == "S":
        # X -> Y: z ^= x
        z = z.at[:, t].set(z[:, t] ^ x[:, t])
        return x, z
    if name == "CX":
        c, tt = t[:, 0], t[:, 1]
        x = x.at[:, tt].set(x[:, tt] ^ x[:, c])
        z = z.at[:, c].set(z[:, c] ^ z[:, tt])
        return x, z
    if name == "CZ":
        c, tt = t[:, 0], t[:, 1]
        z = z.at[:, tt].set(z[:, tt] ^ x[:, c])
        z = z.at[:, c].set(z[:, c] ^ x[:, tt])
        return x, z
    if name == "SWAP":
        a, b = t[:, 0], t[:, 1]
        xa, xb = x[:, a], x[:, b]
        za, zb = z[:, a], z[:, b]
        x = x.at[:, a].set(xb)
        x = x.at[:, b].set(xa)
        z = z.at[:, a].set(zb)
        z = z.at[:, b].set(za)
        return x, z
    raise ValueError(f"Unknown gate: {name}")


def _apply_channel(name, key, x, z, t, p, probs, shots):
    if name == "X_ERROR":
        x = x.at[:, t].set(x[:, t] ^ _bern(key, p, (shots, len(t))))
        return x, z
    if name == "Z_ERROR":
        z = z.at[:, t].set(z[:, t] ^ _bern(key, p, (shots, len(t))))
        return x, z
    if name == "DEPOLARIZE1":
        u = jax.random.uniform(key, (shots, len(t)))
        xf = _u8(u < 2.0 * p / 3.0)
        zf = _u8((u >= p / 3.0) & (u < p))
        x = x.at[:, t].set(x[:, t] ^ xf)
        z = z.at[:, t].set(z[:, t] ^ zf)
        return x, z
    if name == "DEPOLARIZE2":
        a, b = t[:, 0], t[:, 1]
        u = jax.random.uniform(key, (shots, len(a)))
        hit = u < p
        # error index 1..15 uniform: pa = idx // 4, pb = idx % 4
        idx = jnp.floor(u / jnp.maximum(p, 1e-30) * 15.0).astype(jnp.int32) + 1
        idx = jnp.where(hit, idx, 0)
        pa, pb = idx // 4, idx % 4
        x = x.at[:, a].set(x[:, a] ^ _u8((pa == 1) | (pa == 2)))
        z = z.at[:, a].set(z[:, a] ^ _u8((pa == 2) | (pa == 3)))
        x = x.at[:, b].set(x[:, b] ^ _u8((pb == 1) | (pb == 2)))
        z = z.at[:, b].set(z[:, b] ^ _u8((pb == 2) | (pb == 3)))
        return x, z
    if name == "PAULI_CHANNEL_2":
        a, b = t[:, 0], t[:, 1]
        cum = jnp.cumsum(jnp.asarray(probs, dtype=jnp.float32))
        u = jax.random.uniform(key, (shots, len(a), 1))
        idx = jnp.sum(_u8(u >= cum[None, None, :]).astype(jnp.int32), axis=-1)
        idx = jnp.clip(idx, 0, 15)
        pa, pb = idx // 4, idx % 4
        x = x.at[:, a].set(x[:, a] ^ _u8((pa == 1) | (pa == 2)))
        z = z.at[:, a].set(z[:, a] ^ _u8((pa == 2) | (pa == 3)))
        x = x.at[:, b].set(x[:, b] ^ _u8((pb == 1) | (pb == 2)))
        z = z.at[:, b].set(z[:, b] ^ _u8((pb == 2) | (pb == 3)))
        return x, z
    if name == "ERASE":
        # heralded loss -> fully depolarize (erasure conversion handled by
        # decoders via the heralds, which round 1 folds into depolarization)
        k1, k2 = jax.random.split(key)
        hit = _bern(k1, p, (shots, len(t)))
        u = jax.random.randint(k2, (shots, len(t), 2), 0, 2, dtype=jnp.uint8)
        x = x.at[:, t].set(x[:, t] ^ (hit & u[..., 0]))
        z = z.at[:, t].set(z[:, t] ^ (hit & u[..., 1]))
        return x, z
    raise ValueError(f"Unknown channel: {name}")


def build_sampler(circuit: Circuit, shots: int):
    """Compile the circuit into one jitted sampling function.

    Returns sample(key) -> dict with:
      detectors    (shots, n_detectors) uint8
      observables  (shots, n_observables) uint8
      measurements (shots, n_measurements) uint8
    """
    n = circuit.n_qubits
    Dmat = jnp.asarray(detector_matrix(circuit))
    Omat = jnp.asarray(observable_matrix(circuit))
    instructions = list(circuit.instructions)

    def sample(key):
        x = jnp.zeros((shots, n), dtype=jnp.uint8)
        z = jnp.zeros((shots, n), dtype=jnp.uint8)
        records: List[jnp.ndarray] = []
        for ins in instructions:
            name, t = ins.name, ins.targets
            if name in ("H", "S", "X", "Z", "Y", "I", "CX", "CZ", "SWAP"):
                x, z = _apply_gate(name, x, z, jnp.asarray(t))
            elif name in ("X_ERROR", "Z_ERROR", "DEPOLARIZE1", "DEPOLARIZE2",
                          "PAULI_CHANNEL_2", "ERASE"):
                key, k = jax.random.split(key)
                x, z = _apply_channel(name, k, x, z, jnp.asarray(t),
                                      ins.arg or 0.0, ins.probs, shots)
            elif name in ("M", "MR"):
                tt = jnp.asarray(t)
                rec = x[:, tt]
                if ins.arg:  # classical flip noise
                    key, k = jax.random.split(key)
                    rec = rec ^ _bern(k, ins.arg, rec.shape)
                records.append(rec)
                if name == "MR":
                    x = x.at[:, tt].set(0)
                    key, k = jax.random.split(key)
                    z = z.at[:, tt].set(
                        jax.random.randint(k, (shots, len(t)), 0, 2,
                                           dtype=jnp.uint8))
            elif name == "R":
                tt = jnp.asarray(t)
                x = x.at[:, tt].set(0)
                key, k = jax.random.split(key)
                z = z.at[:, tt].set(jax.random.randint(
                    k, (shots, len(t)), 0, 2, dtype=jnp.uint8))
            else:
                raise ValueError(f"Unknown instruction: {name}")

        meas = (jnp.concatenate(records, axis=1) if records
                else jnp.zeros((shots, 0), dtype=jnp.uint8))
        m32 = meas.astype(jnp.int32)
        dets = (m32 @ Dmat.T.astype(jnp.int32)) % 2 if Dmat.shape[0] else \
            jnp.zeros((shots, 0), dtype=jnp.uint8)
        obs = (m32 @ Omat.T.astype(jnp.int32)) % 2 if Omat.shape[0] else \
            jnp.zeros((shots, 0), dtype=jnp.uint8)
        return {"measurements": meas, "detectors": _u8(dets),
                "observables": _u8(obs)}

    return jax.jit(sample)


def sample_circuit(circuit: Circuit, shots: int, seed: int = 0) -> Dict:
    fn = build_sampler(circuit, shots)
    out = fn(jax.random.PRNGKey(seed))
    return {k: np.asarray(v) for k, v in out.items()}


__all__ = ["build_sampler", "sample_circuit"]
