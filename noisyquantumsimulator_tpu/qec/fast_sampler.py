"""One-matmul stabilizer sampler: circuit-exact sampling on the MXU.

TPU-native redesign of Pauli-frame sampling (the engine the reference's
architecture stubs call "Stim-based, Pauli frame tracking"; reference:
architecture/simulator.py:6-9). The per-instruction sampler in
pauli_frame.py evolves frames with one scatter per gate — correct, but a
long chain of small HBM-bound kernels. This module exploits that frame
propagation is *linear over GF(2)*:

    detectors = (sum over fault sites e of  bit_e * signature_e)  mod 2

so the whole circuit collapses, at build time and on the host, into a
fault-site -> detector signature matrix F (n_sites x n_detectors). On
device, one sample is then

    1. draw the per-site fault bits E (pure VPU: uniforms + compares),
    2. detectors = (E @ F) & 1  -- ONE int8 matmul on the MXU.

The bit statistics are circuit-exact, not a DEM approximation: correlated
bits of a depolarizing channel (e.g. the X and Z flips of a Y outcome) are
derived from the *same* uniform draw exactly as in pauli_frame.py; only
their deterministic propagation is precomputed.

Reset frame-randomization bits (z-plane, p = 1/2) provably cancel in every
detector and observable, so they are never sampled here — build_fast_sampler
asserts their signatures are zero instead of paying for them.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .circuits import Circuit, detector_matrix, observable_matrix
from .dem import _propagate_faults


def build_fast_sampler(circuit: Circuit, shots: int):
    """Compile `circuit` into a single-matmul detector sampler.

    Returns sample(key) -> {"detectors": (shots, n_det) uint8,
                            "observables": (shots, n_obs) uint8}.
    Raw per-measurement records are not produced (use pauli_frame.py's
    sampler when you need them); QEC decoding only consumes detectors.
    """
    faults: List[Tuple] = []          # for _propagate_faults
    meas_flip_rows: List[Tuple[int, int]] = []  # (site row, record index)

    bern_p: List[float] = []
    dep1_p: List[float] = []
    dep2_p: List[float] = []          # uniform 15-outcome channels
    pair_cum: List[np.ndarray] = []   # general PAULI_CHANNEL_2 tables
    erase_p: List[float] = []

    # site rows are appended in group-block order; remember each block's rows
    rows_bern: List[int] = []
    rows_dep1_x: List[int] = []
    rows_dep1_z: List[int] = []
    rows_dep2: List[Tuple[int, int, int, int]] = []   # (xa, za, xb, zb)
    rows_pair: List[Tuple[int, int, int, int]] = []   # (xa, za, xb, zb)
    rows_erase_x: List[int] = []
    rows_erase_z: List[int] = []

    def new_site(ii: int, xq: Optional[int], zq: Optional[int]) -> int:
        row = len(faults)
        faults.append((ii, {xq: 1} if xq is not None else {},
                       {zq: 1} if zq is not None else {}))
        return row

    # measurement-record index per instruction
    rec_of_instr: Dict[int, int] = {}
    mc = 0
    for ii, ins in enumerate(circuit.instructions):
        if ins.name in ("M", "MR"):
            rec_of_instr[ii] = mc
            mc += len(ins.targets)

    for ii, ins in enumerate(circuit.instructions):
        name, t, p = ins.name, ins.targets, (ins.arg or 0.0)
        if name == "X_ERROR" and p > 0:
            for q in np.atleast_1d(t):
                rows_bern.append(new_site(ii, int(q), None))
                bern_p.append(p)
        elif name == "Z_ERROR" and p > 0:
            for q in np.atleast_1d(t):
                rows_bern.append(new_site(ii, None, int(q)))
                bern_p.append(p)
        elif name in ("M", "MR") and p > 0:
            for k, q in enumerate(np.atleast_1d(t)):
                row = new_site(ii, None, None)  # no Pauli propagation
                meas_flip_rows.append((row, rec_of_instr[ii] + k))
                rows_bern.append(row)
                bern_p.append(p)
        elif name == "DEPOLARIZE1" and p > 0:
            for q in np.atleast_1d(t):
                rows_dep1_x.append(new_site(ii, int(q), None))
                rows_dep1_z.append(new_site(ii, None, int(q)))
                dep1_p.append(p)
        elif name == "DEPOLARIZE2" and p > 0:
            for qa, qb in t:
                rows_dep2.append((new_site(ii, int(qa), None),
                                  new_site(ii, None, int(qa)),
                                  new_site(ii, int(qb), None),
                                  new_site(ii, None, int(qb))))
                dep2_p.append(p)
        elif name == "PAULI_CHANNEL_2":
            probs = np.asarray(ins.probs, dtype=np.float64)
            if probs[1:].sum() <= 0:
                continue
            for qa, qb in t:
                rows_pair.append((new_site(ii, int(qa), None),
                                  new_site(ii, None, int(qa)),
                                  new_site(ii, int(qb), None),
                                  new_site(ii, None, int(qb))))
                pair_cum.append(probs[1:].cumsum())
        elif name == "ERASE" and p > 0:
            for q in np.atleast_1d(t):
                rows_erase_x.append(new_site(ii, int(q), None))
                rows_erase_z.append(new_site(ii, None, int(q)))
                erase_p.append(p)

    n_sites = len(faults)
    Dmat = detector_matrix(circuit)
    Omat = observable_matrix(circuit)
    n_det, n_obs = Dmat.shape[0], Omat.shape[0]

    # reset-gauge sites (z-plane after every R/MR): must cancel in every
    # detector/observable for the one-matmul form to be exact. Verify.
    gauge_faults = []
    for ii, ins in enumerate(circuit.instructions):
        if ins.name in ("R", "MR"):
            for q in np.atleast_1d(ins.targets):
                gauge_faults.append((ii, {}, {int(q): 1}))
    if gauge_faults:
        gm = _propagate_faults(circuit, gauge_faults)
        gd = (gm.astype(np.int64) @ Dmat.T.astype(np.int64)) % 2
        go = (gm.astype(np.int64) @ Omat.T.astype(np.int64)) % 2
        if gd.any() or go.any():
            raise ValueError(
                "Circuit has non-deterministic detectors/observables "
                "(reset gauge reaches them); use pauli_frame.build_sampler")

    if n_sites:
        meas = _propagate_faults(circuit, faults)
        for row, rec in meas_flip_rows:
            meas[row, rec] ^= 1
        Fd = ((meas.astype(np.int64) @ Dmat.T.astype(np.int64)) % 2
              ).astype(np.int8)
        Fo = ((meas.astype(np.int64) @ Omat.T.astype(np.int64)) % 2
              ).astype(np.int8)
    else:
        Fd = np.zeros((0, n_det), np.int8)
        Fo = np.zeros((0, n_obs), np.int8)

    # device constants (float32 thresholds; int8 signature matrices)
    dev = {
        "bern_p": jnp.asarray(np.asarray(bern_p), jnp.float32),
        "dep1_p": jnp.asarray(np.asarray(dep1_p), jnp.float32),
        "dep2_p": jnp.asarray(np.asarray(dep2_p), jnp.float32),
        "pair_cum": jnp.asarray(
            np.asarray(pair_cum, dtype=np.float32).reshape(-1, 15)),
        "erase_p": jnp.asarray(np.asarray(erase_p), jnp.float32),
    }
    rows = {
        "bern": np.asarray(rows_bern, np.int32),
        "d1x": np.asarray(rows_dep1_x, np.int32),
        "d1z": np.asarray(rows_dep1_z, np.int32),
        "d2": np.asarray(rows_dep2, np.int32).reshape(-1, 4),
        "pair": np.asarray(rows_pair, np.int32).reshape(-1, 4),
        "erx": np.asarray(rows_erase_x, np.int32),
        "erz": np.asarray(rows_erase_z, np.int32),
    }
    # Because sites were appended in circuit order interleaved across groups,
    # reorder F rows into the order the device code emits its bit blocks:
    order = np.concatenate([
        rows["bern"],
        rows["d1x"], rows["d1z"],
        rows["d2"][:, 0], rows["d2"][:, 1],
        rows["d2"][:, 2], rows["d2"][:, 3],
        rows["pair"][:, 0], rows["pair"][:, 1],
        rows["pair"][:, 2], rows["pair"][:, 3],
        rows["erx"], rows["erz"],
    ]) if n_sites else np.zeros(0, np.int32)

    nb, n1 = len(bern_p), len(dep1_p)
    nd2, n2, ne = len(dep2_p), len(pair_cum), len(erase_p)

    # per-block F segments: the detector/observable dot runs PER bit block
    # and accumulates in int32 — materializing the concatenated (shots,
    # n_sites) fault matrix costs gigabytes of HBM traffic per call and
    # blocks XLA from fusing each RNG->compare chain into its own dot
    seg_sizes = [nb, n1, n1, nd2, nd2, nd2, nd2, n2, n2, n2, n2, ne, ne]
    Fd_ord, Fo_ord = Fd[order], Fo[order]
    splits = np.cumsum(seg_sizes)[:-1]
    dev["Fd_segs"] = [jnp.asarray(a) for a in np.split(Fd_ord, splits)
                      if a.shape[0]]
    dev["Fo_segs"] = [jnp.asarray(a) for a in np.split(Fo_ord, splits)
                      if a.shape[0]]

    def _pair_bits(idx, blocks):
        pa, pb = idx // 4, idx % 4
        blocks.append((pa == 1) | (pa == 2))                    # xa
        blocks.append((pa == 2) | (pa == 3))                    # za
        blocks.append((pb == 1) | (pb == 2))                    # xb
        blocks.append((pb == 2) | (pb == 3))                    # zb

    # erasure metadata for heralded decoding: detector/observable
    # signatures of each erase site's x- and z-fault (host numpy)
    erasure_meta = {
        "x_det": Fd[np.asarray(rows_erase_x, np.int32)] if rows_erase_x
        else np.zeros((0, n_det), np.int8),
        "z_det": Fd[np.asarray(rows_erase_z, np.int32)] if rows_erase_z
        else np.zeros((0, n_det), np.int8),
        "x_obs": Fo[np.asarray(rows_erase_x, np.int32)] if rows_erase_x
        else np.zeros((0, n_obs), np.int8),
        "z_obs": Fo[np.asarray(rows_erase_z, np.int32)] if rows_erase_z
        else np.zeros((0, n_obs), np.int8),
    }

    def _fast_key(key):
        """On TPU, re-key onto the XLA RngBitGenerator ('rbg') PRNG: the
        default threefry hash is compute-bound here (bit generation was
        ~60% of sampler time; with rbg the per-channel index math fuses
        into the bit generation for free). Other backends keep threefry."""
        if jax.default_backend() != "tpu":
            return key
        kd = key
        if jnp.issubdtype(getattr(key, "dtype", None), jax.dtypes.prng_key):
            kd = jax.random.key_data(key)
        # normalize ANY key-data width to the 4 uint32 words rbg wants
        # (threefry keys carry 2 words; a key already on rbg carries 4)
        kd = kd.reshape(-1).astype(jnp.uint32)
        reps = -(-4 // kd.shape[0])
        return jax.random.wrap_key_data(jnp.tile(kd, reps)[:4], impl="rbg")

    def sample(key):
        kb, k1, kd2, k2, ke, kf = jax.random.split(_fast_key(key), 6)
        blocks = []
        if nb:
            u = jax.random.uniform(kb, (shots, nb))
            blocks.append(u < dev["bern_p"])
        if n1:
            u = jax.random.uniform(k1, (shots, n1))
            p = dev["dep1_p"]
            blocks.append(u < 2.0 * p / 3.0)                    # x bits
            blocks.append((u >= p / 3.0) & (u < p))             # z bits
        if nd2:
            # uniform 15-outcome depolarizing pair channels: cheap index map
            u = jax.random.uniform(kd2, (shots, nd2))
            p = dev["dep2_p"]
            hit = u < p
            idx = jnp.floor(u / jnp.maximum(p, 1e-30) * 15.0
                            ).astype(jnp.int32) + 1
            _pair_bits(jnp.where(hit, jnp.minimum(idx, 15), 0), blocks)
        if n2:
            # general two-qubit Pauli channels: cumulative table lookup
            u = jax.random.uniform(k2, (shots, n2, 1))
            idx = jnp.sum((u >= dev["pair_cum"][None]).astype(jnp.int32),
                          axis=-1)
            hit = u[..., 0] < dev["pair_cum"][:, -1]
            _pair_bits(jnp.where(hit, idx + 1, 0), blocks)
        heralds = jnp.zeros((shots, ne), jnp.uint8)
        if ne:
            u = jax.random.uniform(ke, (shots, ne))
            bits = jax.random.randint(kf, (shots, ne, 2), 0, 2,
                                      dtype=jnp.uint8)
            hit = u < dev["erase_p"]
            heralds = hit.astype(jnp.uint8)   # erasures announce themselves
            blocks.append(hit & (bits[..., 0] > 0))
            blocks.append(hit & (bits[..., 1] > 0))
        if not blocks:
            zero = jnp.zeros((shots, n_det), jnp.uint8)
            return {"detectors": zero,
                    "observables": jnp.zeros((shots, n_obs), jnp.uint8),
                    "heralds": heralds}

        # int8 operands feed the MXU on TPU; XLA's CPU backend has a
        # lowering bug for some int8 dot fusions, so use int32 there.
        # One dot per bit block (accumulated in int32) instead of a
        # concatenated fault matrix: no multi-GB E materialization, and
        # each block's RNG->compare chain fuses into its own dot.
        edt = (jnp.int8 if jax.default_backend() == "tpu" else jnp.int32)
        dets = jnp.zeros((shots, n_det), jnp.int32)
        obs = jnp.zeros((shots, n_obs), jnp.int32)
        for b, Fd_s, Fo_s in zip(blocks, dev["Fd_segs"], dev["Fo_segs"]):
            eb = b.astype(edt)
            dets = dets + jax.lax.dot_general(
                eb, Fd_s, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            obs = obs + jax.lax.dot_general(
                eb, Fo_s, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        return {"detectors": (dets & 1).astype(jnp.uint8),
                "observables": (obs & 1).astype(jnp.uint8),
                "heralds": heralds}

    fn = jax.jit(sample)
    fn.erasure_meta = erasure_meta
    return fn


def sample_circuit_fast(circuit: Circuit, shots: int, seed: int = 0) -> Dict:
    fn = build_fast_sampler(circuit, shots)
    out = fn(jax.random.PRNGKey(seed))
    return {k: np.asarray(v) for k, v in out.items()}


__all__ = ["build_fast_sampler", "sample_circuit_fast"]
