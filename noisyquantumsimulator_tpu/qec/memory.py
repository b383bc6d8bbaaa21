"""End-to-end QEC memory experiments: sample -> decode -> logical error rate.

The reference's planned simulation flow (architecture/simulator.py:22-30):
"load schedule, apply operations with errors, track syndromes, decode,
report metrics" — implemented here as one device-side sampling call plus
one device-side decoding call, with ICI sharding for multi-chip
Monte-Carlo (parallel/mesh.py).
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Dict, Optional

import numpy as np
import jax

from .circuits import Circuit
from .decoders import decoder_for_circuit
from .fast_sampler import build_fast_sampler
from .pauli_frame import build_sampler
from .surface_code import logical_error_rate, memory_z_circuit


@dataclass
class MemoryResult:
    d: int
    rounds: int
    p: float
    shots: int
    n_logical_errors: int
    p_logical_shot: float
    p_logical_round: float
    sample_seconds: float
    decode_seconds: float
    shots_per_second: float
    detector_fraction: float
    decoder: str
    extras: Dict = field(default_factory=dict)

    def __repr__(self):
        return (f"MemoryResult(d={self.d}, rounds={self.rounds}, p={self.p}, "
                f"shots={self.shots}, p_L/shot={self.p_logical_shot:.2e}, "
                f"p_L/round={self.p_logical_round:.2e}, "
                f"{self.shots_per_second:.0f} shots/s)")


def run_memory(
    d: int = 3,
    rounds: Optional[int] = None,
    p: float = 1e-3,
    shots: int = 10000,
    noise: str = "circuit",
    cz_pauli_probs: Optional[np.ndarray] = None,
    decoder: str = "auto",
    seed: int = 0,
    circuit: Optional[Circuit] = None,
    max_defects: int = 32,
    sampler_kind: str = "fast",
    basis: str = "Z",
) -> MemoryResult:
    """Surface-code memory experiment (basis="Z" or "X").

    sampler_kind: "fast" uses the one-matmul MXU sampler
    (fast_sampler.py); "frame" the per-instruction Pauli-frame sampler.
    Both are circuit-exact; "fast" falls back to "frame" automatically for
    circuits with non-deterministic detectors.
    """
    rounds = rounds if rounds is not None else d
    built_here = circuit is None
    if circuit is None:
        if basis.upper() == "X":
            from .surface_code import memory_x_circuit
            circuit = memory_x_circuit(d, rounds, noise=noise, p=p,
                                       cz_pauli_probs=cz_pauli_probs)
        elif basis.upper() == "Z":
            circuit = memory_z_circuit(d, rounds, noise=noise, p=p,
                                       cz_pauli_probs=cz_pauli_probs)
        else:
            raise ValueError(f"basis must be 'Z' or 'X', got {basis!r}")

    if decoder == "auto":
        if d >= 9:
            # the per-shot defect count blows any fixed exact-DP budget
            # at scale; on-device exact cluster decomposition
            # (cluster_matcher.py) bounds per-DP counts by component
            # size instead. With the native library present, the rare
            # shots the device cannot certify (a component beyond the
            # K=12 DP budget, ~1e-3 below threshold) escalate to the
            # host exact cluster decoder — true MWPM at any distance.
            from .native import native_available
            decoder = ("cluster_native" if native_available()
                       else "cluster")
        else:
            # native exact-MWPM (<=12 defects, greedy beyond) when
            # built: strictly better accuracy AND ~1000x faster than
            # the batched greedy for host-side decoding
            from .native import native_available
            decoder = "native" if native_available() else "matching"

    if sampler_kind == "fast":
        try:
            sampler = build_fast_sampler(circuit, shots)
        except ValueError:
            sampler = build_sampler(circuit, shots)
    else:
        sampler = build_sampler(circuit, shots)
    if decoder in ("cluster", "cluster_native"):
        # exact cluster decomposition on device; circuit-agnostic (only
        # needs the DEM, not round labels)
        from .cluster_matcher import cluster_matcher_for_circuit
        cchunk = min(4096 if circuit.n_detectors <= 512 else 2048,
                     max(256, shots))
        dec = cluster_matcher_for_circuit(
            circuit, chunk=cchunk, escalating=decoder == "cluster_native")
    elif decoder in ("window", "window_native"):
        if not built_here:
            raise ValueError(
                f"decoder={decoder!r} needs the round labels of a memory "
                "circuit built by run_memory itself; for external "
                "circuits construct qec.window_matcher_for_circuit (or "
                "qec.escalating_matcher_for_circuit) with your own "
                "det_round labels")
        from .surface_code import memory_detector_rounds
        det_round = memory_detector_rounds(d, rounds, basis=basis)
        K_dp = min(12, max_defects)
        wchunk = min(4096, max(256, shots))
        # W=7, C=3: the 4-round commit buffer is what makes windowed
        # decoding oracle-exact in practice (buffer-3 geometries measured
        # 1.4x the true-MWPM p_L at d=7; examples/decoder_accuracy.json),
        # and the 3-window unrolled jit compiles where 5-window programs
        # crash the tunneled TPU worker
        W, C = (7, 3) if rounds >= 5 else (5, 2)
        if decoder == "window_native":
            # over-budget windows flag the shot for host exact cluster
            # re-decode (no greedy tier anywhere)
            from .window_matcher import escalating_matcher_for_circuit
            dec = escalating_matcher_for_circuit(
                circuit, det_round, window_rounds=W, commit_rounds=C,
                max_defects=K_dp, k_light=6 if K_dp > 6 else 0,
                chunk=wchunk, heavy_capacity=max(wchunk // 16, 64))
        else:
            # pure-device path: max_defects maps onto the budget-free
            # tier — the per-window exact DP stays at min(12,
            # max_defects); anything past the DP budget goes to the
            # greedy tier with the user's full budget
            from .window_matcher import window_matcher_for_circuit
            dec = window_matcher_for_circuit(
                circuit, det_round, window_rounds=W, commit_rounds=C,
                max_defects=K_dp, k_light=6 if K_dp > 6 else 0,
                greedy_fallback=max_defects if max_defects > K_dp else 0,
                chunk=wchunk)
    else:
        dec = decoder_for_circuit(circuit, kind=decoder,
                                  max_defects=max_defects)

    # compile outside the timed region
    out = sampler(jax.random.PRNGKey(seed))
    out["detectors"].block_until_ready()

    t0 = time.perf_counter()
    out = sampler(jax.random.PRNGKey(seed + 1))
    out["detectors"].block_until_ready()
    t_sample = time.perf_counter() - t0

    dets = np.asarray(out["detectors"])
    obs = np.asarray(out["observables"])[:, 0]

    pred = dec.decode_batch(dets)
    t_decode = getattr(dec, "last_decode_seconds", 0.0)

    errors = int(np.sum((pred & 1) != (obs & 1)))
    rates = logical_error_rate(errors, shots, rounds)

    extras = {"n_detectors": circuit.n_detectors,
              "n_measurements": circuit.n_measurements}
    if decoder in ("window_native", "cluster_native"):
        # fraction of shots escalated to the host exact cluster decoder
        # (decoded exactly — a cost signal, not a truncation signal)
        extras["escalated_fraction"] = dec.last_flagged_fraction
    elif decoder == "cluster":
        # fraction of shots the device could not certify-exactly decode
        # (their in-budget components were still decoded exactly)
        extras["overflow_fraction"] = dec.last_overflow_fraction
    elif decoder == "window":
        # fraction of shots where some window exceeded its DP budget and
        # excess defects were deferred/greedy-matched (the truncation
        # signal a pure-device decode otherwise never surfaces)
        extras["overflow_fraction"] = getattr(
            dec, "last_overflow_fraction", 0.0)

    return MemoryResult(
        d=d, rounds=rounds, p=p, shots=shots, n_logical_errors=errors,
        p_logical_shot=rates["p_logical_shot"],
        p_logical_round=rates["p_logical_round"],
        sample_seconds=t_sample, decode_seconds=t_decode,
        shots_per_second=shots / max(t_sample + t_decode, 1e-12),
        detector_fraction=float(dets.mean()), decoder=decoder,
        extras=extras)


def threshold_scan(ds=(3, 5), ps=(1e-3, 2e-3, 4e-3), shots: int = 20000,
                   decoder: str = "matching", seed: int = 0) -> Dict:
    """Logical-vs-physical error scan (surface_code.py:22 'threshold')."""
    table = {}
    for d in ds:
        for p in ps:
            r = run_memory(d=d, p=p, shots=shots, decoder=decoder, seed=seed)
            table[(d, p)] = r.p_logical_round
    return table


__all__ = ["MemoryResult", "run_memory", "threshold_scan"]
