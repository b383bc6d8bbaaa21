"""MS-priced surface-code memory: the L0->L1->L2 loop for trapped ions.

The reference's architecture thesis is that micro-physics calibrations
price the architecture simulation per platform (reference:
docs/ARCHITECTURE.md:171-178 — TwoQubitGate -> Rydberg-CZ *or* MS;
README.md:117-127 "Level-0/1 tools inform the parameters"). Round 4
closed that loop for neutral atoms only; this study closes platform #2:

  L0  gate/ms_gate.py Lindblad engine -> calibration_data/trapped_ions/
  L1  primitives/ion_backend.py IonBackend (MS + derived CX channel,
      fluorescence readout confusion, clock-qubit idle dephasing)
  L2  qec/surface_code.py memory circuit priced with the engine-derived
      CX Pauli channel -> sampled + exactly decoded on the TPU

Round 5 adds platform #3, closing the reference's full TwoQubitGate
branch map (Rydberg-CZ *or* MS *or* cavity-mediated):

  L0  gate/cavity_gate.py Tavis-Cummings engine -> calibration_data/
      cavity_qed/exchange_gate/
  L1  primitives/cavity_backend.py CavityBackend (photon-exchange ->
      derived CZ via free software relabel + virtual ZZ; cavity-enhanced
      readout; Purcell-limited idle)
  L2  the same memory circuit priced with the exchange-derived CZ Pauli
      channel.

For each platform (ion yb171_default, ion ca40_high_fidelity, neutral
atom n70 default, cavity circuit-QED, cavity Rb fiber) and d in {3,5}:
p_L per shot/round with counts and Wilson 95% CIs, plus the Layer-1
pricing that produced it. Writes examples/ion_memory.json.
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))


def wilson_ci(k: int, n: int, z: float = 1.96):
    if n == 0:
        return (0.0, 1.0)
    ph = k / n
    den = 1 + z * z / n
    c = (ph + z * z / (2 * n)) / den
    h = z * np.sqrt(ph * (1 - ph) / n + z * z / (4 * n * n)) / den
    return (max(0.0, c - h), min(1.0, c + h))


def backend_pricing(backend) -> dict:
    """Layer-1 noise parameters for the memory circuit, all derived from
    the backend's calibrated primitives."""
    from noisyquantumsimulator_tpu.channels.pauli import t1_t2_to_pauli_rates

    cx = backend.two_qubit(0, 1, "cx")
    meas = backend.measure()
    p_meas = max(0.0, 1.0 - meas.fidelity)
    # data qubits idle while the ancillas are measured each round
    idle_s = meas.duration
    px, py, pz = t1_t2_to_pauli_rates(backend.T1, backend.T2, idle_s)
    p_idle = px + py + pz
    return {
        "cx_pauli_probs": np.asarray(cx.pauli_error_probs),
        "cx_fidelity": float(cx.fidelity),
        "cx_duration_us": float(cx.duration * 1e6),
        "p_meas": float(p_meas),
        "p_reset": float(p_meas),          # prep errs ~ readout errs
        "p_idle": float(p_idle),
        "idle_window_us": float(idle_s * 1e6),
    }


def run_platform(name: str, backend, ds=(3, 5), shots: int = 1 << 20,
                 seed: int = 0) -> dict:
    from noisyquantumsimulator_tpu.qec.memory import run_memory
    from noisyquantumsimulator_tpu.qec.surface_code import memory_z_circuit

    pricing = backend_pricing(backend)
    rows = {}
    for d in ds:
        circuit = memory_z_circuit(
            d, d, noise="calibrated", p=0.0,
            cz_pauli_probs=pricing["cx_pauli_probs"],
            p_meas=pricing["p_meas"], p_reset=pricing["p_reset"],
            p_idle=pricing["p_idle"])
        res = run_memory(d=d, rounds=d, p=0.0, shots=shots,
                         circuit=circuit, seed=seed)
        lo, hi = wilson_ci(res.n_logical_errors, shots)
        rows[f"d{d}"] = {
            "p_logical_shot": res.p_logical_shot,
            "p_logical_round": res.p_logical_round,
            "n_errors": res.n_logical_errors,
            "shots": shots,
            "ci95": [lo, hi],
            "decoder": res.decoder,
            "shots_per_second": round(res.shots_per_second, 1),
        }
        print(f"{name} d={d}: p_L/shot {res.p_logical_shot:.3e} "
              f"({res.n_logical_errors} errs/{shots}, "
              f"CI [{lo:.2e}, {hi:.2e}])", flush=True)
    lam = None
    if "d3" in rows and "d5" in rows and rows["d5"]["p_logical_shot"] > 0:
        lam = rows["d3"]["p_logical_shot"] / rows["d5"]["p_logical_shot"]
    out = {"pricing": {k: (v.tolist() if isinstance(v, np.ndarray) else v)
                       for k, v in pricing.items()},
           "memory": rows, "lambda_d3_over_d5": lam}
    if hasattr(backend, "summary"):
        out["backend_summary"] = backend.summary()
    return out


def main():
    quick = "--quick" in sys.argv
    shots = 1 << (16 if quick else 20)
    from noisyquantumsimulator_tpu.primitives.backend import NeutralAtomBackend
    from noisyquantumsimulator_tpu.primitives.ion_backend import IonBackend

    from noisyquantumsimulator_tpu.primitives.cavity_backend import (
        CavityBackend)

    platforms = {
        "ion_yb171_default": IonBackend(species="Yb171",
                                        ms_regime="yb171_default"),
        "ion_ca40_high_fidelity": IonBackend(species="Ca40",
                                             ms_regime="ca40_high_fidelity"),
        "neutral_atom_n70": NeutralAtomBackend(),
        # platform #3 (reference ARCHITECTURE.md:171-178 third branch):
        # photon-exchange entangler -> derived CZ (relabel + virtual ZZ)
        "cavity_circuit_qed": CavityBackend(regime="circuit_qed_exchange"),
        "cavity_rb_fiber": CavityBackend(regime="rb_fiber_cavity"),
    }
    results = {}
    for name, backend in platforms.items():
        results[name] = run_platform(name, backend, shots=shots)

    from noisyquantumsimulator_tpu.utils.observability import provenance_stamp
    payload = {"shots_per_cell": shots, "noise": "calibrated",
               "platforms": results,
               "note": (
                   "Platform comparison at each backend's DEFAULT regime. "
                   "The neutral-atom n70 smooth-JP default sits ABOVE the "
                   "surface-code threshold (p_L grows d=3 -> d=5): its "
                   "twirled CX error is ~4.2%, dominated by the trap-"
                   "induced qubit Stark controlled-phase error the "
                   "Layer-0 engine resolves (a real, documented effect - "
                   "see gate/simulate.py trap notes), plus laser "
                   "dephasing. The ion MS regimes (0.2-0.3% infidelity, "
                   "ZZ/ZI-biased) are BELOW threshold and suppress with "
                   "d as expected. This is the point of the L0->L1->L2 "
                   "loop: engine-priced memories expose which apparatus "
                   "regimes are QEC-viable. The cavity platforms "
                   "(photon-exchange CZ via free relabel + virtual ZZ, "
                   "primitives/cavity_backend.py) are likewise ABOVE "
                   "threshold at their current closed-loop operating "
                   "points (2.3%/4.1% twirled CZ error, photon-loss "
                   "dominated): correctly diagnosed as not-yet-QEC-"
                   "viable rather than flattered.")}
    payload.update(provenance_stamp())
    path = os.path.join(HERE, "ion_memory.json")
    with open(path, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
