"""Engine-driven MS-gate study: simulate, calibrate, cross-check.

Runs the Lindblad-engine MS gate (gate/ms_gate.py — the authoritative
trapped-ion model, per the reference contract
reference: src/qpu_simulator/micro_physics/trapped_ions/qccd/gates.py:1-28)
at named operating points, writes the resulting CPTP maps into the
calibration store (calibration_data/trapped_ions/ms_gate/<regime>.json —
the same L0->L1 handoff the Rydberg CZ path uses), and records an
engine-vs-analytic error-budget comparison in
examples/ms_gate_engine.json. The analytic module
(physics/trapped_ions.ms_gate) appears only as the cross-check column.

Usage: python examples/ms_gate_engine_study.py
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from noisyquantumsimulator_tpu.channels.calibration import CalibrationStore
from noisyquantumsimulator_tpu.core.constants import TWO_PI
from noisyquantumsimulator_tpu.gate.ms_gate import (ms_calibration_record,
                                                   simulate_ms_gate)
from noisyquantumsimulator_tpu.physics.trapped_ions import ms_gate

# Named operating points; numbers follow the experiments named in
# models/hardware_configs.py (Yb171 QCCD default, Ca40 high-fidelity a la
# Ballance PRL 117 060504).
REGIMES = {
    "yb171_default": dict(
        species="Yb171", omega_mode=TWO_PI * 3e6, nbar=0.05,
        heating_rate_quanta_per_s=100.0, motional_coherence_time=10e-3,
        laser_coherence_time=1.0, scattering_rate=1.0,
        detuning_from_mode=TWO_PI * 20e3),
    "ca40_high_fidelity": dict(
        species="Ca40", omega_mode=TWO_PI * 2e6, nbar=0.02,
        heating_rate_quanta_per_s=10.0, motional_coherence_time=50e-3,
        laser_coherence_time=5.0, scattering_rate=0.3,
        detuning_from_mode=TWO_PI * 35e3,
        # 397 nm Raman pair, Delta-k projection onto the axial mode ~ one
        # photon recoil (Ballance PRL 117 060504 geometry): eta ~ 0.126.
        # The Yb default k_eff (counter-prop 355 nm, eta = 0.28) put the
        # first engine run deep beyond Lamb-Dicke: the noiseless floor
        # alone was 6.3e-3 — a REAL effect the analytic budget cannot
        # see, but not the published operating point.
        k_eff=TWO_PI / 397e-9),
}


def _commit() -> str:
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__))).stdout.strip()
    except Exception:
        return "unknown"


def main() -> None:
    store = CalibrationStore(
        root=os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "..", "calibration_data"))
    out = {"generated_at_commit": _commit(),
           "engine": "gate/ms_gate.py (Lindblad spin x spin x motional, "
                     "rotating-frame exact expm)",
           "regimes": {}}
    for regime, kw in REGIMES.items():
        t0 = time.time()
        r = simulate_ms_gate(n_fock=10, **kw)
        wall = time.time() - t0
        a = ms_gate(**kw)  # closed-form cross-check
        path = store.save(ms_calibration_record(r, regime))
        top = sorted(((k, float(v)) for k, v in r.error_budget.items()),
                     key=lambda kv: -kv[1])
        out["regimes"][regime] = {
            "calibration_record": os.path.relpath(
                path, os.path.join(os.path.dirname(__file__), "..")),
            "engine_infidelity": 1.0 - r.fidelity,
            "engine_process_infidelity": 1.0 - r.process_fidelity,
            "analytic_infidelity_crosscheck": 1.0 - a.fidelity,
            "duration_s": r.duration,
            "leakage": r.leakage,
            "cptp": bool(r.completely_positive and r.trace_preserving),
            "budget_top3": top[:3],
            "dominant_pauli_errors": _top_paulis(r.error_map_pauli),
            "sim_wall_s": round(wall, 2),
        }
        print(f"{regime}: 1-F={1 - r.fidelity:.3e} "
              f"(analytic cross-check {1 - a.fidelity:.3e}), "
              f"tau={r.duration * 1e6:.1f} us, record -> {path}")
    dest = os.path.join(os.path.dirname(__file__), "ms_gate_engine.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {dest}")


def _top_paulis(probs, k: int = 3):
    from noisyquantumsimulator_tpu.channels.conversions import pauli_basis
    labels, _ = pauli_basis(2)
    pairs = [(lab, float(p)) for lab, p in zip(labels, probs)
             if lab != "II"]
    pairs.sort(key=lambda kv: -kv[1])
    return pairs[:k]


if __name__ == "__main__":
    main()
