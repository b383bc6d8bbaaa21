"""Bang-bang protocol validation script.

TPU-native rebuild of the reference validation driver
(reference: validate_bangbang.py:5-11):
  1. varying switching times must change results
  2. the validated 5-segment defaults reach ~95% fidelity near V/Omega=200
  3. bang-bang differs from smooth JP

Run: python validate_bangbang.py
"""
import sys

import numpy as np


def main():
    import jax
    if "cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from noisyquantumsimulator_tpu.core.configs import (
        JPSimulationInputs, NoiseSourceConfig, SmoothJPSimulationInputs)
    from noisyquantumsimulator_tpu.gate.simulate import simulate_cz_gate

    kw = dict(include_noise=False, trap_laser_on=False, spacing_factor=2.945)
    noiseless = NoiseSourceConfig.noiseless()
    ok = True

    # 1. switching times matter
    r_a = simulate_cz_gate(JPSimulationInputs(noise=noiseless), **kw)
    r_b = simulate_cz_gate(
        JPSimulationInputs(noise=noiseless,
                           switching_times=[3.0, 9.5, 14.0, 20.5]), **kw)
    d = abs(r_a.avg_fidelity - r_b.avg_fidelity)
    print(f"[1] switching-time sensitivity: dF = {d:.4f} "
          f"({'PASS' if d > 1e-4 else 'FAIL'})")
    ok &= d > 1e-4

    # 2. validated defaults near V/Omega = 200
    print(f"[2] 5-seg defaults: F = {r_a.avg_fidelity:.4f} at "
          f"V/Omega = {r_a.V_over_Omega:.0f}, controlled phase = "
          f"{r_a.phase_info['controlled_phase_deg']:.1f} deg "
          f"({'PASS' if r_a.avg_fidelity > 0.9 else 'FAIL'})")
    ok &= r_a.avg_fidelity > 0.9

    # 3. differs from smooth JP
    r_s = simulate_cz_gate(SmoothJPSimulationInputs(noise=noiseless), **kw)
    d2 = abs(r_a.avg_fidelity - r_s.avg_fidelity)
    print(f"[3] bang-bang vs smooth JP: dF = {d2:.4f} "
          f"({'PASS' if d2 > 1e-4 else 'FAIL'})")
    ok &= d2 > 1e-4

    print("ALL PASS" if ok else "FAILURES PRESENT")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
