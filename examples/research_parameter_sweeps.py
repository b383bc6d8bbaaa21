"""Research parameter sweeps: the headline study set.

TPU-native rebuild of the reference research driver
(reference: examples/research_parameter_sweeps.py:81-197,644 — 13 serial
sweep studies). Hardware sweeps reuse the sweep machinery in
optimize/sweeps.py; protocol sweeps run as single vmapped device calls.

Run: python examples/research_parameter_sweeps.py [cpu] [--quick]
Writes examples/sweep_results.json (+ PNGs when matplotlib is available).
"""
import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))


def main():
    import jax
    if "cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    quick = "--quick" in sys.argv
    points = 3 if quick else 7

    from noisyquantumsimulator_tpu.optimize.apparatus import ApparatusConstraints
    from noisyquantumsimulator_tpu.optimize.sweeps import (hardware_sweep,
                                                           protocol_sweep)

    app = ApparatusConstraints()
    results = {}

    studies = [
        ("temperature", np.linspace(1e-6, 50e-6, points)),
        ("laser_1_linewidth_hz", np.logspace(1, 4, points)),
        ("Delta_e", 2 * np.pi * np.linspace(0.5e9, 5e9, points)),
        ("spacing_factor", np.linspace(2.5, 4.5, points)),
        ("n_rydberg", np.linspace(55, 85, points).astype(int)),
        ("tweezer_power", np.linspace(5e-3, 50e-3, points)),
        ("NA", np.linspace(0.4, 0.7, points)),
        ("laser_2_power", np.linspace(0.1, 1.0, points)),
        ("B_field", np.linspace(0.5e-4, 5e-4, points)),
    ]
    for name, values in studies:
        print(f"sweep {name} ...", flush=True)
        r = hardware_sweep(name, values, protocol="smooth_jp", apparatus=app)
        results[name] = {
            "values": np.asarray(values, dtype=float).tolist(),
            "fidelity": r.fidelity.tolist(),
            "gate_time_us": r.gate_time_us.tolist(),
            "phase_error_deg": r.phase_error_deg.tolist(),
        }

    # protocol-parameter studies (vmapped single calls)
    print("protocol sweeps ...", flush=True)
    lp = protocol_sweep("lp", 0, np.linspace(0.30, 0.45, 4 * points),
                        [0.377371, 4.29268], apparatus=app)
    results["lp_delta_over_omega"] = {
        "values": lp.values.tolist(), "fidelity": lp.fidelity.tolist()}
    sj = protocol_sweep("smooth_jp", 1,
                        np.linspace(0.2, 0.45, 4 * points) * np.pi,
                        [10.09, 0.311 * np.pi, 1.242, 4.696, 0.0205],
                        apparatus=app)
    results["smooth_jp_amplitude"] = {
        "values": sj.values.tolist(), "fidelity": sj.fidelity.tolist()}

    out = os.path.join(HERE, "sweep_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}")

    try:
        import matplotlib
        matplotlib.use("Agg")
        from noisyquantumsimulator_tpu.utils.visualization import plot_sweep_grid
        png = os.path.join(HERE, "sweep_results.png")
        plot_sweep_grid(results, png)
        print(f"wrote {png}")
    except Exception as e:  # matplotlib optional
        print(f"(no plots: {e})")


if __name__ == "__main__":
    main()
