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

    # ---- study: species comparison (reference :773-786) ----
    # temperature sweep for Rb87 vs Cs133, LP and smooth-JP
    print("species comparison ...", flush=True)
    temps = np.array([10e-6, 20e-6, 40e-6, 80e-6])[:points]
    species_res = {}
    for species in ("Rb87", "Cs133"):
        app_s = ApparatusConstraints(**{**app.__dict__, "species": species})
        per = {}
        for proto in ("lp", "smooth_jp"):
            r = hardware_sweep("temperature", temps, protocol=proto,
                               apparatus=app_s)
            per[proto] = {"fidelity": r.fidelity.tolist(),
                          "gate_time_us": r.gate_time_us.tolist()}
        species_res[species] = per
    results["species_comparison"] = {
        "temperature_K": temps.tolist(), **species_res}

    # ---- study: pulse-shape comparison (reference :417-460) ----
    print("pulse shapes ...", flush=True)
    from noisyquantumsimulator_tpu.core.configs import (
        LPSimulationInputs, SmoothJPSimulationInputs)
    from noisyquantumsimulator_tpu.gate.simulate import simulate_cz_gate
    shapes = {}
    for ps in ("square", "gaussian", "blackman"):
        r = simulate_cz_gate(
            LPSimulationInputs(excitation=app.make_excitation_config(),
                               noise=app.make_full_noise(), pulse_shape=ps),
            **app.sim_kwargs())
        shapes[ps] = {"fidelity": r.avg_fidelity,
                      "gate_time_us": r.gate_time_us,
                      "gamma_leakage": r.noise_breakdown.get(
                          "gamma_leakage", 0.0)}
    r_sj = simulate_cz_gate(
        SmoothJPSimulationInputs(excitation=app.make_excitation_config(),
                                 noise=app.make_full_noise()),
        **app.sim_kwargs())
    shapes["smooth_sinusoidal (JP)"] = {"fidelity": r_sj.avg_fidelity,
                                        "gate_time_us": r_sj.gate_time_us}
    results["pulse_shape_comparison"] = shapes

    # ---- study: protocol summary under named conditions (ref :574-643) --
    print("protocol summary ...", flush=True)
    conditions = [
        ("ideal", {}),
        ("hot_100uK", {"temperature": 100e-6}),
        ("noisy_laser_1kHz", {"laser_1_linewidth_hz": 1000.0,
                              "laser_2_linewidth_hz": 1000.0}),
        ("close_spacing_2.2x", {"spacing_factor": 2.2}),
        ("low_n_60", {"n_rydberg": 60}),
        ("high_n_85", {"n_rydberg": 85}),
        ("Cs133", {"species": "Cs133"}),
    ]
    summary = {}
    for name, overrides in conditions:
        app_c = ApparatusConstraints(**{**app.__dict__, **overrides})
        row = {}
        for proto, cls in (("lp", LPSimulationInputs),
                           ("smooth_jp", SmoothJPSimulationInputs)):
            r = simulate_cz_gate(
                cls(excitation=app_c.make_excitation_config(),
                    noise=app_c.make_full_noise()), **app_c.sim_kwargs())
            row[proto] = {"fidelity": r.avg_fidelity,
                          "gate_time_us": r.gate_time_us}
        summary[name] = row
    results["protocol_summary"] = summary

    # ---- study: noise breakdown (reference plot_noise_breakdown :289) --
    # full per-source rate/error budget at the default + stressed points
    print("noise breakdown ...", flush=True)
    nb = {}
    for name, overrides in (("default", {}),
                            ("hot_100uK", {"temperature": 100e-6}),
                            ("noisy_laser_1kHz",
                             {"laser_1_linewidth_hz": 1000.0,
                              "laser_2_linewidth_hz": 1000.0})):
        app_c = ApparatusConstraints(**{**app.__dict__, **overrides})
        r = simulate_cz_gate(
            SmoothJPSimulationInputs(excitation=app_c.make_excitation_config(),
                                     noise=app_c.make_full_noise()),
            **app_c.sim_kwargs())
        nb[name] = {k: v for k, v in r.noise_breakdown.items()
                    if isinstance(v, (int, float))}
    results["noise_breakdown"] = nb

    out = os.path.join(HERE, "sweep_results.json")
    from noisyquantumsimulator_tpu.utils.observability import \
        provenance_stamp
    results.update(provenance_stamp())
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}")

    try:
        import matplotlib
        matplotlib.use("Agg")
        from noisyquantumsimulator_tpu.utils.visualization import plot_sweep_grid
        png = os.path.join(HERE, "sweep_results.png")
        plottable = {k: v for k, v in results.items()
                     if isinstance(v, dict) and "values" in v}
        plot_sweep_grid(plottable, png)
        print(f"wrote {png}")
    except Exception as e:  # matplotlib optional
        print(f"(no plots: {e})")


if __name__ == "__main__":
    main()
