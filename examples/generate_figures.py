"""Generate the reference's research figure set with the TPU engine.

Rebuild of the reference figure drivers
(reference: scripts/archive/generate_figures.py:139-670 — six published
figures under figures/). Every study underneath is one vmapped device
call or one short optimizer run.

Run: python examples/generate_figures.py [cpu] [--quick]
Writes figures/*.png at the repo root (same names as the reference).
"""
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)
FIGDIR = os.path.join(ROOT, "figures")


def main():
    import jax
    if "cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    quick = "--quick" in sys.argv
    os.makedirs(FIGDIR, exist_ok=True)
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from noisyquantumsimulator_tpu.core.configs import (
        JPSimulationInputs, LPSimulationInputs, SmoothJPSimulationInputs)
    from noisyquantumsimulator_tpu.gate.simulate import simulate_cz_gate
    from noisyquantumsimulator_tpu.optimize.apparatus import (
        ApparatusConstraints)
    from noisyquantumsimulator_tpu.optimize.sweeps import hardware_sweep
    from noisyquantumsimulator_tpu.utils.visualization import (
        plot_noise_breakdown)

    n_pts = 4 if quick else 9
    app = ApparatusConstraints()

    # 1. blockade importance: fidelity vs V/Omega via the spacing factor.
    # Noiseless shows the pure blockade-error branch (low V bad); full
    # noise adds the tight-spacing penalty (blockade fluctuations, traps),
    # producing the optimum at moderate V/Omega.
    spacings = np.linspace(2.2, 8.0, max(n_pts, 6))
    fig, ax = plt.subplots(figsize=(6, 4))
    for label, noisy in (("noiseless", False), ("full noise", True)):
        sw = hardware_sweep("spacing_factor", spacings,
                            protocol="smooth_jp", apparatus=app,
                            include_noise=noisy,
                            sim_kwargs=None if noisy
                            else {"trap_laser_on": False})
        ax.loglog(sw.extras["V_over_Omega"], 1 - sw.fidelity, "o-",
                  label=label)
    ax.set_xlabel("V / Omega")
    ax.set_ylabel("infidelity")
    ax.legend()
    ax.set_title("Blockade strength drives gate fidelity")
    fig.tight_layout()
    fig.savefig(os.path.join(FIGDIR, "blockade_importance.png"), dpi=150)
    plt.close(fig)
    print("wrote blockade_importance.png", flush=True)

    # 2. noise breakdown
    r = simulate_cz_gate(SmoothJPSimulationInputs())
    plot_noise_breakdown(r.noise_breakdown,
                         os.path.join(FIGDIR, "noise_breakdown.png"))
    print("wrote noise_breakdown.png", flush=True)

    # 3. protocol comparison at validated parameters
    fig, ax = plt.subplots(figsize=(6, 4))
    names, fids, times = [], [], []
    for name, inputs in (("Levine-\nPichler", LPSimulationInputs()),
                         ("smooth JP", SmoothJPSimulationInputs()),
                         ("bang-bang", JPSimulationInputs())):
        rr = simulate_cz_gate(inputs)
        names.append(name)
        fids.append(rr.avg_fidelity)
        times.append(rr.tau_total * 1e6)
    b = ax.bar(names, [1 - f for f in fids], color="tab:blue")
    for rect, t in zip(b, times):
        ax.text(rect.get_x() + rect.get_width() / 2, rect.get_height(),
                f"{t:.2f} us", ha="center", va="bottom", fontsize=8)
    ax.set_ylabel("infidelity (full noise)")
    ax.set_yscale("log")
    fig.tight_layout()
    fig.savefig(os.path.join(FIGDIR, "protocol_comparison_optimal.png"),
                dpi=150)
    plt.close(fig)
    print("wrote protocol_comparison_optimal.png", flush=True)

    # 4. species comparison: fidelity vs n_rydberg for Rb87 and Cs133
    fig, ax = plt.subplots(figsize=(6, 4))
    ns = np.linspace(55, 85, n_pts).astype(int)
    for species in ("Rb87", "Cs133"):
        f = [simulate_cz_gate(SmoothJPSimulationInputs(), species=species,
                              n_rydberg=int(n)).avg_fidelity for n in ns]
        ax.plot(ns, 1 - np.asarray(f), "o-", label=species)
    ax.set_xlabel("principal quantum number n")
    ax.set_ylabel("infidelity")
    ax.set_yscale("log")
    ax.legend()
    fig.tight_layout()
    fig.savefig(os.path.join(FIGDIR, "species_comparison.png"), dpi=150)
    plt.close(fig)
    print("wrote species_comparison.png", flush=True)

    # 5. temperature sensitivity
    sw = hardware_sweep("temperature", np.linspace(1e-6, 50e-6, n_pts),
                        protocol="smooth_jp", apparatus=app)
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.plot(sw.values * 1e6, 1 - sw.fidelity, "o-")
    ax.set_xlabel("atom temperature [uK]")
    ax.set_ylabel("infidelity")
    fig.tight_layout()
    fig.savefig(os.path.join(FIGDIR, "temperature_sensitivity.png"), dpi=150)
    plt.close(fig)
    print("wrote temperature_sensitivity.png", flush=True)

    # 6. Pareto: fidelity vs gate time from a short exploration
    from noisyquantumsimulator_tpu.optimize.inverse import (
        explore_parameter_space)
    from noisyquantumsimulator_tpu.utils.visualization import (
        plot_exploration_results)
    ex = explore_parameter_space(protocol="smooth_jp", n_runs=1,
                                 maxiter=3 if quick else 12,
                                 popsize=6 if quick else 10, seeds=[3])
    plot_exploration_results(
        ex, os.path.join(FIGDIR, "pareto_true_fidelity_time.png"))
    print("wrote pareto_true_fidelity_time.png", flush=True)
    print(f"all figures in {FIGDIR}")


if __name__ == "__main__":
    main()
