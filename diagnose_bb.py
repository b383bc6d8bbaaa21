"""Bang-bang diagnosis: sweep pulse area / bounds to localize phase error.

TPU-native rebuild of the reference diagnostic driver
(reference: diagnose_bb.py — sweeps Omega*tau and inspects the controlled
phase). The whole sweep is ONE vmapped device call here.

Run: python diagnose_bb.py [cpu]
"""
import sys

import numpy as np


def main():
    import jax
    if "cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from noisyquantumsimulator_tpu.optimize.apparatus import ApparatusConstraints
    from noisyquantumsimulator_tpu.optimize.engine import (
        build_fixed_problem, make_population_objective)
    from noisyquantumsimulator_tpu.optimize.forward import (
        get_jp_bangbang_bounds_and_x0)

    app = ApparatusConstraints(spacing_factor=2.945)
    problem = build_fixed_problem(app, app.make_noiseless(),
                                  include_noise=False)
    print(f"apparatus: V/Omega = {problem.V_over_Omega:.1f}, "
          f"Omega/2pi = {problem.Omega / 2 / np.pi / 1e6:.2f} MHz")

    _, x0 = get_jp_bangbang_bounds_and_x0(5)
    pop_obj = make_population_objective(problem, "jandura_pupillo",
                                        n_segments=5)

    # sweep total pulse area around the validated 22.08
    areas = np.linspace(18.0, 26.0, 17)
    pop = np.tile(x0, (len(areas), 1))
    pop[:, 0] = areas
    costs, m = pop_obj(jnp.asarray(pop))

    print(f"{'Omega*tau':>10} {'F':>9} {'F11':>9} {'ctrl_phase':>11} "
          f"{'phase_err':>10}")
    for i, a in enumerate(areas):
        print(f"{a:>10.2f} {float(m['avg_fidelity'][i]):>9.4f} "
              f"{float(m['f11'][i]):>9.4f} "
              f"{float(m['controlled_phase_deg'][i]):>10.1f}d "
              f"{float(m['phase_error_deg'][i]):>9.1f}d")

    best = int(np.argmax(np.asarray(m["avg_fidelity"])))
    print(f"\nbest area: {areas[best]:.2f} "
          f"(F = {float(m['avg_fidelity'][best]):.4f}); validated = 22.08")


if __name__ == "__main__":
    main()
