"""Surface-code memory study: threshold scan, Lambda, teraquop footprint.

The Layer-2 equivalent of the reference's research sweep drivers: one
command produces the logical-error-rate table, the error-suppression
factor Lambda, and the teraquop projection, using the one-matmul sampler
and the exact native decoder.

Run: python examples/qec_study.py [cpu] [--quick]
Writes examples/qec_study.json (+ PNG when matplotlib is available).
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
    quick = "--quick" in sys.argv
    shots = 20000 if quick else 200000
    ds = (3, 5) if quick else (3, 5, 7)
    ps = (1e-3, 2e-3, 4e-3) if quick else (5e-4, 1e-3, 2e-3, 4e-3, 8e-3)

    from noisyquantumsimulator_tpu.qec import run_memory
    from noisyquantumsimulator_tpu.qec.surface_code import teraquop_footprint

    table = {}
    for d in ds:
        for p in ps:
            r = run_memory(d=d, p=p, shots=shots, seed=1)
            table[(d, p)] = r.p_logical_round
            print(f"d={d} p={p:.0e}: p_L/round={r.p_logical_round:.3e} "
                  f"({r.shots_per_second:,.0f} shots/s, {r.decoder})",
                  flush=True)

    # Lambda at each p: suppression per distance step of 2
    lambdas = {}
    for p in ps:
        ratios = [table[(ds[i], p)] / max(table[(ds[i + 1], p)], 1e-12)
                  for i in range(len(ds) - 1)]
        lambdas[p] = float(np.mean(ratios))
        print(f"p={p:.0e}: Lambda = {lambdas[p]:.2f}")

    p_op = 1e-3
    tq = teraquop_footprint(table[(ds[-1], p_op)], ds[-1])
    print(f"teraquop distance estimate at p={p_op:.0e}: d = {tq}")

    out = {
        "table": {f"d{d}_p{p}": v for (d, p), v in table.items()},
        "lambda": {str(p): v for p, v in lambdas.items()},
        "teraquop_d": tq, "shots": shots,
    }
    path = os.path.join(HERE, "qec_study.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")

    try:
        from noisyquantumsimulator_tpu.utils.visualization import (
            plot_logical_error_scaling)
        png = os.path.join(HERE, "qec_study.png")
        plot_logical_error_scaling(table, png)
        print(f"wrote {png}")
    except Exception as e:
        print(f"(no plot: {e})")


if __name__ == "__main__":
    main()
