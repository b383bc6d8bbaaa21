"""GRAPE-style optimal control: all 300 segment phases as free parameters.

The reference's optimizers search 2-11 protocol parameters with scipy DE
because its QuTiP solver is a black box (optimize_cz_gate.py:1081). Here
the solver is differentiable, so optimal control needs no ansatz at all:
`jax.grad` of the gate cost w.r.t. the ENTIRE piecewise-constant phase
vector flows through the phase-frame propagator in one backward pass,
and adam polishes a 300-dimensional pulse directly on the device.

Protocol: start from the literature smooth-JP pulse (protocols.py
SMOOTH_JP_PARAMS), release every per-segment phase, and descend the same
cost the DE optimizer uses (noisy physics, full Lindblad).

Writes examples/grape_result.json. ~1 min on a v5e; runs on CPU too.
"""
from __future__ import annotations

import json
import os
import sys
import time


def main(n_steps: int = 300, iters: int = 400, lr: float = 2e-3) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from noisyquantumsimulator_tpu.optimize.apparatus import (
        ApparatusConstraints)
    from noisyquantumsimulator_tpu.optimize.engine import (
        build_fixed_problem, make_objective, make_value_and_grad,
        smooth_jp_uniform_from_params)
    from noisyquantumsimulator_tpu.optimize.forward import (
        get_smooth_jp_bounds_and_x0)

    app = ApparatusConstraints()
    problem = build_fixed_problem(app, app.make_full_noise())

    # baseline: the literature smooth-JP ansatz evaluated by the same core
    _, x0 = get_smooth_jp_bounds_and_x0()
    obj_sjp = make_objective(problem, "smooth_jp", n_steps=n_steps)
    cost0, m0 = obj_sjp(np.asarray(x0))
    f0 = float(m0["avg_fidelity"])

    phases0, _, _ = smooth_jp_uniform_from_params(jnp.asarray(x0), problem,
                                                  n_steps=n_steps)
    ot, dow = float(x0[0]), float(x0[4])

    vg = make_value_and_grad(problem, "grape", omega_tau=ot,
                             delta_over_omega=dow)
    obj = make_objective(problem, "grape", omega_tau=ot,
                         delta_over_omega=dow)

    opt = optax.adam(lr)
    phases = jnp.asarray(phases0)
    state = opt.init(phases)
    t0 = time.perf_counter()
    hist = []
    for it in range(iters):
        cost, grad = vg(phases)
        upd, state = opt.update(grad, state)
        phases = optax.apply_updates(phases, upd)
        if it % 50 == 0 or it == iters - 1:
            hist.append({"iter": it, "cost": float(cost)})
            print(f"iter {it:4d}  cost {float(cost):10.4f}", flush=True)
    dt = time.perf_counter() - t0

    cost1, m1 = obj(phases)
    f1 = float(m1["avg_fidelity"])
    out = {
        "backend": jax.devices()[0].platform,
        "n_steps": n_steps, "iters": iters, "lr": lr,
        "baseline_smooth_jp": {"cost": float(cost0), "avg_fidelity": f0},
        "grape": {"cost": float(cost1), "avg_fidelity": f1,
                  "controlled_phase_deg": float(m1["controlled_phase_deg"]),
                  "gate_time_us": float(m1["gate_time_us"])},
        "seconds": dt, "history": hist,
        "grad_dim": n_steps,
    }
    print(f"smooth-JP ansatz: F={f0:.6f} cost={float(cost0):.3f}")
    print(f"GRAPE ({n_steps} free phases, {iters} adam steps, {dt:.1f}s): "
          f"F={f1:.6f} cost={float(cost1):.3f}")
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "grape_result.json")
    from noisyquantumsimulator_tpu.utils.observability import \
        provenance_stamp
    out.update(provenance_stamp())
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()
