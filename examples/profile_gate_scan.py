"""Where do the gate engine's 65 ms go? (VERDICT r4 #7: the 501k sims/s
real-rep scan has been flat since round 3; Mosaic now compiles here, so
either measure a VMEM-resident win or the measured reason there is none.)

Times, at the bench shape (batch=32768 schedules x 4 states x 81 real
coords, 300 segments, f32 HIGHEST):
  - the production evolve_real_phased_many scan,
  - the same scan with unroll in {2, 4, 8} (dispatch-overhead probe),
  - the matmul-only scan (rotation removed: the pure-MXU lower bound),
  - the rotation-only scan (the pure-VPU cost),
so the gap decomposes into MXU / VPU / overhead before any kernel is
written. Writes examples/profile_gate_scan.json.
"""
from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))
# share bench.py's persistent compile cache (tunnel compiles are minutes)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(HERE), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")


def timeit(fn, *args, reps=5):
    # fence with a HOST FETCH: block_until_ready lies on the axon
    # tunnel (see bench.py gate workload); a scalar fetch after the
    # last rep fences the whole in-order queue
    import jax.numpy as jnp
    out = fn(*args)
    float(jnp.sum(out))                       # warm-up fence
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from noisyquantumsimulator_tpu.solver.real_rep import (_rotate,
                                                           build_real_rep)
    from noisyquantumsimulator_tpu.gate.simulate import (plan_cz_gate,
                                                         plan_phase_frame)
    from noisyquantumsimulator_tpu.core.configs import (
        SmoothJPSimulationInputs)

    B, S, n_steps = 32768, 4, 300
    D, P = 9, 36
    n = D + 2 * P
    plan = plan_cz_gate(SmoothJPSimulationInputs(), n_steps_smooth=n_steps,
                        hilbert_space_dim=3)
    g = plan_phase_frame(plan)
    rep = build_real_rep(g, D)
    rng = np.random.default_rng(0)
    # orthogonal stand-in propagator: keeps 300-step values bounded so
    # the Pallas parity diff below is meaningful (a radius>1 random U
    # overflows by step ~200 and parity turns into inf-inf)
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    U = jnp.asarray(Q.astype(np.float32))
    cq = jnp.asarray(rep.cq.astype(np.float32))
    phases = jnp.asarray(
        np.linspace(0.95, 1.05, B, dtype=np.float32)[:, None]
        * np.asarray(plan.schedule.phases, np.float32)[None])
    x0 = jnp.asarray(rng.standard_normal((S, n)).astype(np.float32))
    Prec = lax.Precision.HIGHEST
    res = {"B": B, "S": S, "n": n, "n_steps": n_steps}

    def make_scan(unroll, do_rotate=True, do_matmul=True):
        @jax.jit
        def run(U, cq, ph, x0):
            dphi = jnp.concatenate(
                [jnp.zeros((B, 1), jnp.float32), ph[:, :-1] - ph[:, 1:]],
                axis=1)
            v0 = jnp.broadcast_to(x0[None], (B, S, n))
            UrT = U.T

            def body(v, dphi_k):
                if do_rotate:
                    v = _rotate(v, dphi_k[:, None], cq, D, P)
                if do_matmul:
                    v = jnp.matmul(v.reshape(B * S, n), UrT,
                                   precision=Prec).reshape(B, S, n)
                return v, None

            v, _ = lax.scan(body, v0, dphi.T, unroll=unroll)
            return v

        return run

    for name, kw in (
            ("production_unroll1", dict(unroll=1)),
            ("unroll2", dict(unroll=2)),
            ("unroll4", dict(unroll=4)),
            ("unroll8", dict(unroll=8)),
            ("matmul_only", dict(unroll=1, do_rotate=False)),
            ("matmul_only_unroll4", dict(unroll=4, do_rotate=False)),
            ("rotate_only", dict(unroll=1, do_matmul=False)),
    ):
        t = timeit(make_scan(**kw), U, cq, phases, x0)
        res[f"t_{name}_s"] = t
        print(f"{name:>22s}: {t*1e3:8.2f} ms "
              f"({B / t:,.0f} sims/s)", flush=True)

    # VMEM-resident Pallas scan (solver/scan_pallas.py): probe, then
    # time at several block sizes and check parity vs the XLA scan
    from noisyquantumsimulator_tpu.solver.real_rep import (
        evolve_real_phased_many)
    from noisyquantumsimulator_tpu.solver.scan_pallas import (
        evolve_real_phased_many_pallas, scan_pallas_available)
    t = timeit(partial(evolve_real_phased_many, D=D, P=P),
               U, cq, phases, x0)
    res["t_production_full_s"] = t
    print(f"{'production_full':>22s}: {t*1e3:8.2f} ms "
          f"({B / t:,.0f} sims/s)", flush=True)
    def flush():
        from noisyquantumsimulator_tpu.utils.observability import (
            provenance_stamp)
        res.update(provenance_stamp())
        with open(os.path.join(HERE, "profile_gate_scan.json"), "w") as f:
            json.dump(res, f, indent=1)

    flush()
    if scan_pallas_available():
        ref = evolve_real_phased_many(U, cq, phases, x0, D, P)
        # each block size is a fresh ~15-min Mosaic tunnel compile
        # (persisted in .jax_cache); two sizes bound the sweep
        for blk in (1024, 2048):
            fn = partial(evolve_real_phased_many_pallas, block_rows=blk)

            @jax.jit
            def run(U, cq, ph, x0, fn=fn):
                return fn(U, cq, ph, x0, D=D, P=P)

            try:
                out = run(U, cq, phases, x0)
                err = float(jnp.max(jnp.abs(
                    out - jnp.asarray(ref).reshape(out.shape))))
                t = timeit(run, U, cq, phases, x0)
                res[f"t_pallas_blk{blk}_s"] = t
                res[f"pallas_blk{blk}_max_abs_diff"] = err
                print(f"{'pallas_blk' + str(blk):>22s}: {t*1e3:8.2f} ms "
                      f"({B / t:,.0f} sims/s, diff {err:.1e})", flush=True)
            except Exception as e:  # noqa: BLE001 — record, keep probing
                res[f"pallas_blk{blk}_error"] = repr(e)[:300]
                print(f"pallas blk={blk} FAILED: {e!r}", flush=True)
            flush()          # a timeout mid-sweep keeps finished rows
    else:
        res["pallas"] = "unavailable (probe failed)"
        print("pallas scan kernel unavailable on this backend", flush=True)

    flush()
    print("wrote examples/profile_gate_scan.json", flush=True)


if __name__ == "__main__":
    main()
