"""Headline benchmark: batched 2-atom CZ Lindblad gate simulations / second.

One "sim" = a full noisy smooth-JP CZ gate simulation, exactly the
reference's hot workload (simulation.py:3485-3502): 300 piecewise-constant
segments of a 9x9 density-matrix Lindblad evolution, applied to the
computational basis states (+ the |++> phase probe). The reference solves
this with 4 x 300 sequential QuTiP mesolve calls on CPU; here it is one
batched expm + matmul-tree per parameter set, vmapped over a sweep batch.

Baseline: the same segment sequence integrated by the CPU zvode oracle at
the reference tolerances (atol 1e-10 / rtol 1e-8) for the 4 basis states —
a faithful stand-in for the reference's mesolve loop (same solver family,
same tolerances, same segmentation), since QuTiP is not installed here.

Prints ONE JSON line:
  {"metric": "cz_lindblad_sims_per_sec", "value": N, "unit": "sims/s",
   "vs_baseline": ratio, ...extras}
"""
from __future__ import annotations

import json
import time

import numpy as np


def build_workload(batch: int, n_steps: int = 300, dtype="complex64"):
    import jax
    import jax.numpy as jnp
    from noisyquantumsimulator_tpu.core.configs import SmoothJPSimulationInputs
    from noisyquantumsimulator_tpu.gate.simulate import (plan_cz_gate,
                                                         plan_squaring_bound)
    from noisyquantumsimulator_tpu.solver.propagator import Schedule, evolve_rhos
    from noisyquantumsimulator_tpu.gate.fidelity import compute_cz_fidelity
    from noisyquantumsimulator_tpu.utils.transfer import (
        device_put_complex, enable_high_precision_matmul)

    enable_high_precision_matmul()
    plan = plan_cz_gate(SmoothJPSimulationInputs(), n_steps_smooth=n_steps)
    # complex transfers go as float planes (axon backend limitation)
    ndt = np.complex64 if dtype == "complex64" else np.complex128
    L0 = device_put_complex(plan.L0, ndt)
    Cp = device_put_complex(plan.Cp, ndt)
    Cm = device_put_complex(plan.Cm, ndt)
    rho0s = device_put_complex(plan.rho0s, ndt)
    rdt = np.float32 if dtype == "complex64" else np.float64
    base_phases = np.asarray(plan.schedule.phases, rdt)
    dts = jnp.asarray(np.asarray(plan.schedule.dts, rdt))
    amps = jnp.asarray(np.asarray(plan.schedule.amps, rdt))

    # a realistic sweep: phase-amplitude scale factors around the optimum
    scales = jnp.asarray(np.linspace(0.95, 1.05, batch))

    # NOTE: the complex arrays MUST be jit *arguments*, not closures —
    # closed-over device arrays are inlined as MLIR constants, which forces
    # a host fetch of complex data (unsupported on the axon tunnel).
    # host-known schedule -> tight static squaring bound (each masked
    # squaring-loop trip is a full batched matmul; don't pay for unused ones)
    ms = plan_squaring_bound(plan)

    def one_sim(scale, L0, Cp, Cm, rho0s, phases):
        sched = Schedule(amps, scale * phases, dts)
        rhos = evolve_rhos(L0, Cp, Cm, sched, rho0s, max_squarings=ms)
        _, avg, _ = compute_cz_fidelity(rhos, plan.kets)
        return avg

    vm = jax.vmap(one_sim, in_axes=(0, None, None, None, None, None))
    inner = jax.jit(vm)
    phases_dev = jnp.asarray(base_phases)

    def step(scales):
        return inner(scales, L0, Cp, Cm, rho0s, phases_dev)

    return step, scales, plan


def run_baseline_zvode(plan, n_states: int = 4) -> float:
    """Seconds per reference-equivalent gate sim (zvode, CPU)."""
    from noisyquantumsimulator_tpu.solver.reference import mesolve_zvode
    from noisyquantumsimulator_tpu.ops.lindblad import (
        build_all_noise_operators, static_hamiltonian)
    from noisyquantumsimulator_tpu.ops.hamiltonians import drive_operator
    from noisyquantumsimulator_tpu.ops.hilbert import HS3

    S = drive_operator(HS3)
    amps = np.asarray(plan.schedule.amps)
    phases = np.asarray(plan.schedule.phases)
    dts = np.asarray(plan.schedule.dts)
    H_static = static_hamiltonian(HS3, plan.Delta, plan.V, plan.delta_zeeman,
                                  plan.delta_stark, True)
    Hsegs = [H_static + 0.5 * plan.Omega * a
             * (np.exp(1j * p) * S + np.exp(-1j * p) * S.conj().T)
             for a, p in zip(amps, phases)]
    nb = plan.noise_breakdown
    c_ops, _ = build_all_noise_operators(
        hs=HS3, gamma_r=nb["gamma_r"], gamma_bbr=nb["gamma_bbr"],
        gamma_phi_laser=nb["gamma_phi_laser"],
        gamma_phi_thermal=nb["gamma_phi_thermal"],
        gamma_phi_zeeman=nb["gamma_phi_zeeman"],
        gamma_loss_antitrap=nb["gamma_loss_antitrap"],
        gamma_loss_background=nb["gamma_loss_background"],
        gamma_scatter_intermediate=nb["gamma_scatter_intermediate"],
        gamma_leakage=nb["gamma_leakage"])

    t0 = time.perf_counter()
    for i in range(n_states):
        mesolve_zvode(Hsegs, dts, plan.rho0s[i], c_ops,
                      atol=1e-10, rtol=1e-8)
    return time.perf_counter() - t0


def main_qec(d: int = 7, rounds: int = 7, p: float = 1e-3,
             shots: int = 1 << 20):
    """Secondary benchmark (run with --qec): d=7 surface-code memory
    detector sampling throughput via the one-matmul MXU sampler
    (BASELINE.md north-star #3: exceed Stim on shots/s)."""
    import jax
    import jax.numpy as jnp
    from noisyquantumsimulator_tpu.qec.fast_sampler import build_fast_sampler
    from noisyquantumsimulator_tpu.qec.surface_code import memory_z_circuit

    circuit = memory_z_circuit(d, rounds, p=p)
    sampler = build_fast_sampler(circuit, shots)

    out = sampler(jax.random.PRNGKey(0))
    n_fire = int(jnp.sum(out["detectors"].astype(jnp.int32)))  # fence

    reps = 5
    t0 = time.perf_counter()
    tot = 0
    for r in range(reps):
        out = sampler(jax.random.PRNGKey(r + 1))
        tot += int(jnp.sum(out["detectors"].astype(jnp.int32)))  # fence
    dt = time.perf_counter() - t0

    print(json.dumps({
        "metric": f"surface_code_d{d}_sample_shots_per_sec",
        "value": round(shots * reps / dt, 0),
        "unit": "shots/s",
        "vs_baseline": None,
        "d": d, "rounds": rounds, "p": p, "shots_per_call": shots,
        "n_detectors": circuit.n_detectors,
        "detector_fraction": round(n_fire / (shots * circuit.n_detectors), 5),
        "backend": jax.devices()[0].platform,
    }))


def main():
    import jax

    backend = jax.devices()[0].platform
    batch = 32
    n_steps = 300

    step, scales, plan = build_workload(batch, n_steps)

    import jax.numpy as jnp

    # warmup / compile; a scalar host fetch is the only reliable fence on
    # the tunneled backend (block_until_ready returns early there)
    out = step(scales)
    float(jnp.sum(out))

    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        out = step(scales)
    mean_f = float(jnp.mean(out))  # fences the whole in-order queue
    dt = time.perf_counter() - t0
    sims_per_sec = batch * reps / dt

    t_ref = run_baseline_zvode(plan)
    baseline_sims_per_sec = 1.0 / t_ref

    print(json.dumps({
        "metric": "cz_lindblad_sims_per_sec",
        "value": round(sims_per_sec, 2),
        "unit": "sims/s",
        "vs_baseline": round(sims_per_sec / baseline_sims_per_sec, 2),
        "baseline_sims_per_sec": round(baseline_sims_per_sec, 4),
        "baseline": "zvode CPU, 4 basis states x 300 segments, atol 1e-10 rtol 1e-8",
        "batch": batch,
        "n_segments": n_steps,
        "backend": backend,
        "device": str(jax.devices()[0]),
        "dtype": "complex64",
        "mean_fidelity": round(mean_f, 6),
    }))


def _flag(argv, name, default, cast=int):
    if name in argv:
        return cast(argv[argv.index(name) + 1])
    return default


if __name__ == "__main__":
    import sys
    if "--qec" in sys.argv:
        main_qec(d=_flag(sys.argv, "--d", 7),
                 rounds=_flag(sys.argv, "--rounds", 7),
                 shots=_flag(sys.argv, "--shots", 1 << 20))
    else:
        main()
