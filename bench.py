"""Headline benchmark: batched 2-atom CZ Lindblad gate simulations / second.

One "sim" = a full noisy smooth-JP CZ gate simulation, exactly the
reference's hot workload (simulation.py:3485-3502): 300 piecewise-constant
segments of a 9x9 density-matrix Lindblad evolution, applied to the
computational basis states (+ the |++> phase probe). The reference solves
this with 4 x 300 sequential QuTiP mesolve calls on CPU; here the whole
schedule is ONE matrix exponential plus a scan of shared-weight matvecs
(the exact phase-frame factorization, ops/phase_frame.py), with the whole
sweep batch riding a single resident weight matrix.

Baseline: the same segment sequence integrated by the CPU zvode oracle at
the reference tolerances (atol 1e-10 / rtol 1e-8) for the 4 basis states —
a faithful stand-in for the reference's mesolve loop (same solver family,
same tolerances, same segmentation), since QuTiP is not installed here.
The oracle's final states double as the on-device parity reference,
reported at three tiers every run: the complex64 throughput path
(`parity_err_c64_vs_zvode`), an on-device float64-PLANES tier
(`parity_err_f64_device_vs_zvode` — TPU rejects complex128 but emulates
float64; the same phase-frame scan on two f64 planes meets the 1e-8
target ON the chip, measured ~1e-10), and the host x64 tier
(`parity_err_x64_vs_zvode`, ~1e-10; see tests/test_solver.py
TestPropagatorParity).

Flags: --batch N --steps N --curve --qec [--d D --rounds R --shots S]

Prints ONE JSON line:
  {"metric": "cz_lindblad_sims_per_sec", "value": N, "unit": "sims/s",
   "vs_baseline": ratio, ...extras}
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

# Persistent XLA compilation cache: the suite's wall-clock is DOMINATED by
# tunnel compiles (measured: qec_d11 child 7m16s cold, of which ~6.5 min is
# compile; a cached re-run of the d5 child went 2m35s -> 1m02s). The cache
# lives in the repo so the driver's end-of-round capture hits the entries
# this round's own runs populated. Must be set before jax backend init —
# children inherit it through the environment.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")


def build_workload(batch: int, n_steps: int = 300, dtype="complex64",
                   dim: int = 3, prec: str = "highest",
                   engine: str = "real", pallas_scan: bool = False):
    import jax
    import jax.numpy as jnp
    from noisyquantumsimulator_tpu.core.configs import SmoothJPSimulationInputs
    from noisyquantumsimulator_tpu.gate.simulate import (plan_cz_gate,
                                                         plan_phase_frame,
                                                         plan_squaring_bound)
    from noisyquantumsimulator_tpu.solver.propagator import (
        evolve_rhos_phased_many, uniform_base_propagator)
    from noisyquantumsimulator_tpu.gate.fidelity import compute_cz_fidelity
    from noisyquantumsimulator_tpu.utils.transfer import (
        device_put_complex, enable_high_precision_matmul)

    enable_high_precision_matmul()
    plan = plan_cz_gate(SmoothJPSimulationInputs(), n_steps_smooth=n_steps,
                        hilbert_space_dim=dim)
    g_np = plan_phase_frame(plan)
    assert g_np is not None, "smooth-JP plan must be phase-frame eligible"
    # complex transfers go as float planes (axon backend limitation)
    ndt = np.complex64 if dtype == "complex64" else np.complex128
    rdt = np.float32 if dtype == "complex64" else np.float64
    L0 = device_put_complex(plan.L0, ndt)
    Cp = device_put_complex(plan.Cp, ndt)
    Cm = device_put_complex(plan.Cm, ndt)
    rho0s = device_put_complex(plan.rho0s, ndt)
    base_phases = np.asarray(plan.schedule.phases, rdt)
    amp0 = float(np.asarray(plan.schedule.amps)[0])
    dt0 = float(np.asarray(plan.schedule.dts)[0])
    g = jnp.asarray(g_np.astype(rdt))

    # a realistic sweep: phase-amplitude scale factors around the optimum
    scales = jnp.asarray(np.linspace(0.95, 1.05, batch, dtype=rdt))

    # NOTE: the complex arrays MUST be jit *arguments*, not closures —
    # closed-over device arrays are inlined as MLIR constants, which forces
    # a host fetch of complex data (unsupported on the axon tunnel).
    # host-known schedule -> tight static squaring bound (each masked
    # squaring-loop trip is a full batched matmul; don't pay for unused ones)
    ms = plan_squaring_bound(plan)

    import jax.lax as lax
    precision = {"highest": lax.Precision.HIGHEST,
                 "high": lax.Precision.HIGH,
                 "default": lax.Precision.DEFAULT}[prec]

    if engine == "real":
        # real Hermitian-basis engine (solver/real_rep.py): the same
        # phase-frame algorithm on the D^2 REAL coordinates of rho —
        # ONE real matmul per segment instead of a complex one (4 MXU
        # passes -> 1 at identical tile shapes; VERDICT r2 weak #5)
        from noisyquantumsimulator_tpu.solver.real_rep import (
            build_real_rep, evolve_real_phased_many, from_real_coords,
            real_propagator_device, to_real_coords)
        D = dim * dim
        rep = build_real_rep(g_np, D)
        # real tables ride as jit ARGUMENTS like the complex operands
        # (closed-over device arrays inline as MLIR constants -> host
        # fetch, unsupported on the axon tunnel)
        tables = (jnp.asarray(rep.Wr.astype(rdt)),
                  jnp.asarray(rep.Wi.astype(rdt)),
                  jnp.asarray(rep.cq.astype(rdt)))

        # opt-in VMEM-resident Pallas scan (solver/scan_pallas.py):
        # probe at build time (outside jit), fall back where Mosaic is
        # unavailable; off by default pending a measured on-chip win
        evolve_many = evolve_real_phased_many
        if pallas_scan:
            from noisyquantumsimulator_tpu.solver.scan_pallas import (
                evolve_real_phased_many_pallas, scan_pallas_available)
            if scan_pallas_available():
                def evolve_many(U_real, cq, ph, x0, D, P, precision=None):
                    return evolve_real_phased_many_pallas(
                        U_real, cq, ph, x0, D, P)

        def step_fn(scales, L0, Cp, Cm, rho0s, phases, tables):
            Wr, Wi, cq = tables
            Ub = uniform_base_propagator(L0, Cp, Cm, amp0, dt0,
                                         max_squarings=ms)
            U_real = real_propagator_device(Ub, Wr, Wi)
            x0 = to_real_coords(rho0s, Wr, Wi)
            out = evolve_many(
                U_real, cq, scales[:, None] * phases[None], x0,
                D, rep.P, precision=precision)
            rhos = from_real_coords(out, Wr, Wi)

            def fid(rhos_b):
                _, avg, _ = compute_cz_fidelity(rhos_b, plan.kets)
                return avg

            return jax.vmap(fid)(rhos)

        inner = jax.jit(step_fn)
        phases_dev = jnp.asarray(base_phases)

        def step(scales):
            return inner(scales, L0, Cp, Cm, rho0s, phases_dev, tables)

        return step, scales, plan
    else:
        def step_fn(scales, L0, Cp, Cm, rho0s, phases):
            # ONE expm for the whole sweep: U_base is phase- and
            # scale-free; then ONE shared-weight matvec scan for every
            # sim at once (solver/propagator.evolve_rhos_phased_many)
            Ub = uniform_base_propagator(L0, Cp, Cm, amp0, dt0,
                                         max_squarings=ms)
            rhos = evolve_rhos_phased_many(
                Ub, g, scales[:, None] * phases[None], rho0s,
                precision=precision)

            def fid(rhos_b):
                _, avg, _ = compute_cz_fidelity(rhos_b, plan.kets)
                return avg

            return jax.vmap(fid)(rhos)

    inner = jax.jit(step_fn)
    phases_dev = jnp.asarray(base_phases)

    def step(scales):
        return inner(scales, L0, Cp, Cm, rho0s, phases_dev)

    return step, scales, plan


def run_baseline_zvode(plan, n_states: int = 4):
    """(seconds, final rhos (n_states, D, D)) for the reference-equivalent
    gate sim via the CPU zvode oracle at reference tolerances.

    Deliberately does NOT integrate the plan's own L0/Cp/Cm: the per-
    segment Hamiltonians and collapse operators are rebuilt here from the
    plan's scalar metadata (rates, detunings, polarization), so the parity
    numbers also check the planner's Liouvillian assembly, not just the
    propagator. Dimension-agnostic (3-level and mJ-resolved 4-level)."""
    from noisyquantumsimulator_tpu.solver.reference import mesolve_zvode
    from noisyquantumsimulator_tpu.ops.lindblad import (
        build_all_noise_operators, static_hamiltonian)
    from noisyquantumsimulator_tpu.ops.hamiltonians import drive_operator
    from noisyquantumsimulator_tpu.ops.hilbert import HS3, HS4

    hs = HS3 if plan.hilbert_space_dim == 3 else HS4
    pol = plan.pulse_info.get("polarization", "sigma+")
    zs = plan.pulse_info.get("zeeman_splitting_r", 0.0)
    S = drive_operator(hs, polarization=pol)
    amps = np.asarray(plan.schedule.amps)
    phases = np.asarray(plan.schedule.phases)
    dts = np.asarray(plan.schedule.dts)
    H_static = static_hamiltonian(hs, plan.Delta, plan.V, plan.delta_zeeman,
                                  plan.delta_stark, plan.trap_laser_on,
                                  zeeman_splitting=zs)
    Hsegs = [H_static + 0.5 * plan.Omega * a
             * (np.exp(1j * p) * S + np.exp(-1j * p) * S.conj().T)
             for a, p in zip(amps, phases)]
    nb = plan.noise_breakdown
    c_ops, _ = build_all_noise_operators(
        hs=hs, gamma_r=nb.get("gamma_r", 0.0),
        gamma_bbr=nb.get("gamma_bbr", 0.0),
        gamma_phi_laser=nb.get("gamma_phi_laser", 0.0),
        gamma_phi_thermal=nb.get("gamma_phi_thermal", 0.0),
        gamma_phi_zeeman=nb.get("gamma_phi_zeeman", 0.0),
        gamma_loss_antitrap=nb.get("gamma_loss_antitrap", 0.0),
        gamma_loss_background=nb.get("gamma_loss_background", 0.0),
        gamma_scatter_intermediate=nb.get("gamma_scatter_intermediate", 0.0),
        gamma_leakage=nb.get("gamma_leakage", 0.0),
        branching_1=nb.get("branching_1", 0.5),
        mJ_leakage_rate=nb.get("mJ_leakage_rate", 0.0))

    rhos = []
    t0 = time.perf_counter()
    for i in range(n_states):
        rhos.append(mesolve_zvode(Hsegs, dts, plan.rho0s[i], c_ops,
                                  atol=1e-10, rtol=1e-8))
    return time.perf_counter() - t0, np.stack(rhos)


def _state_fidelity(rho, sigma):
    """Uhlmann fidelity (tr sqrt(sqrt(rho) sigma sqrt(rho)))^2 via eigh
    (robust for the near-pure states here, unlike scipy.sqrtm)."""
    rho = np.asarray(rho, np.complex128)
    sigma = np.asarray(sigma, np.complex128)
    w, v = np.linalg.eigh(0.5 * (rho + rho.conj().T))
    s = (v * np.sqrt(np.clip(w, 0.0, None))) @ v.conj().T
    m = s @ sigma @ s
    wm = np.linalg.eigvalsh(0.5 * (m + m.conj().T))
    return float(np.sum(np.sqrt(np.clip(wm, 0.0, None))) ** 2)


def _phase_frame_numpy_x64(plan):
    """Host complex128 implementation of the same phase-frame algorithm
    (scipy expm + ordered product) — the x64 verification tier reported
    alongside the complex64 device parity number."""
    from scipy.linalg import expm as sexpm
    from noisyquantumsimulator_tpu.gate.simulate import plan_phase_frame
    g = plan_phase_frame(plan)
    amps = np.asarray(plan.schedule.amps)
    dts = np.asarray(plan.schedule.dts)
    ph = np.asarray(plan.schedule.phases, np.float64)
    Ub = sexpm((plan.L0 + amps[0] * (plan.Cp + plan.Cm)) * dts[0])
    U = np.eye(Ub.shape[0], dtype=np.complex128)
    prev = None
    for k in range(len(ph)):
        W = Ub if prev is None else \
            Ub * np.exp(1j * (prev - ph[k]) * g)[None, :]
        U = W @ U
        prev = ph[k]
    U = (np.exp(1j * ph[-1] * g)[:, None] * U
         * np.exp(-1j * ph[0] * g)[None, :])
    D = plan.rho0s.shape[-1]
    vec = plan.rho0s[:4].reshape(4, D * D)
    return (vec @ U.T).reshape(4, D, D)


def measure_parity_f64_device(plan):
    """On-device f64 tier: the same phase-frame algorithm on two float64
    PLANES (TPU rejects complex128 but emulates float64), meeting the
    1e-8 mesolve-parity target on the chip itself. Returns the final
    (4, D, D) complex states and the per-4-state-sim wall time; the
    caller (measure_parity) computes 1 - F vs the zvode oracle."""
    import jax
    import jax.numpy as jnp
    from noisyquantumsimulator_tpu.gate.simulate import (plan_phase_frame,
                                                         plan_squaring_bound)
    from noisyquantumsimulator_tpu.ops.expm import expm_planes
    from noisyquantumsimulator_tpu.solver.propagator import (
        evolve_rhos_phased_planes)

    g = plan_phase_frame(plan)
    amp0 = float(np.asarray(plan.schedule.amps)[0])
    dt0 = float(np.asarray(plan.schedule.dts)[0])
    A = (plan.L0 + amp0 * (plan.Cp + plan.Cm)) * dt0
    with jax.enable_x64(True):
        Ar = jnp.asarray(A.real.astype(np.float64))
        Ai = jnp.asarray(A.imag.astype(np.float64))
        gd = jnp.asarray(g.astype(np.float64))
        phd = jnp.asarray(np.asarray(plan.schedule.phases, np.float64))
        r0r = jnp.asarray(plan.rho0s[:4].real.astype(np.float64))
        r0i = jnp.asarray(plan.rho0s[:4].imag.astype(np.float64))
        # +1: the f64 tier scales to theta = 1.0 (vs 1.8 for the f32
        # bound plan_squaring_bound computes)
        ms = plan_squaring_bound(plan) + 1
        Ubr, Ubi = expm_planes(Ar, Ai, max_squarings=ms)
        outr, outi = evolve_rhos_phased_planes(Ubr, Ubi, gd, phd, r0r, r0i)
        np.asarray(outr)  # warm-up fence
        t0 = time.perf_counter()
        outr, outi = evolve_rhos_phased_planes(Ubr, Ubi, gd, phd, r0r, r0i)
        rh = np.asarray(outr) + 1j * np.asarray(outi)
        dt_run = time.perf_counter() - t0
    return rh, dt_run


def measure_parity(plan, rhos_zvode, dtype="complex64",
                   prec: str = "highest"):
    """Worst-case 1 - F(device state, zvode-oracle state) over the 4
    computational basis states for the device dtype path (VERDICT r1 #4:
    the parity number for the dtype the chip actually runs)."""
    import jax.numpy as jnp
    from noisyquantumsimulator_tpu.gate.simulate import (plan_phase_frame,
                                                         plan_squaring_bound)
    from noisyquantumsimulator_tpu.solver.propagator import (
        evolve_rhos_phased, uniform_base_propagator)
    from noisyquantumsimulator_tpu.utils.transfer import (device_get_complex,
                                                          device_put_complex)

    ndt = np.complex64 if dtype == "complex64" else np.complex128
    rdt = np.float32 if dtype == "complex64" else np.float64
    g = plan_phase_frame(plan)
    L0 = device_put_complex(plan.L0, ndt)
    Cp = device_put_complex(plan.Cp, ndt)
    Cm = device_put_complex(plan.Cm, ndt)
    rho0s = device_put_complex(plan.rho0s[:4], ndt)
    ms = plan_squaring_bound(plan)
    Ub = uniform_base_propagator(
        L0, Cp, Cm, float(np.asarray(plan.schedule.amps)[0]),
        float(np.asarray(plan.schedule.dts)[0]), max_squarings=ms)
    import jax.lax as lax
    precision = {"highest": lax.Precision.HIGHEST,
                 "high": lax.Precision.HIGH,
                 "default": lax.Precision.DEFAULT}[prec]
    rhos_dev = evolve_rhos_phased(
        Ub, jnp.asarray(g.astype(rdt)),
        jnp.asarray(np.asarray(plan.schedule.phases, rdt)), rho0s,
        precision=precision)
    rhos_host = device_get_complex(rhos_dev)
    errs = [1.0 - _state_fidelity(rhos_host[i], rhos_zvode[i])
            for i in range(4)]
    # the real Hermitian-basis throughput engine's own parity tier (one
    # jit: op-by-op complex formation is unsupported on the axon tunnel)
    from noisyquantumsimulator_tpu.solver.real_rep import (
        build_real_rep, evolve_real_phased, from_real_coords,
        real_propagator_device, to_real_coords)
    import jax as _jax
    D = plan.rho0s.shape[-1]
    rep = build_real_rep(g, D)

    @_jax.jit
    def _real_path(Ub, rho0s, phases, Wr, Wi, cq):
        x0 = to_real_coords(rho0s, Wr, Wi)
        xf = evolve_real_phased(
            real_propagator_device(Ub, Wr, Wi), cq, phases, x0, D, rep.P,
            precision=precision)
        return from_real_coords(xf, Wr, Wi)

    rhos_real = device_get_complex(_real_path(
        Ub, rho0s, jnp.asarray(np.asarray(plan.schedule.phases, rdt)),
        jnp.asarray(rep.Wr.astype(rdt)), jnp.asarray(rep.Wi.astype(rdt)),
        jnp.asarray(rep.cq.astype(rdt))))
    errs_real = [1.0 - _state_fidelity(rhos_real[i], rhos_zvode[i])
                 for i in range(4)]
    rhos_x64 = _phase_frame_numpy_x64(plan)
    errs64 = [1.0 - _state_fidelity(rhos_x64[i], rhos_zvode[i])
              for i in range(4)]
    rhos_f64dev, t_f64 = measure_parity_f64_device(plan)
    errs_f64 = [1.0 - _state_fidelity(rhos_f64dev[i], rhos_zvode[i])
                for i in range(4)]
    return (float(np.max(np.abs(errs))), float(np.max(np.abs(errs64))),
            float(np.max(np.abs(errs_f64))), t_f64,
            float(np.max(np.abs(errs_real))))


def wilson_ci(k: int, n: int, z: float = 1.96):
    """95% Wilson CI for every published p_L cell (VERDICT r3 #2);
    canonical implementation lives in utils.math, shared with studies."""
    from noisyquantumsimulator_tpu.utils.math import wilson_ci as _w
    return _w(k, n, z)


def _sims_per_sec(step, scales, batch, reps=10):
    import jax.numpy as jnp
    out = step(scales)
    float(jnp.sum(out))  # warm-up fence (block_until_ready lies on axon)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = step(scales)
    mean_f = float(jnp.mean(out))  # fences the whole in-order queue
    dt = time.perf_counter() - t0
    return batch * reps / dt, mean_f


def main_qec(d: int = 7, rounds: int = 7, p: float = 1e-3,
             shots: int = 1 << 20, decode_shots: int = 1 << 17,
             reps_decode: int = 3, seed: int = 0):
    """Secondary benchmark (run with --qec): d=7 surface-code memory
    detector sampling throughput via the one-matmul MXU sampler
    (BASELINE.md north-star #3: exceed Stim on shots/s), plus the honest
    end-to-end number: sample + EXACT on-device MWPM decode + p_L, all
    inside one jitted call (VERDICT r1 #3/#4)."""
    import jax
    import jax.numpy as jnp
    from noisyquantumsimulator_tpu.qec.fast_sampler import build_fast_sampler
    from noisyquantumsimulator_tpu.qec.surface_code import memory_z_circuit
    from noisyquantumsimulator_tpu.qec.exact_matcher import (
        tiered_matcher_for_circuit)

    circuit = memory_z_circuit(d, rounds, p=p)
    # sample in blocks: the RNG scratch is (block, n_fault_channels) u32,
    # which OOMs HBM at d >= 9 with 2^20-shot calls — block size caps the
    # scratch while the loop reaches any total shot count. d <= 7 keeps
    # the full 2^20 block (fits, and throughput peaks there: 9.09M vs
    # 4.7M shots/s measured at 2^18 blocks on v5e)
    block = min(shots, 1 << 20 if d <= 7 else 1 << 18)
    n_blocks = max(1, -(-shots // block))   # ceil: never under-run --shots
    sampler = build_fast_sampler(circuit, block)

    out = sampler(jax.random.PRNGKey(0))
    int(jnp.sum(out["detectors"].astype(jnp.int32)))  # warm-up fence

    reps = 5 * n_blocks
    t0 = time.perf_counter()
    tot = 0
    for r in range(reps):
        out = sampler(jax.random.PRNGKey(r + 1))
        tot += int(jnp.sum(out["detectors"].astype(jnp.int32)))  # fence
    dt = time.perf_counter() - t0
    shots_done = block * reps

    # ---- end-to-end: sample + exact DP matching decode, one jit ----
    # tiered: K=6 DP on every shot, K=12 DP on the compacted heavy tail —
    # exact within the K=12 budget (bit-identical to the pure K=12 DP).
    # chunk/capacity measured on v5e at d=7: 16384/1024 -> 768k shots/s
    # in this bench (936k in an isolated-decoder A/B) vs 600k at 4096/512
    # (the DP is latency-bound in its ~7 sequential levels of small
    # matmuls; bigger chunks amortize the fixed op cost).
    # d >= 9: the mean defect count blows any per-shot K budget, so
    # decoding slides over round windows, each decoded exactly
    # (examples/qec_scale_study.py has the regime map + measurements)
    import numpy as np_
    from noisyquantumsimulator_tpu.qec.dem import build_dem, dem_to_edges
    from noisyquantumsimulator_tpu.qec.native import (NativeMatchingDecoder,
                                                      native_available)
    K = 12
    edges, eprobs, eobs = dem_to_edges(build_dem(circuit))
    nat = (NativeMatchingDecoder(circuit.n_detectors, edges, eprobs, eobs)
           if native_available() else None)
    # escalation fetch capacity: d=11 cluster flags reach ~10% of shots;
    # d>=13 ~20% even with the K=14/16 gather tiers (the size>16
    # component tail is 18.7% of shots — docs/TPU_ENGINES.md)
    cap = min(decode_shots,
              max(decode_shots // 8 if d <= 11 else (2 * decode_shots) // 5,
                  64))
    if d <= 7:
        chunk = min(16384, decode_shots)
        dec = tiered_matcher_for_circuit(circuit, k_light=6, k_heavy=K,
                                         chunk=chunk,
                                         heavy_capacity=min(chunk, max(chunk // 16, 64)))
        decoder_name = (f"on-device exact MWPM (tiered bitmask DP, "
                        f"K=6 all shots / K={K} heavy tail)"
                        + (" + host exact cluster decode of >K-defect "
                           "shots" if nat else ""))
    else:
        from noisyquantumsimulator_tpu.qec.cluster_matcher import (
            ClusterMatcherTPU, default_tiers)
        # on-device exact cluster decomposition (cluster_matcher.py):
        # whole-shot true MWPM whenever every spatial component fits the
        # size-class DP budgets; shots holding a bigger component raise
        # the per-shot flag (~0.5% at d=9, ~8% at d=11, p=1e-3) and are
        # re-decoded exactly on the host (or keep their in-budget
        # component decode when the native library is absent).
        # max_slots=24 fits p~1e-3 defect counts to d~13 (nd > 24 shots
        # flag to the same exact host path) and cuts every (S, MD, *)
        # tensor ~40% vs the 32-slot default; with it the 4096-chunk is
        # stable at d=11 too (the old 32-slot chunk had to halve there)
        chunk = min(4096, decode_shots)
        dec = ClusterMatcherTPU(circuit.n_detectors, edges, eprobs, eobs,
                                chunk=chunk, max_slots=24,
                                tiers=default_tiers(circuit.n_detectors))
        decoder_name = ("on-device exact cluster decomposition "
                        "(K=6/8/10/12 size-class DPs)"
                        + (" + host exact cluster decode of flagged shots"
                           if nat else " (flagged shots keep the partial "
                           "device decode)"))
    sampler_dec = build_fast_sampler(circuit, decode_shots)

    def sample_stage(key):
        o = sampler_dec(key)
        return o["detectors"].astype(jnp.uint8), \
            o["observables"][:, 0].astype(jnp.int32)

    def finalize(dets, obs, preds, ovfs):
        err = (preds ^ obs) & 1
        _, idx = jax.lax.top_k(ovfs.astype(jnp.int32), cap)
        # bit-pack the escalation rows ON DEVICE: the tunneled fetch of
        # (cap, n_det) uint8 measured ~14 MB/s — 0.84 s of a 2.2 s d=11
        # rep — so ship bits, not bytes (8x smaller; np.unpackbits order)
        n_det = circuit.n_detectors
        n8 = -(-n_det // 8) * 8
        bitw = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.int32)
        dets_c = jnp.take(dets, idx, axis=0).astype(jnp.int32)
        packed = jnp.sum(jnp.pad(dets_c, ((0, 0), (0, n8 - n_det))).reshape(
            cap, n8 // 8, 8) * bitw[None, None, :], axis=2).astype(jnp.uint8)
        # without the native library the device prediction stands on
        # flagged shots too (greedy tier / truncated-K served them)
        n_err = (jnp.sum(err) if nat is None
                 else jnp.sum(jnp.where(ovfs, 0, err)))
        return (n_err, jnp.sum(ovfs), packed,
                jnp.take(obs, idx), jnp.take(ovfs, idx))

    def escalate_host(packed_f, obs_f, ovf_f):
        """Exact cluster re-decode of the flagged rows; their errors."""
        sel = np_.asarray(ovf_f)
        if nat is None or not sel.any():
            # no native library: count the device prediction's errors on
            # flagged rows (greedy tier already served them)
            return 0
        dets_h = np_.unpackbits(
            np_.asarray(packed_f)[sel], axis=1)[:, :circuit.n_detectors]
        pred_h = nat.decode_batch_ex(dets_h, mode=0)["pred"] & 1
        return int(np_.sum(pred_h != (np_.asarray(obs_f)[sel] & 1)))

    # sample + finalize are single jits; the decode chunks are driven
    # from a HOST loop (async dispatch pipelines them — measured equal
    # to lax.map — and the cluster decoder's sub-f32 table dots crash
    # the tunneled v5e worker under lax.map)
    sample_j = jax.jit(sample_stage)
    finalize_j = jax.jit(finalize)
    S = decode_shots
    n_ch = S // chunk

    def e2e_j(key):
        dets, obs = sample_j(key)
        if d <= 7:
            outs = [dec.decode_device(dets[i * chunk:(i + 1) * chunk])
                    for i in range(n_ch)]
            preds = jnp.concatenate(outs)
            ovfs = jnp.sum(dets.astype(jnp.int32), axis=1) > K
        else:
            outs = [dec.decode_device_with_overflow(
                dets[i * chunk:(i + 1) * chunk]) for i in range(n_ch)]
            preds = jnp.concatenate([p for p, _ in outs])
            ovfs = jnp.concatenate([o for _, o in outs])
        return finalize_j(dets, obs, preds, ovfs)

    int(e2e_j(jax.random.PRNGKey(100))[0])  # fence
    reps_d = reps_decode
    t0 = time.perf_counter()
    errs = ovf = 0
    # dispatch EVERY rep's device work first (async), then drain: rep r's
    # single-core host escalation runs while reps r+1.. still execute on
    # the device, so the native re-decode rides inside the device
    # wall-clock instead of extending it. Seeds derive from --seed so
    # studies can vary the shot stream across blocks (VERDICT r3 #2: the
    # old fixed keys 200-202 enshrined a 3-sigma-low p_L draw as canon).
    outs = [e2e_j(jax.random.PRNGKey(1000 * seed + 200 + r))
            for r in range(reps_d)]
    for o in outs:
        # start the packed escalation-row fetches immediately: the
        # tunneled device->host copy (~14 MB/s) then overlaps device
        # compute instead of serializing into the host-decode drain
        # (same fix as examples/qec_scale_study.py; worth ~1.3x at d=11)
        for a in o:
            try:
                a.copy_to_host_async()
            except AttributeError:
                break
    for n_err, n_ovf, packed_f, obs_f, ovf_f in outs:
        if nat is not None and int(n_ovf) > cap:
            # flagged shots beyond the fetch cap would keep (uncounted)
            # window predictions — refuse to publish a silent undercount
            raise RuntimeError(
                f"escalation fetch cap {cap} < flagged {int(n_ovf)}")
        errs += int(n_err) + escalate_host(packed_f, obs_f, ovf_f)
        ovf += int(n_ovf)
    dt_d = time.perf_counter() - t0
    n_dec = decode_shots * reps_d

    print(json.dumps({
        "metric": f"surface_code_d{d}_sample_shots_per_sec",
        "value": round(shots_done / dt, 0),
        "unit": "shots/s",
        "vs_baseline": None,
        "d": d, "rounds": rounds, "p": p, "shots_per_call": block,
        "n_detectors": circuit.n_detectors,
        "detector_fraction": round(tot / (shots_done * circuit.n_detectors),
                                   5),
        "backend": jax.devices()[0].platform,
        "e2e_sample_decode_shots_per_sec": round(n_dec / dt_d, 0),
        "e2e_decoder": decoder_name,
        "e2e_p_logical_shot": errs / n_dec,
        "e2e_n_errors": errs,
        "e2e_n_decoded": n_dec,
        "e2e_p_logical_ci95": list(wilson_ci(errs, n_dec)),
        "e2e_escalated_fraction": ovf / n_dec,
        "seed": seed,
        # canon-vs-study reconciliation (VERDICT r4 weak #7): this
        # driver-captured record is the number of RECORD for e2e
        # throughput; examples/qec_scale.json measures the same workload
        # with a larger rep budget (26-36 vs 3), which amortizes the
        # first-rep pipeline fill further — same decoder, same exactness
        "throughput_note": (
            f"canonical record; reps_decode={reps_d} — "
            "examples/qec_scale.json uses 26-36 reps (better pipeline "
            "amortization), same decode path"),
    }))


def main_bb(rounds: int = 3, p: float = 1e-3, shots: int = 8192,
            fast_iters: int = 6, seed: int = 0, reps: int = 3):
    """Tertiary benchmark (--bb): gross-code [[144,12,12]] circuit-level
    memory, sample + DEM-BP decode + per-observable failure check.

    The device stage is ONE jitted call: sample, tiered BP (fast_iters
    min-sum on every shot in the dense slot layout, full-depth BP on the
    compacted non-converged tail), failure scoring, and compaction of the
    still-unconverged residue (dets + beliefs + observed bits). The host
    stage runs C++ OSD-0 on that residue — INSIDE the timed loop, so the
    reported shots/s carries OSD-class accuracy, not a pure-BP shortcut."""
    import jax
    import jax.numpy as jnp
    import numpy as np_
    from noisyquantumsimulator_tpu.qec.dem_decoder import DemBPDecoder
    from noisyquantumsimulator_tpu.qec.fast_sampler import build_fast_sampler
    from noisyquantumsimulator_tpu.qec.ldpc import (bb_memory_circuit,
                                                    css_n_k, gross_code)

    Hx, Hz = gross_code()
    n, k = css_n_k(Hx, Hz)
    circuit = bb_memory_circuit(Hx, Hz, rounds, p)
    sampler = build_fast_sampler(circuit, shots)
    # bf16 fast tier: BP is HBM-bandwidth-bound and a fast-tier result
    # is only kept after an exact int32 residual-syndrome check, so the
    # reduced precision costs retries, never correctness. The retry
    # tier runs damped min-sum (min-sum with memory) — it converges
    # ~10x more of the tail than the plain 60-iter retry, so the host
    # OSD residue and its device->host fetch nearly vanish.
    # round-5 profile (examples/profile_bb.json): fast BP was 206 ms
    # of the 278 ms decode and the 2048-row retry 81 ms against a ~37-
    # shot actual tail — 6 fast iters + a 512-row retry keep the same
    # exact-checked accuracy path at ~2/3 the device cost. The lean
    # budgets are sized for the benched p=1e-3 regime; above it the
    # 6-iter tail outgrows them (measured p=2e-3: 1,325 non-converged
    # of 65k > the shots//64 fetch cap, loud RuntimeError by design),
    # so higher rates keep the round-4 budgets.
    lean = p <= 1.5e-3
    eff_iters = fast_iters if lean else max(fast_iters, 8)
    dec = DemBPDecoder(circuit, n_iters=60, kernel="slots",
                       fast_iters=eff_iters,
                       fast_dtype=jnp.bfloat16,
                       retry_damping=0.5, retry_iters=90,
                       retry_cap_divisor=128 if lean else 32)
    bits = jnp.arange(k, dtype=jnp.int32)
    # residual-compaction rows (host-OSD fetch)
    cap = min(shots, max(shots // (64 if lean else 16), 32))

    def e2e(key):
        o = sampler(key)
        pred, bad, beliefs = dec._full(o["detectors"].astype(jnp.float32))
        obs = o["observables"].astype(jnp.int32)          # (S, k)
        pb = (pred[:, None] >> bits[None, :]) & 1
        fail = jnp.any(pb != obs, axis=1)
        # converged shots are final; non-converged ones ship to host OSD
        _, idx = jax.lax.top_k(bad.astype(jnp.int32), cap)
        take = lambda a: jnp.take(a, idx, axis=0)  # noqa: E731
        return (jnp.sum(fail & ~bad), jnp.sum(bad),
                take(o["detectors"].astype(jnp.uint8)), take(beliefs),
                take(obs))

    e2e_j = jax.jit(e2e)
    RBLK = 64
    _w = e2e_j(jax.random.PRNGKey(0))
    int(_w[0])  # warm-up fence
    for _a in _w[2:5]:
        np_.asarray(_a[:RBLK])  # warm the fixed-shape residue fetch path

    # Residue fetch blocks: a varying [:nb] slice shape recompiles per
    # distinct nb on a tunneled backend (measured ~0.5 s per fresh
    # slice executable), and fetching the FULL cap block for a partial
    # residue pays the ~14 MB/s tunnel for dead rows (measured round 5:
    # the p=2e-3 point dropped 67k -> 46k shots/s when the cap grew to
    # shots//16 while the residue stayed ~950 rows). Power-of-two
    # blocks bound the executable count at log2(cap/RBLK) while never
    # fetching more than 2x the residue.

    def _fetch_block(nb):
        lim = RBLK
        while lim < nb:
            lim <<= 1
        return min(lim, cap)

    def osd_host(nb, dets_r, bel_r, obs_r):
        """OSD-0 the residue rows; returns failures among them."""
        if nb == 0:
            return 0
        lim = _fetch_block(nb)
        dets_h = np_.asarray(dets_r[:lim])[:nb]
        bel_h = np_.asarray(bel_r[:lim])[:nb]
        obs_h = np_.asarray(obs_r[:lim])[:nb]
        try:
            from noisyquantumsimulator_tpu.qec.native import (
                osd0_batch_native)
            est = osd0_batch_native(dec.H, dets_h, bel_h)
        except (OSError, AttributeError):
            from noisyquantumsimulator_tpu.qec.ldpc import _osd0
            est = np_.stack([_osd0(dec.H, dets_h[i], bel_h[i])
                             for i in range(dets_h.shape[0])])
        obs_cols = np_.stack([(dec.obs_mask >> b) & 1 for b in range(k)],
                             axis=1)                      # (n_var, k)
        pb = (est.astype(np_.int64) @ obs_cols) & 1       # (R, k)
        return int((pb != obs_h).any(axis=1).sum())

    t0 = time.perf_counter()
    fails = bad = 0
    # dispatch every rep before syncing any: XLA queues the device work
    # back-to-back and the host OSD of rep r overlaps rep r+1's compute
    outs = [e2e_j(jax.random.PRNGKey(1000 * seed + 100 + r))
            for r in range(reps)]
    for f, b, dets_r, bel_r, obs_r in outs:
        nb = int(b)
        if nb > cap:
            raise RuntimeError(  # see main_qec: no silent undercounts
                f"residue fetch cap {cap} < non-converged {nb}")
        fails += int(f) + osd_host(nb, dets_r, bel_r, obs_r)
        bad += nb
    dt = time.perf_counter() - t0
    n_tot = shots * reps

    rec = {
        "metric": "gross_code_e2e_sample_bp_decode_shots_per_sec",
        "value": round(n_tot / dt, 0),
        "unit": "shots/s",
        "vs_baseline": None,
        "code": f"[[{n},{k}]]", "rounds": rounds, "p": p,
        "n_detectors": circuit.n_detectors,
        "n_mechanisms": dec.n_mech,
        "backend": jax.devices()[0].platform,
        "decoder": (f"tiered slot-BP (min-sum {eff_iters} iters bf16 + "
                    "damped min-sum 90-iter retry) + C++ OSD-0 on the "
                    "non-converged residue"),
        "e2e_p_logical_shot": fails / n_tot,
        "e2e_n_errors": fails,
        "e2e_n_decoded": n_tot,
        "e2e_p_logical_ci95": list(wilson_ci(fails, n_tot)),
        "bp_nonconverged_frac": bad / n_tot,
        "seed": seed,
    }
    print(json.dumps(rec))
    return rec


def main(batch: int = 128, n_steps: int = 300, curve: bool = False,
         dim: int = 3, prec: str = "highest", engine: str = "real",
         pallas_scan: bool = False):
    import jax

    backend = jax.devices()[0].platform
    step, scales, plan = build_workload(batch, n_steps, dim=dim, prec=prec,
                                        engine=engine,
                                        pallas_scan=pallas_scan)
    sims_per_sec, mean_f = _sims_per_sec(step, scales, batch)

    batch_curve = []
    if curve:
        for b in (128, 512, 2048, 4096, 8192, 16384, 32768, 65536):
            if b == batch:
                batch_curve.append({"batch": b,
                                    "sims_per_sec": round(sims_per_sec, 2)})
                continue
            s2, sc2, _ = build_workload(b, n_steps, dim=dim, prec=prec,
                                        engine=engine)
            v, _ = _sims_per_sec(s2, sc2, b)
            batch_curve.append({"batch": b, "sims_per_sec": round(v, 2)})

    t_ref, rhos_zvode = run_baseline_zvode(plan)
    baseline_sims_per_sec = 1.0 / t_ref
    (parity_err, parity_err_x64, parity_err_f64dev,
     t_f64dev, parity_err_real) = measure_parity(plan, rhos_zvode, prec=prec)

    # useful-math FLOP accounting per sim (unpadded superoperator algebra;
    # a complex matmul = 8 M K N real FLOPs, the real Hermitian-basis
    # engine's is 2 M K N): the matvec scan does one
    # (n_states, D^2) x (D^2, D^2) shared-weight matmul plus elementwise
    # phase rotations per segment; the shared U_base expm is amortized
    # across the batch. (The previous tree engine did ~64x more FLOPs per
    # sim for the same physics — "useful GFLOP/s" here measures
    # algorithm-level work, so it DROPS when the algorithm gets smarter.)
    D2 = plan.L0.shape[0]
    n_states = plan.rho0s.shape[0]
    mm = 2 if engine == "real" else 8
    flops_per_sim = n_steps * (mm * n_states * D2 ** 2 + 20 * n_states * D2)
    achieved_gflops = sims_per_sec * flops_per_sim / 1e9

    out = {
        "metric": "cz_lindblad_sims_per_sec",
        "value": round(sims_per_sec, 2),
        "unit": "sims/s",
        "vs_baseline": round(sims_per_sec / baseline_sims_per_sec, 2),
        "baseline_sims_per_sec": round(baseline_sims_per_sec, 4),
        "baseline": "zvode CPU, 4 basis states x 300 segments, atol 1e-10 rtol 1e-8",
        "batch": batch,
        "n_segments": n_steps,
        "hilbert_dim": dim,
        "backend": backend,
        "device": str(jax.devices()[0]),
        "dtype": "float32 (real Hermitian basis)" if engine == "real"
                 else "complex64",
        "matmul_precision": prec,
        "mean_fidelity": round(mean_f, 6),
        "parity_err_throughput_path_vs_zvode": (
            parity_err_real if engine == "real" else parity_err),
        "parity_err_c64_vs_zvode": parity_err,
        "parity_err_real_f32_vs_zvode": parity_err_real,
        "parity_err_x64_vs_zvode": parity_err_x64,
        "parity_err_f64_device_vs_zvode": parity_err_f64dev,
        "f64_device_sims_per_sec": round(1.0 / t_f64dev, 2),
        "achieved_useful_gflops": round(achieved_gflops, 1),
        "engine": ("phase-frame, real Hermitian basis: one expm + "
                   "shared-weight REAL matvec scan (solver/real_rep.py)"
                   if engine == "real" else
                   "phase-frame: one expm + shared-weight matvec scan"),
    }
    if batch_curve:
        out["batch_curve"] = batch_curve
    print(json.dumps(out))


def _flag(argv, name, default, cast=int):
    if name in argv:
        return cast(argv[argv.index(name) + 1])
    return default


def _git_commit() -> str:
    """Short commit hash for provenance stamping (VERDICT r3 #6) — every
    canon record carries the commit it was measured at, so stale numbers
    are detectable instead of silently contradicting newer ones."""
    import os
    import subprocess
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
            cwd=os.path.dirname(os.path.abspath(__file__))
        ).stdout.strip() or "unknown"
    except Exception:
        return "unknown"


# The canonical record suites (VERDICT r2 #4, r3 #1): README quotes the
# BENCH_CANON.json records (examples/gen_readme_table.py), eliminating
# prose/bench drift. Children run in their own process so a tunneled-TPU
# worker crash in one workload cannot take down the suite (observed at
# d >= 9 in round 2), and so TPU jobs never overlap.
#
# The DEFAULT suite is time-budgeted to fit the driver's capture window
# (~15 min total measured on the tunneled v5e; BENCH_r03 rc=124 proved
# the full-budget suite's 12,600 s of sub-timeouts cannot). Statistical
# depth (>= 100-error p_L cells) lives in examples/qec_scale_study.py and
# the --full suite, not in the driver path; every p_L this suite prints
# carries its error COUNT and a 95% CI so low-count cells are labeled.
_SUITE = [
    ("gate_dim3", ["--one-gate"], 300),
    ("gate_dim4", ["--one-gate", "--dim4"], 300),
    # decode reps sized so the published p_L carries >= ~100 expected
    # errors at d <= 9 (VERDICT r3 #2); at d = 11 the count + CI are the
    # published quantity (100 errors would need ~160 M shots)
    ("qec_d7", ["--qec", "--d", "7", "--rounds", "7",
                "--shots", str(1 << 20), "--reps-decode", "6"], 420),
    ("qec_d9", ["--qec", "--d", "9", "--rounds", "9",
                "--shots", str(1 << 18), "--decode-shots", str(1 << 17),
                "--reps-decode", "27"], 600),
    ("qec_d11", ["--qec", "--d", "11", "--rounds", "11",
                 "--shots", str(1 << 18), "--decode-shots", str(1 << 17),
                 "--reps-decode", "16"], 900),
    ("bb_ldpc", ["--bb", "--shots", str(1 << 16)], 420),
]

# --full: the round-3 deep-statistics budgets (run manually / by studies)
_SUITE_FULL = [
    ("gate_dim3", ["--one-gate"], 1500),
    ("gate_dim4", ["--one-gate", "--dim4"], 1800),
    ("qec_d7", ["--qec", "--d", "7", "--rounds", "7",
                "--reps-decode", "8"], 1500),
    ("qec_d9", ["--qec", "--d", "9", "--rounds", "9",
                "--shots", str(1 << 19), "--decode-shots", str(1 << 19),
                "--reps-decode", "6"], 2400),
    ("qec_d11", ["--qec", "--d", "11", "--rounds", "11",
                 "--shots", str(1 << 19), "--decode-shots", str(1 << 19)],
     3000),
    ("bb_ldpc", ["--bb", "--shots", str(1 << 17)], 2400),
]


def main_all(full: bool = False) -> None:
    import os
    import subprocess
    import sys as _sys
    records = {}
    here = os.path.abspath(__file__)
    canon = os.path.join(os.path.dirname(here), "BENCH_CANON.json")
    commit = _git_commit()
    suite = _SUITE_FULL if full else _SUITE

    def update_canon():
        """Merge finished records into BENCH_CANON.json INCREMENTALLY
        (VERDICT r3 #1): a driver timeout mid-suite loses only the
        unfinished tail, never the records already measured. Existing
        canon records for workloads not in this run are preserved."""
        try:
            with open(canon) as f:
                prev = json.load(f)
        except Exception:
            prev = {}
        merged = dict(prev.get("records", {}))
        for n, r in records.items():
            if "value" in r:
                merged[n] = r
        head = merged.get("gate_dim3", {})
        out = dict(head) if "value" in head else {
            "metric": "cz_lindblad_sims_per_sec", "value": None,
            "unit": "sims/s", "vs_baseline": None}
        out["records"] = merged
        tmp = canon + ".tmp"
        with open(tmp, "w") as f:
            json.dump(out, f, indent=1)
        os.replace(tmp, canon)
        return out

    for name, args, tmo in suite:
        try:
            r = subprocess.run([_sys.executable, here] + args,
                               capture_output=True, text=True, timeout=tmo)
            line = [ln for ln in r.stdout.strip().splitlines()
                    if ln.startswith("{")]
            if line:
                records[name] = json.loads(line[-1])
                records[name]["generated_at_commit"] = commit
            else:
                records[name] = {"error": (r.stderr or "no output")[-500:]}
        except subprocess.TimeoutExpired:
            records[name] = {"error": f"timeout after {tmo}s"}
        except Exception as e:  # keep the suite alive
            records[name] = {"error": f"{type(e).__name__}: {e}"}
        # stream the record the moment it lands (VERDICT r3 #1): stdout
        # gets a full parseable JSON line per record — a driver-side
        # timeout still leaves every finished record in the capture —
        # and canon is updated incrementally on disk.
        rec = dict(records[name])
        rec["record"] = name
        print(json.dumps(rec), flush=True)
        print(f"# {name}: "
              + (f"{records[name].get('value')} "
                 f"{records[name].get('unit', '')}"
                 if "value" in records[name]
                 else records[name]["error"][:120]),
              file=_sys.stderr, flush=True)
        update_canon()

    out = update_canon()
    out["records"].update({n: r for n, r in records.items()
                           if "value" not in r})
    print(compact_summary_line(out), flush=True)


def compact_summary_line(out: dict) -> str:
    """The FINAL stdout line of the suite: a COMPACT summary.

    The driver keeps only a 2,000-char tail of stdout; the full combined
    record outgrew it in round 4 (rc=0 but parsed=null). Full per-record
    JSON is already streamed line-by-line as each workload lands and
    persisted in BENCH_CANON.json — the last line carries just the
    headline value plus a per-workload digest and stays under 1,500
    chars by construction (hard backstop drops the digest entirely).
    """
    digest = {}
    for n, r in out.get("records", {}).items():
        if "value" not in r:
            digest[n] = {"error": str(r.get("error", ""))[:60]}
            continue
        d = {"value": r["value"], "unit": r.get("unit")}
        for k_src, k_dst in (("e2e_sample_decode_shots_per_sec", "e2e"),
                             ("e2e_p_logical_shot", "p_L"),
                             ("e2e_n_errors", "n_err")):
            if k_src in r:
                d[k_dst] = r[k_src]
        digest[n] = d
    head = {"metric": out.get("metric"), "value": out.get("value"),
            "unit": out.get("unit"), "vs_baseline": out.get("vs_baseline")}
    line = json.dumps({**head, "summary": digest})
    if len(line) > 1500:  # hard backstop: never outgrow the tail again
        line = json.dumps(head)
    return line


if __name__ == "__main__":
    import sys
    if "--qec" in sys.argv:
        main_qec(d=_flag(sys.argv, "--d", 7),
                 rounds=_flag(sys.argv, "--rounds", 7),
                 shots=_flag(sys.argv, "--shots", 1 << 20),
                 decode_shots=_flag(sys.argv, "--decode-shots", 1 << 17),
                 reps_decode=_flag(sys.argv, "--reps-decode", 3),
                 seed=_flag(sys.argv, "--seed", 0))
    elif "--bb" in sys.argv:
        main_bb(rounds=_flag(sys.argv, "--rounds", 3),
                shots=_flag(sys.argv, "--shots", 8192),
                seed=_flag(sys.argv, "--seed", 0),
                reps=_flag(sys.argv, "--reps", 3))
    elif "--one-gate" in sys.argv or "--dim4" in sys.argv \
            or "--batch" in sys.argv or "--steps" in sys.argv \
            or "--curve" in sys.argv or "--prec" in sys.argv:
        dim4 = "--dim4" in sys.argv
        # defaults sized at the measured v5e throughput peak of the real
        # Hermitian-basis engine (the 300-step scan is per-step
        # latency-bound below ~32k sims in flight; 64k regresses on HBM)
        main(batch=_flag(sys.argv, "--batch", 8192 if dim4 else 32768),
             n_steps=_flag(sys.argv, "--steps", 300),
             curve="--curve" in sys.argv,
             dim=4 if dim4 else 3,
             prec=_flag(sys.argv, "--prec", "highest", str),
             engine=_flag(sys.argv, "--engine", "real", str),
             pallas_scan="--pallas-scan" in sys.argv)
    else:
        # no flags: the time-budgeted canonical suite (fits the driver's
        # capture window); --full runs the deep-statistics budgets
        main_all(full="--full" in sys.argv)
