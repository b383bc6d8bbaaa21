"""Solver-level tests: expm kernel, Liouvillian structure, zvode parity.

The 1e-8 mesolve-parity north star (BASELINE.md) is enforced here against an
independent zvode oracle at the reference tolerances (atol 1e-10, rtol 1e-8).
"""
import numpy as np
import pytest
import jax.numpy as jnp
from scipy.linalg import expm as scipy_expm

from noisyquantumsimulator_tpu.core.constants import TWO_PI
from noisyquantumsimulator_tpu.ops.expm import chained_product, expm
from noisyquantumsimulator_tpu.ops.hilbert import HS3, two_atom_kets, kets_to_density
from noisyquantumsimulator_tpu.ops.hamiltonians import (
    build_full_hamiltonian, drive_operator)
from noisyquantumsimulator_tpu.ops.lindblad import (
    build_all_noise_operators, dissipator_superop, drive_decomposition,
    hamiltonian_superop, liouvillian, static_hamiltonian)
from noisyquantumsimulator_tpu.solver.propagator import (
    Schedule, evolve_rhos, lp_square_schedule, total_propagator)
from noisyquantumsimulator_tpu.solver.reference import (
    liouvillian_np, mesolve_zvode, sesolve_zvode)
from noisyquantumsimulator_tpu.gate.fidelity import mixed_state_fidelity


class TestExpm:
    def test_vs_scipy_batched(self, rng):
        A = rng.normal(size=(6, 12, 12)) + 1j * rng.normal(size=(6, 12, 12))
        A *= np.array([0.01, 0.5, 2, 5, 10, 20])[:, None, None]
        ours = np.asarray(expm(jnp.asarray(A)))
        ref = np.stack([scipy_expm(a) for a in A])
        err = np.abs(ours - ref) / np.maximum(np.abs(ref), 1.0)
        assert err.max() < 1e-11

    def test_identity(self):
        Z = jnp.zeros((4, 4), dtype=jnp.complex128)
        assert np.allclose(np.asarray(expm(Z)), np.eye(4))

    def test_taylor16_matches_pade(self, rng):
        """The matmul-only TPU kernel must agree with Pade-13 at both
        precisions (complex64 within f32 roundoff)."""
        A = rng.normal(size=(4, 9, 9)) + 1j * rng.normal(size=(4, 9, 9))
        A *= np.array([0.2, 2, 8, 40])[:, None, None]
        ref = np.stack([scipy_expm(a) for a in A])
        t64 = np.asarray(expm(jnp.asarray(A), method="taylor16"))
        assert np.abs(t64 - ref).max() / np.abs(ref).max() < 1e-11
        # complex64 check on skew-Hermitian operands (bounded exponentials —
        # generic norm-40 matrices overflow f32 regardless of the kernel)
        H = rng.normal(size=(4, 9, 9)) + 1j * rng.normal(size=(4, 9, 9))
        S = 1j * (H + H.conj().swapaxes(-1, -2))
        S *= np.array([0.2, 2, 8, 40])[:, None, None] / np.abs(
            S).sum(axis=-2).max(axis=-1)[:, None, None]
        ref32 = np.stack([scipy_expm(s) for s in S])
        t32 = np.asarray(expm(jnp.asarray(S.astype(np.complex64)),
                              method="taylor16"))
        assert np.abs(t32 - ref32).max() < 5e-5

    def test_taylor16_grad_matches_pade_grad(self, rng):
        import jax
        A = jnp.asarray(rng.normal(size=(5, 5))
                        + 1j * rng.normal(size=(5, 5)))

        def tr(method):
            return lambda s: jnp.real(jnp.trace(expm(s * A, method=method)))

        g_t = jax.grad(tr("taylor16"))(0.7)
        g_p = jax.grad(tr("pade13"))(0.7)
        assert np.isclose(float(g_t), float(g_p), rtol=1e-9)

    def test_unknown_method_raises(self):
        with pytest.raises(ValueError, match="expm method"):
            expm(jnp.zeros((2, 2)), method="bogus")

    def test_chained_product_order(self, rng):
        U = rng.normal(size=(9, 3, 3)) + 1j * rng.normal(size=(9, 3, 3))
        got = np.asarray(chained_product(jnp.asarray(U)))
        want = np.eye(3, dtype=complex)
        for u in U:
            want = u @ want
        assert np.allclose(got, want, atol=1e-10)


class TestLiouvillianStructure:
    def _setup(self):
        Om = TWO_PI * 5e6
        H = build_full_hamiltonian(Om, 0.377 * Om, 100 * Om, HS3)
        c_ops, _ = build_all_noise_operators(
            hs=HS3, gamma_r=7e3, gamma_phi_laser=1e3,
            gamma_scatter_intermediate=500.0, gamma_loss_antitrap=2e3)
        return H, c_ops

    def test_hamiltonian_superop_is_antihermitian_action(self):
        H, _ = self._setup()
        L = hamiltonian_superop(H)
        # trace preservation: vec(I)^T L = 0
        D = H.shape[0]
        vecI = np.eye(D).reshape(-1)
        assert np.abs(vecI @ L).max() < 1e-6 * np.abs(L).max()

    def test_dissipator_trace_preserving(self):
        H, c_ops = self._setup()
        L = liouvillian(H, c_ops)
        D = H.shape[0]
        vecI = np.eye(D).reshape(-1)
        assert np.abs(vecI @ L).max() < 1e-6 * np.abs(L).max()

    def test_matches_reference_liouvillian(self):
        H, c_ops = self._setup()
        from noisyquantumsimulator_tpu.ops.lindblad import (
            dissipator_superop, hamiltonian_superop)
        ours = hamiltonian_superop(H) + dissipator_superop(c_ops, H.shape[0])
        ref = liouvillian_np(H, c_ops)
        assert np.allclose(ours, ref)

    def test_drive_decomposition_reconstructs_hamiltonian(self):
        Om = TWO_PI * 5e6
        H0 = static_hamiltonian(HS3, 0.377 * Om, 100 * Om)
        L0, Cp, Cm = drive_decomposition(HS3, Om, H0, [])
        phi = 0.7
        Lfull = L0 + np.exp(1j * phi) * Cp + np.exp(-1j * phi) * Cm
        S = drive_operator(HS3)
        Hfull = H0 + 0.5 * Om * (np.exp(1j * phi) * S
                                 + np.exp(-1j * phi) * S.conj().T)
        assert np.allclose(Lfull, liouvillian_np(Hfull, []))


class TestPropagatorParity:
    """The north-star check: expm propagator vs zvode at reference tolerances."""

    def _lp_setup(self, noisy):
        Om = TWO_PI * 5e6
        Delta = 0.377371 * Om
        V = 200 * Om
        tau = 4.29268 / Om
        H0 = static_hamiltonian(HS3, Delta, V)
        if noisy:
            c_ops, _ = build_all_noise_operators(
                hs=HS3, gamma_r=7.1e3, gamma_bbr=3.5e3, gamma_phi_laser=3e3,
                gamma_phi_thermal=2e3, gamma_scatter_intermediate=1.5e3,
                gamma_loss_antitrap=5e3, gamma_loss_background=1e3)
        else:
            c_ops = []
        L0, Cp, Cm = drive_decomposition(HS3, Om, H0, c_ops)
        from noisyquantumsimulator_tpu.physics.protocols import compute_phase_shift_xi
        xi = complex(np.asarray(compute_phase_shift_xi(Delta, Om, tau)))
        sched = lp_square_schedule(jnp.asarray(np.angle(xi)), jnp.asarray(tau))
        S = drive_operator(HS3)
        H1 = H0 + 0.5 * Om * (S + S.conj().T)
        H2 = H0 + 0.5 * Om * (xi * S + np.conj(xi) * S.conj().T)
        return L0, Cp, Cm, sched, c_ops, [H1, H2], [tau, tau]

    @pytest.mark.parametrize("noisy", [False, True])
    def test_lp_square_parity_1e8(self, noisy):
        L0, Cp, Cm, sched, c_ops, Hsegs, dts = self._lp_setup(noisy)
        kets = two_atom_kets(HS3)
        rho0s = jnp.asarray(np.stack([kets_to_density(kets[k])
                                      for k in ("00", "01", "10", "11")]))
        ours = np.asarray(evolve_rhos(jnp.asarray(L0), jnp.asarray(Cp),
                                      jnp.asarray(Cm), sched, rho0s))
        for i, k in enumerate(("01", "11")):
            # tight-tolerance oracle so its own error stays below 1e-8
            ref = mesolve_zvode(Hsegs, dts, kets_to_density(kets[k]), c_ops,
                                atol=1e-13, rtol=1e-12)
            F = float(mixed_state_fidelity(jnp.asarray(ours[["00", "01", "10", "11"].index(k)]),
                                           jnp.asarray(ref)))
            assert abs(1.0 - F) < 1e-8, f"state {k}: 1-F = {1 - F:.2e}"

    def test_noiseless_matches_sesolve(self):
        L0, Cp, Cm, sched, c_ops, Hsegs, dts = self._lp_setup(False)
        kets = two_atom_kets(HS3)
        rho0 = jnp.asarray(kets_to_density(kets["11"])[None])
        rho_out = np.asarray(evolve_rhos(jnp.asarray(L0), jnp.asarray(Cp),
                                         jnp.asarray(Cm), sched, rho0))[0]
        psi = sesolve_zvode(Hsegs, dts, kets["11"], atol=1e-13, rtol=1e-12)
        F = float(np.real(psi.conj() @ rho_out @ psi))
        assert abs(1.0 - F) < 1e-8

    def test_trace_preservation(self):
        L0, Cp, Cm, sched, c_ops, _, _ = self._lp_setup(True)
        kets = two_atom_kets(HS3)
        rho0s = jnp.asarray(np.stack([kets_to_density(kets[k])
                                      for k in ("00", "01", "10", "11")]))
        out = np.asarray(evolve_rhos(jnp.asarray(L0), jnp.asarray(Cp),
                                     jnp.asarray(Cm), sched, rho0s))
        traces = np.trace(out, axis1=-2, axis2=-1)
        assert np.allclose(traces, 1.0, atol=1e-9)

    def test_propagator_unitality_noiseless(self):
        L0, Cp, Cm, sched, *_ = self._lp_setup(False)
        U = np.asarray(total_propagator(jnp.asarray(L0), jnp.asarray(Cp),
                                        jnp.asarray(Cm), sched))
        # noiseless superoperator propagator is unitary
        assert np.allclose(U @ U.conj().T, np.eye(U.shape[0]), atol=1e-8)


class TestCircuitSimulators:
    """The four simulation modes must agree: frame, fast (matmul),
    trajectories (state-vector MC), density matrix (exact CPTP)."""

    def _rep_circuit(self, p=0.05):
        from noisyquantumsimulator_tpu.qec.circuits import Circuit
        rep = Circuit(n_qubits=5)
        rep.append("X_ERROR", [0, 2, 4], arg=p)
        for a, (d1, d2) in ((1, (0, 2)), (3, (2, 4))):
            rep.append("CX", np.array([[d1, a]]))
            rep.append("CX", np.array([[d2, a]]))
        rep.append("MR", [1, 3])
        rep.detector([-2])
        rep.detector([-1])
        return rep

    def test_four_engine_agreement(self):
        import jax
        from noisyquantumsimulator_tpu.qec.fast_sampler import build_fast_sampler
        from noisyquantumsimulator_tpu.solver.circuit_sim import (
            DensityMatrixSimulator, TrajectorySimulator)
        p = 0.05
        rep = self._rep_circuit(p)
        exact = 2 * p * (1 - p)          # exactly one of the pair flipped
        dm = np.asarray(DensityMatrixSimulator(rep).run()
                        ["measurement_probs"])
        assert np.allclose(dm, exact, atol=1e-6)
        fast = build_fast_sampler(rep, 60000)(jax.random.PRNGKey(2))
        traj = TrajectorySimulator(rep, trajectories=60000).sample(
            jax.random.PRNGKey(3))
        tol = 6 * np.sqrt(exact / 60000)
        assert np.allclose(np.asarray(fast["detectors"]).mean(0), exact,
                           atol=tol)
        assert np.allclose(np.asarray(traj["measurements"]).mean(0), exact,
                           atol=tol)

    def test_bell_state_exact(self):
        from noisyquantumsimulator_tpu.qec.circuits import Circuit
        from noisyquantumsimulator_tpu.solver.circuit_sim import (
            DensityMatrixSimulator)
        c = Circuit(n_qubits=2)
        c.append("H", [0])
        c.append("CX", np.array([[0, 1]]))
        rho = np.asarray(DensityMatrixSimulator(c).run()["rho"])
        want = np.zeros((4, 4)); want[0, 0] = want[0, 3] = 0.5
        want[3, 0] = want[3, 3] = 0.5
        assert np.allclose(rho, want, atol=1e-6)

    def test_trajectory_bell_correlations(self):
        import jax
        from noisyquantumsimulator_tpu.qec.circuits import Circuit
        from noisyquantumsimulator_tpu.solver.circuit_sim import (
            TrajectorySimulator)
        c = Circuit(n_qubits=2)
        c.append("H", [0])
        c.append("CX", np.array([[0, 1]]))
        c.append("M", [0])
        c.append("M", [1])
        m = np.asarray(TrajectorySimulator(c, 20000).sample(
            jax.random.PRNGKey(0))["measurements"])
        assert (m[:, 0] == m[:, 1]).all()          # perfect ZZ correlation
        assert abs(m[:, 0].mean() - 0.5) < 0.02    # unbiased marginal

    def test_qubit_limits(self):
        from noisyquantumsimulator_tpu.qec.circuits import Circuit
        from noisyquantumsimulator_tpu.solver.circuit_sim import (
            DensityMatrixSimulator, TrajectorySimulator)
        with pytest.raises(ValueError):
            DensityMatrixSimulator(Circuit(n_qubits=13))
        with pytest.raises(ValueError):
            TrajectorySimulator(Circuit(n_qubits=15))


class TestPallasSquaring:
    def test_interpret_matches_reference(self, rng):
        import jax
        from noisyquantumsimulator_tpu.ops.expm_pallas import (
            fused_masked_squaring)
        B, D = 4, 16
        R = ((rng.normal(size=(B, D, D)) + 1j * rng.normal(size=(B, D, D)))
             * 0.1).astype(np.complex64)
        s = np.array([0, 1, 3, 2], np.int32)
        ref = R.copy()
        for b in range(B):
            for _ in range(s[b]):
                ref[b] = ref[b] @ ref[b]
        got = np.asarray(fused_masked_squaring(jnp.asarray(R),
                                               jnp.asarray(s), 4,
                                               interpret=True))
        assert np.abs(got - ref).max() < 1e-4


class TestPhaseFrameFastPath:
    """The one-expm phase-frame factorization (ops/phase_frame.py) must be
    exactly equivalent to per-segment exponentiation."""

    def test_generator_found_for_noisy_plans(self):
        from noisyquantumsimulator_tpu.core.configs import (
            SmoothJPSimulationInputs)
        from noisyquantumsimulator_tpu.gate.simulate import (plan_cz_gate,
                                                             plan_phase_frame)
        plan = plan_cz_gate(SmoothJPSimulationInputs(), n_steps_smooth=64)
        assert plan_phase_frame(plan) is not None

    def test_matches_per_segment_expm(self):
        import jax
        from noisyquantumsimulator_tpu.core.configs import (
            SmoothJPSimulationInputs)
        from noisyquantumsimulator_tpu.gate.simulate import (
            plan_cz_gate, plan_phase_frame, plan_squaring_bound)
        from noisyquantumsimulator_tpu.solver.propagator import (
            Schedule, evolve_rhos, evolve_rhos_phased,
            uniform_base_propagator)
        with jax.enable_x64(True):
            plan = plan_cz_gate(SmoothJPSimulationInputs(),
                                n_steps_smooth=128)
            g = plan_phase_frame(plan)
            ms = plan_squaring_bound(plan)
            L0 = jnp.asarray(plan.L0)
            Cp = jnp.asarray(plan.Cp)
            Cm = jnp.asarray(plan.Cm)
            rho0s = jnp.asarray(plan.rho0s)
            sched = plan.schedule
            amps = np.asarray(sched.amps)
            dts = np.asarray(sched.dts)
            phases = jnp.asarray(np.asarray(sched.phases))
            ref = evolve_rhos(L0, Cp, Cm,
                              Schedule(jnp.asarray(amps), phases,
                                       jnp.asarray(dts)),
                              rho0s, max_squarings=ms)
            Ub = uniform_base_propagator(L0, Cp, Cm, float(amps[0]),
                                         float(dts[0]), max_squarings=ms)
            fast = evolve_rhos_phased(Ub, jnp.asarray(g), phases, rho0s)
            assert float(jnp.max(jnp.abs(ref - fast))) < 1e-11

    def test_many_matches_single(self):
        """evolve_rhos_phased_many (batched schedules, one shared U_base)
        must agree with per-schedule evolve_rhos_phased exactly."""
        import jax
        from noisyquantumsimulator_tpu.core.configs import (
            SmoothJPSimulationInputs)
        from noisyquantumsimulator_tpu.gate.simulate import (
            plan_cz_gate, plan_phase_frame, plan_squaring_bound)
        from noisyquantumsimulator_tpu.solver.propagator import (
            evolve_rhos_phased, evolve_rhos_phased_many,
            uniform_base_propagator)
        with jax.enable_x64(True):
            plan = plan_cz_gate(SmoothJPSimulationInputs(),
                                n_steps_smooth=48)
            g = jnp.asarray(plan_phase_frame(plan))
            ms = plan_squaring_bound(plan)
            sched = plan.schedule
            amps = np.asarray(sched.amps)
            dts = np.asarray(sched.dts)
            phases = jnp.asarray(np.asarray(sched.phases))
            Ub = uniform_base_propagator(
                jnp.asarray(plan.L0), jnp.asarray(plan.Cp),
                jnp.asarray(plan.Cm), float(amps[0]), float(dts[0]),
                max_squarings=ms)
            rho0s = jnp.asarray(plan.rho0s)
            scales = jnp.asarray([0.9, 1.0, 1.1])
            many = evolve_rhos_phased_many(
                Ub, g, scales[:, None] * phases[None], rho0s)
            for i, s in enumerate(scales):
                one = evolve_rhos_phased(Ub, g, s * phases, rho0s)
                assert float(jnp.max(jnp.abs(many[i] - one))) < 1e-12

    def test_planes_f64_matches_complex(self):
        """The float-plane path (the on-device f64 tier: TPU has no C128
        but emulates F64) must reproduce the complex x64 path to ~1e-12
        and therefore inherit its <1e-8 zvode parity."""
        import jax
        from noisyquantumsimulator_tpu.core.configs import (
            SmoothJPSimulationInputs)
        from noisyquantumsimulator_tpu.gate.simulate import (
            plan_cz_gate, plan_phase_frame, plan_squaring_bound)
        from noisyquantumsimulator_tpu.ops.expm import expm_planes
        from noisyquantumsimulator_tpu.solver.propagator import (
            evolve_rhos_phased, evolve_rhos_phased_planes,
            uniform_base_propagator)
        with jax.enable_x64(True):
            plan = plan_cz_gate(SmoothJPSimulationInputs(),
                                n_steps_smooth=96)
            g = plan_phase_frame(plan)
            ms = plan_squaring_bound(plan)
            amps = np.asarray(plan.schedule.amps)
            dts = np.asarray(plan.schedule.dts)
            phases = np.asarray(plan.schedule.phases)
            A = (plan.L0 + float(amps[0]) * (plan.Cp + plan.Cm)) \
                * float(dts[0])
            Ubr, Ubi = expm_planes(jnp.asarray(A.real), jnp.asarray(A.imag),
                                   max_squarings=ms + 1)
            Ub_ref = uniform_base_propagator(
                jnp.asarray(plan.L0), jnp.asarray(plan.Cp),
                jnp.asarray(plan.Cm), float(amps[0]), float(dts[0]),
                max_squarings=ms)
            assert float(jnp.max(jnp.abs(
                (Ubr + 1j * Ubi) - Ub_ref))) < 1e-12
            outr, outi = evolve_rhos_phased_planes(
                Ubr, Ubi, jnp.asarray(g), jnp.asarray(phases),
                jnp.asarray(plan.rho0s.real), jnp.asarray(plan.rho0s.imag))
            ref = evolve_rhos_phased(Ub_ref, jnp.asarray(g),
                                     jnp.asarray(phases),
                                     jnp.asarray(plan.rho0s))
            assert float(jnp.max(jnp.abs((outr + 1j * outi) - ref))) < 1e-12

    def test_dim4_generator(self):
        from noisyquantumsimulator_tpu.core.configs import (
            SmoothJPSimulationInputs)
        from noisyquantumsimulator_tpu.gate.simulate import (plan_cz_gate,
                                                             plan_phase_frame)
        plan = plan_cz_gate(SmoothJPSimulationInputs(),
                            hilbert_space_dim=4, n_steps_smooth=32)
        assert plan_phase_frame(plan) is not None

    def test_shaped_pulse_falls_back(self):
        from noisyquantumsimulator_tpu.core.configs import LPSimulationInputs
        from noisyquantumsimulator_tpu.gate.simulate import (plan_cz_gate,
                                                             plan_phase_frame)
        plan = plan_cz_gate(LPSimulationInputs(pulse_shape="gaussian"),
                            n_steps_shaped=32)
        assert plan_phase_frame(plan) is None  # non-uniform amplitudes


class TestRealRepEngine:
    """The real Hermitian-basis engine (solver/real_rep.py) must be an
    exact change of representation: same physics as the complex
    phase-frame path, one real matmul per segment."""

    def _plan(self, dim=3, n=64):
        from noisyquantumsimulator_tpu.core.configs import (
            SmoothJPSimulationInputs)
        from noisyquantumsimulator_tpu.gate.simulate import (
            plan_cz_gate, plan_phase_frame, plan_squaring_bound)
        plan = plan_cz_gate(SmoothJPSimulationInputs(), n_steps_smooth=n,
                            hilbert_space_dim=dim)
        return plan, plan_phase_frame(plan), plan_squaring_bound(plan)

    def test_roundtrip_exact(self):
        import jax
        from noisyquantumsimulator_tpu.solver.real_rep import (
            build_real_rep, from_real_coords, to_real_coords)
        with jax.enable_x64(True):
            plan, g, _ = self._plan()
            rep = build_real_rep(g, 9)
            Wr, Wi = jnp.asarray(rep.Wr), jnp.asarray(rep.Wi)
            x = to_real_coords(jnp.asarray(plan.rho0s), Wr, Wi)
            back = from_real_coords(x, Wr, Wi)
            assert float(jnp.max(jnp.abs(back - plan.rho0s))) < 1e-14

    @pytest.mark.parametrize("dim", [3, 4])
    def test_matches_complex_many(self, dim):
        import jax
        from noisyquantumsimulator_tpu.solver.propagator import (
            evolve_rhos_phased_many, uniform_base_propagator)
        from noisyquantumsimulator_tpu.solver.real_rep import (
            build_real_rep, evolve_real_phased_many, from_real_coords,
            real_propagator_host, to_real_coords)
        with jax.enable_x64(True):
            plan, g, ms = self._plan(dim=dim, n=48)
            D = dim * dim
            amps = np.asarray(plan.schedule.amps)
            dts = np.asarray(plan.schedule.dts)
            phases = jnp.asarray(np.asarray(plan.schedule.phases))
            Ub = uniform_base_propagator(
                jnp.asarray(plan.L0), jnp.asarray(plan.Cp),
                jnp.asarray(plan.Cm), float(amps[0]), float(dts[0]),
                max_squarings=ms)
            rep = build_real_rep(g, D)
            # host transform asserts Im(W U W^dagger) ~ 0:
            # Lindblad propagators are Hermiticity-preserving
            U_real = jnp.asarray(real_propagator_host(np.asarray(Ub), rep))
            Wr, Wi = jnp.asarray(rep.Wr), jnp.asarray(rep.Wi)
            scales = jnp.asarray([0.93, 1.0, 1.07])
            ref = evolve_rhos_phased_many(
                Ub, jnp.asarray(g), scales[:, None] * phases[None],
                jnp.asarray(plan.rho0s))
            x0 = to_real_coords(jnp.asarray(plan.rho0s), Wr, Wi)
            out = evolve_real_phased_many(
                U_real, jnp.asarray(rep.cq),
                scales[:, None] * phases[None], x0, D, rep.P)
            rhos = from_real_coords(out, Wr, Wi)
            assert float(jnp.max(jnp.abs(rhos - ref))) < 1e-11

    def test_device_propagator_matches_host(self):
        import jax
        from noisyquantumsimulator_tpu.solver.propagator import (
            uniform_base_propagator)
        from noisyquantumsimulator_tpu.solver.real_rep import (
            build_real_rep, real_propagator_device, real_propagator_host)
        with jax.enable_x64(True):
            plan, g, ms = self._plan(n=32)
            amps = np.asarray(plan.schedule.amps)
            dts = np.asarray(plan.schedule.dts)
            Ub = uniform_base_propagator(
                jnp.asarray(plan.L0), jnp.asarray(plan.Cp),
                jnp.asarray(plan.Cm), float(amps[0]), float(dts[0]),
                max_squarings=ms)
            rep = build_real_rep(g, 9)
            dev = real_propagator_device(Ub, jnp.asarray(rep.Wr),
                                         jnp.asarray(rep.Wi))
            host = real_propagator_host(np.asarray(Ub), rep)
            assert float(jnp.max(jnp.abs(dev - host))) < 1e-12

    def test_single_matches_many(self):
        import jax
        from noisyquantumsimulator_tpu.solver.propagator import (
            uniform_base_propagator)
        from noisyquantumsimulator_tpu.solver.real_rep import (
            build_real_rep, evolve_real_phased, evolve_real_phased_many,
            real_propagator_host, to_real_coords)
        with jax.enable_x64(True):
            plan, g, ms = self._plan(n=32)
            amps = np.asarray(plan.schedule.amps)
            dts = np.asarray(plan.schedule.dts)
            phases = jnp.asarray(np.asarray(plan.schedule.phases))
            Ub = uniform_base_propagator(
                jnp.asarray(plan.L0), jnp.asarray(plan.Cp),
                jnp.asarray(plan.Cm), float(amps[0]), float(dts[0]),
                max_squarings=ms)
            rep = build_real_rep(g, 9)
            U_real = jnp.asarray(real_propagator_host(np.asarray(Ub), rep))
            Wr, Wi = jnp.asarray(rep.Wr), jnp.asarray(rep.Wi)
            x0 = to_real_coords(jnp.asarray(plan.rho0s), Wr, Wi)
            many = evolve_real_phased_many(
                U_real, jnp.asarray(rep.cq),
                jnp.stack([phases, 1.05 * phases]), x0, 9, rep.P)
            for i, s in enumerate([1.0, 1.05]):
                one = evolve_real_phased(U_real, jnp.asarray(rep.cq),
                                         s * phases, x0, 9, rep.P)
                assert float(jnp.max(jnp.abs(many[i] - one))) < 1e-13


class TestScanPallas:
    """VMEM-resident Pallas scan kernel (solver/scan_pallas.py) vs the
    XLA scan (VERDICT r4 #7: the gate engine's Pallas path). Interpret
    mode on CPU; the on-chip compile is covered by the runtime probe +
    examples/profile_gate_scan.py."""

    def _shapes(self, D, P, B, S, n_seg, seed=3):
        rng = np.random.default_rng(seed)
        n = D + 2 * P
        A = rng.standard_normal((n, n))
        Q, _ = np.linalg.qr(A)               # orthogonal: 300-step stable
        U = jnp.asarray(Q.astype(np.float32))
        cq = jnp.asarray(rng.integers(1, 5, P).astype(np.float32))
        ph = jnp.asarray(rng.standard_normal((B, n_seg)).astype(np.float32))
        x0 = jnp.asarray(rng.standard_normal((S, n)).astype(np.float32))
        return U, cq, ph, x0

    @pytest.mark.parametrize("D,P,B,S,n_seg,blk", [
        (9, 36, 16, 4, 12, 16),      # production layout, short scan
        (2, 3, 8, 1, 5, 8),          # probe shape
        (9, 36, 8, 4, 60, 16),       # deeper scan, two grid blocks
    ])
    def test_parity_vs_xla_scan(self, D, P, B, S, n_seg, blk):
        from noisyquantumsimulator_tpu.solver.real_rep import (
            evolve_real_phased_many)
        from noisyquantumsimulator_tpu.solver.scan_pallas import (
            evolve_real_phased_many_pallas)
        U, cq, ph, x0 = self._shapes(D, P, B, S, n_seg)
        ref = evolve_real_phased_many(U, cq, ph, x0, D, P)
        out = evolve_real_phased_many_pallas(U, cq, ph, x0, D, P,
                                             block_rows=blk,
                                             interpret=True)
        err = float(jnp.max(jnp.abs(ref - out)))
        assert err < 5e-4, err

    def test_rotation_roll_formulation_exact(self):
        """The roll+mask rotation must match _rotate exactly (same ops,
        different data movement): zero tolerance on one applied step."""
        from noisyquantumsimulator_tpu.solver.real_rep import (
            evolve_real_phased_many)
        from noisyquantumsimulator_tpu.solver.scan_pallas import (
            evolve_real_phased_many_pallas)
        U, cq, ph, x0 = self._shapes(9, 36, 4, 2, 1, seed=11)
        ref = evolve_real_phased_many(U, cq, ph, x0, 9, 36)
        out = evolve_real_phased_many_pallas(U, cq, ph, x0, 9, 36,
                                             block_rows=8, interpret=True)
        assert float(jnp.max(jnp.abs(ref - out))) == 0.0
