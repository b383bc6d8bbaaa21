"""Tests for the Layer-1 primitive API (Move/Gates/Measure/Cool/Idle).

Fills the reference's empty tests/test_primitives/ tier.
"""
import numpy as np
import pytest

from noisyquantumsimulator_tpu.channels.conversions import (
    average_gate_fidelity, is_cptp, unitary_superop)
from noisyquantumsimulator_tpu.primitives.backend import NeutralAtomBackend
from noisyquantumsimulator_tpu.primitives.gates import (SingleQubitGate,
                                                        TwoQubitGate,
                                                        rotation_matrix)
from noisyquantumsimulator_tpu.primitives.motion import (Cool, Idle, Measure,
                                                         Move)


@pytest.fixture(scope="module")
def backend():
    return NeutralAtomBackend()


class TestSingleQubitGate:
    def test_rotation_matrices_unitary(self):
        for ax in "xyz":
            U = rotation_matrix(ax, 1.234)
            assert np.allclose(U @ U.conj().T, np.eye(2))

    def test_pi_pulse_duration(self):
        g = SingleQubitGate(omega_raman=2 * np.pi * 1e6)
        r = g(0, "x")
        assert r.duration == pytest.approx(np.pi / (2 * np.pi * 1e6))
        assert 0.99 < r.fidelity <= 1.0

    def test_virtual_z_free(self):
        g = SingleQubitGate()
        r = g(0, "rz", angle=0.7)
        assert r.duration == 0.0
        assert r.fidelity == 1.0
        assert r.metadata["virtual"]

    def test_error_map_cptp(self):
        r = SingleQubitGate()(0, "x")
        cp, tp = is_cptp(r.error_map)
        assert cp and tp

    def test_unknown_gate_raises(self):
        with pytest.raises(ValueError):
            SingleQubitGate()(0, "hadamardish")


class TestTwoQubitGate:
    def test_cz_from_calibration(self, backend):
        r = backend.cz()
        assert 0.9 < r.fidelity < 1.0
        assert r.duration > 0
        assert r.error_map.shape == (16, 16)
        assert r.leakage >= 0

    def test_cnot_derived(self, backend):
        r = backend.two_qubit(0, 1, "cnot")
        assert r.duration > backend.cz().duration
        assert r.metadata["derived_from"] == "cz"

    def test_unknown_raises(self, backend):
        with pytest.raises(ValueError):
            backend.two_qubit(0, 1, "iswap")


class TestMove:
    def test_zero_move(self):
        r = Move()(0, 0.0, 0.0)
        assert r.heating_quanta == 0.0
        assert r.loss_probability == 0.0

    def test_longer_move_slower(self):
        m = Move()
        r1 = m(0, 0.0, 2e-6)
        r2 = m(0, 0.0, 20e-6)
        assert r2.duration > r1.duration

    def test_faster_move_heats_more(self):
        m = Move()
        slow = m(0, 0.0, 5e-6, duration=100e-6)
        fast = m(0, 0.0, 5e-6, duration=10e-6)
        assert fast.heating_quanta > slow.heating_quanta

    def test_trajectory_endpoints(self):
        r = Move()(0, 0.0, 5e-6)
        assert r.trajectory[0, 1] == pytest.approx(0.0)
        assert r.trajectory[-1, 1] == pytest.approx(5e-6, rel=1e-6)


class TestCool:
    def test_method_hierarchy(self):
        c = Cool()
        t_dop = c(0, method="doppler").final_temperature
        t_mol = c(0, method="molasses").final_temperature
        t_sb = c(0, method="sideband").final_temperature
        assert t_sb < t_mol < t_dop

    def test_doppler_limit_value(self):
        # T_D = hbar Gamma / 2 kB ~ 146 uK for Rb D2
        t = Cool()(0, method="doppler").final_temperature
        assert t == pytest.approx(146e-6, rel=0.05)

    def test_sideband_near_ground(self):
        r = Cool()(0, method="sideband")
        assert r.final_nbar < 0.1

    def test_unknown_method(self):
        with pytest.raises(ValueError):
            Cool()(0, method="laser_hopes")


class TestIdle:
    def test_error_grows_with_time(self):
        i = Idle(T1=1.0, T2=0.5)
        r1 = i(0, 1e-6)
        r2 = i(0, 1e-3)
        assert r2.pauli_error_probs[3] > r1.pauli_error_probs[3]
        assert r2.loss_probability > r1.loss_probability

    def test_cptp(self):
        r = Idle()(0, 1e-3)
        cp, tp = is_cptp(r.error_map)
        assert cp and tp


class TestMeasure:
    def test_confusion_matrix_rows_normalized(self):
        cm = Measure().confusion_matrix
        assert np.allclose(cm.sum(axis=1), 1.0)

    def test_sampling_statistics(self):
        m = Measure(fidelity_0=0.99, fidelity_1=0.95)
        rng = np.random.default_rng(0)
        outs = [m(0, state_probabilities=np.array([0.0, 1.0]), rng=rng).outcome
                for _ in range(2000)]
        assert np.mean(outs) == pytest.approx(0.95, abs=0.02)


class TestBackend:
    def test_summary_keys(self, backend):
        s = backend.summary()
        for k in ("cz_fidelity", "cz_duration_us", "measure_fidelity"):
            assert k in s
        assert 0.9 < s["cz_fidelity"] < 1.0


class TestIonBackend:
    """Layer-1 trapped-ion primitives consuming the round-4 MS-gate
    Lindblad calibration (reference: docs/ARCHITECTURE.md:171-178 maps
    TwoQubitGate -> MS for ions; micro_physics/trapped_ions/qccd specs)."""

    @pytest.fixture(scope="class")
    def ion(self):
        from noisyquantumsimulator_tpu.primitives.ion_backend import IonBackend
        return IonBackend()

    def test_cz_decomposition_exact(self):
        """CZ = e^{i pi/4} (SdgH (x) SdgH) U_MS (H (x) H) up to phase."""
        from noisyquantumsimulator_tpu.primitives.ion_backend import (
            _L1, _L2, CZ_MATRIX)
        from noisyquantumsimulator_tpu.gate.ms_gate import _ideal_ms_unitary
        U = _L2 @ _ideal_ms_unitary() @ _L1
        ph = U[0, 0]
        assert abs(abs(ph) - 1.0) < 1e-12
        assert np.allclose(U, ph * CZ_MATRIX, atol=1e-12)

    def test_loads_disk_calibration(self, ion):
        assert ion.ms_calibration.platform == "trapped_ions"
        assert ion.ms_calibration.operation == "ms_gate"
        assert ion.ms_calibration.metadata.get("generator") == \
            "noisyquantumsimulator_tpu.gate.ms_gate"

    def test_ms_gate_result(self, ion):
        ms = ion.ms()
        assert 0.99 < ms.fidelity < 1.0
        assert ms.pauli_error_probs.shape == (16,)
        assert np.isclose(ms.pauli_error_probs.sum(), 1.0, atol=1e-6)
        cp, tp = is_cptp(ms.error_map)
        assert cp and tp

    def test_derived_cz_channel(self, ion):
        """Conjugating the calibrated MS channel by the exact Clifford
        locals must cost only the wrapper pulses: F_cz within the
        4-wrapper-pulse budget of F_ms, and the dominant errors rotate
        from the MS frame (XI/IX laser dephasing) into ZI/IZ."""
        ms, cz = ion.ms(), ion.cz()
        assert cz.fidelity <= ms.fidelity + 1e-12
        assert ms.fidelity - cz.fidelity < 1e-4     # cheap wrappers
        labels = ion.ms_calibration.pauli_labels
        pz = cz.pauli_error_probs[labels.index("ZI")]
        px = cz.pauli_error_probs[labels.index("XI")]
        assert pz > 10 * px
        cp, tp = is_cptp(cz.error_map)
        assert cp and tp

    def test_cx_derived(self, ion):
        cx = ion.two_qubit(0, 1, "cx")
        assert cx.duration > ion.cz().duration
        assert 0.99 < cx.fidelity < 1.0

    def test_shuttle_and_cool(self, ion):
        mv = ion.move(0, 0.0, 200e-6)
        assert mv.duration > 0 and mv.heating_quanta > 0
        jn = ion.move(0, 0.0, 200e-6, junction=True)
        assert jn.heating_quanta > mv.heating_quanta
        cl = ion.cool(0, initial_nbar=5.0)
        assert cl.final_nbar < 1e-3                 # sideband-resolved
        assert cl.duration > 0

    def test_measure_confusion_from_fluorescence(self, ion):
        m = ion.measure()
        assert m.fidelity > 0.999
        assert np.allclose(m.confusion_matrix.sum(axis=1), 1.0)

    def test_executor_duck_type(self, ion):
        """qec/executor.py prices circuits through backend.cz()/rx()/
        measure()/T1/T2 — the ion backend must satisfy that interface."""
        from noisyquantumsimulator_tpu.qec.compiler import (Gate,
                                                             compile_circuit)
        from noisyquantumsimulator_tpu.qec.executor import execute
        from noisyquantumsimulator_tpu.qec.topology import grid_topology
        gates = [Gate("h", (0,)), Gate("cx", (0, 1))]
        compiled = compile_circuit(gates, grid_topology(1, 2),
                                   platform="trapped_ions")
        assert any(op.name == "ms" for op in compiled.ops)
        res = execute(compiled, backend=ion, shots=2000, seed=3)
        assert 0.0 < res.p_any_error < 0.2


class TestRamanGate:
    """Engine-driven Raman 1Q gate (gate/raman_gate.py; reference stub
    spec: micro_physics/neutral_atoms/single_qubit_gates.py:1-25)."""

    @pytest.fixture(scope="class")
    def result(self):
        from noisyquantumsimulator_tpu.gate.raman_gate import (
            simulate_raman_gate)
        return simulate_raman_gate(theta=np.pi / 2)

    def test_high_fidelity_scattering_dominated(self, result):
        assert result.fidelity > 0.9999
        b = result.error_budget
        assert b["scattering"] > 5 * b["model_floor"]
        assert result.completely_positive

    def test_duration_is_rabi_calibrated(self, result):
        # tau ~ theta / Omega_R within the non-adiabatic correction
        par = result.parameters
        tau0 = par["theta"] / par["Omega_R"]
        assert abs(result.duration / tau0 - 1.0) < 0.05

    def test_scattering_error_scales_inverse_delta(self):
        from noisyquantumsimulator_tpu.gate.raman_gate import (
            simulate_raman_gate)
        from noisyquantumsimulator_tpu.core.constants import TWO_PI
        r1 = simulate_raman_gate(theta=np.pi / 2, Delta=TWO_PI * 100e9)
        r2 = simulate_raman_gate(theta=np.pi / 2, Delta=TWO_PI * 200e9)
        ratio = (1 - r1.fidelity) / (1 - r2.fidelity)
        assert 1.7 < ratio < 2.6          # p_sc ~ Gamma theta / Delta
        assert r2.duration == pytest.approx(2 * r1.duration, rel=1e-3)

    def test_dephasing_budget_isolated(self):
        from noisyquantumsimulator_tpu.gate.raman_gate import (
            simulate_raman_gate)
        r = simulate_raman_gate(theta=np.pi / 2, gamma_phi=1e3)
        b = r.error_budget
        assert b["dephasing"] > 0
        # gamma_phi * tau / 2-class magnitude
        expected = 1e3 * r.duration / 2
        assert 0.2 * expected < b["dephasing"] < 5 * expected

    def test_detuning_error_rotates_axis(self):
        from noisyquantumsimulator_tpu.gate.raman_gate import (
            simulate_raman_gate)
        from noisyquantumsimulator_tpu.core.constants import TWO_PI
        r = simulate_raman_gate(theta=np.pi / 2,
                                delta2_error=TWO_PI * 50e3)
        assert r.error_budget["detuning_error"] > 1e-4

    def test_record_roundtrip_and_consumption(self, result, tmp_path):
        from noisyquantumsimulator_tpu.gate.raman_gate import (
            raman_calibration_record)
        from noisyquantumsimulator_tpu.channels.calibration import (
            CalibrationStore)
        from noisyquantumsimulator_tpu.primitives.gates import (
            SingleQubitGate)
        rec = raman_calibration_record(result, "test_regime")
        store = CalibrationStore(root=str(tmp_path))
        store.save(rec)
        rec2 = store.load("neutral_atoms", "raman_1q", "test_regime")
        sq = SingleQubitGate(calibration=rec2)
        g = sq(0, "rx", angle=np.pi / 2)
        # the primitive must reproduce the record's infidelity at the
        # record's own angle
        assert 1.0 - g.fidelity == pytest.approx(
            rec2.error_rates["avg_gate_infidelity"], rel=0.05)
        assert g.duration == pytest.approx(rec2.duration, rel=0.05)
        # calibrated X/Y/Z composition, not uniform depolarizing
        assert g.pauli_error_probs.shape == (4,)


class TestCavityBackend:
    """Layer-1 cavity-QED primitives consuming the round-4 photon-
    exchange Lindblad calibration (reference: docs/ARCHITECTURE.md:171-178
    maps TwoQubitGate -> cavity-mediated; micro_physics/cavity_qed specs).
    Platform #3 next to NeutralAtomBackend and IonBackend."""

    @pytest.fixture(scope="class")
    def cav(self):
        from noisyquantumsimulator_tpu.primitives.cavity_backend import (
            CavityBackend)
        return CavityBackend()

    def test_cz_decomposition_exact(self):
        """(Z x Z) . SWAP . U_x(phi_ee=-pi) = CZ exactly — the relabel +
        virtual-ZZ derivation is algebraically closed when the exchange
        loop phase hits -pi."""
        from noisyquantumsimulator_tpu.gate.cavity_gate import (
            _ideal_exchange_unitary)
        from noisyquantumsimulator_tpu.primitives.cavity_backend import (
            _SWAP, _ZZ, CZ_MATRIX)
        U = _ZZ @ _SWAP @ _ideal_exchange_unitary(-np.pi)
        assert np.allclose(U, CZ_MATRIX, atol=1e-12)

    def test_loads_disk_calibration(self, cav):
        rec = cav.exchange_calibration
        assert rec.platform == "cavity_qed"
        assert rec.operation == "exchange_gate"
        assert rec.superop is not None

    def test_exchange_gate_result(self, cav):
        xc = cav.exchange()
        assert 0.95 < xc.fidelity < 1.0
        assert xc.pauli_error_probs.shape == (16,)
        assert np.isclose(xc.pauli_error_probs.sum(), 1.0, atol=1e-6)
        cp, tp = is_cptp(xc.error_map)
        assert cp and tp

    def test_derived_cz_channel(self, cav):
        """The derived CZ must cost only the irreducible residual
        CPHASE(delta) on top of the native exchange infidelity (relabel
        and ZZ are exact/free), and its channel must map |++> near
        CZ|++> (a state the SWAP-free part cannot fake)."""
        from noisyquantumsimulator_tpu.primitives.cavity_backend import (
            CZ_MATRIX)
        xc, cz = cav.exchange(), cav.cz()
        delta = cav.two_qubit.residual_cphase
        assert abs(delta) < 0.2                     # closure nearly -pi
        # residual coherent ZZ-rotation costs O(delta^2) extra
        assert cz.fidelity <= xc.fidelity + 1e-9
        assert xc.fidelity - cz.fidelity < max(delta ** 2, 1e-4)
        cp, tp = is_cptp(cz.error_map)
        assert cp and tp
        psi = np.ones(4, dtype=complex) / 2
        rho = np.outer(psi, psi.conj())
        out = (cz.error_map @ rho.reshape(-1)).reshape(4, 4)
        tgt = CZ_MATRIX @ rho @ CZ_MATRIX.conj().T
        assert float(np.real(np.trace(out @ tgt))) > 0.9

    def test_cx_derived(self, cav):
        cx = cav.two_qubit(0, 1, "cx")
        assert cx.duration > cav.cz().duration      # physical H wrappers
        assert 0.9 < cx.fidelity < 1.0
        assert np.isclose(np.sum(cx.pauli_error_probs), 1.0, atol=1e-6)

    def test_readout_tradeoff(self, cav):
        """Longer integration kills shot noise but pays T1: the error is
        non-monotonic in duration with an interior optimum."""
        from noisyquantumsimulator_tpu.primitives.cavity_backend import (
            cavity_readout_error)
        kw = dict(cooperativity=1e5, kappa_readout=2 * np.pi * 5e6,
                  eta=0.5, n_bar=5.0, T1=100e-6)
        p_short = cavity_readout_error(duration=1e-8, **kw)
        p_mid = cavity_readout_error(duration=1e-6, **kw)
        p_long = cavity_readout_error(duration=300e-6, **kw)
        assert p_mid < p_short and p_mid < p_long
        assert cav.measure().fidelity > 0.99

    def test_regimes_ranked_by_engine(self, cav):
        """The circuit-QED regime (C=5e6) must out-price the fiber-cavity
        regime (C=3e4) — the L0 engine's regime ranking must survive into
        the Layer-1 channel."""
        from noisyquantumsimulator_tpu.primitives.cavity_backend import (
            CavityBackend)
        fiber = CavityBackend(regime="rb_fiber_cavity")
        assert cav.cz().fidelity > fiber.cz().fidelity
        assert fiber.cz().duration > cav.cz().duration

    def test_executor_duck_type(self, cav):
        """qec/executor.py prices circuits through backend.cz()/rx()/
        measure()/T1/T2 — the cavity backend must satisfy the interface."""
        from noisyquantumsimulator_tpu.qec.compiler import (Gate,
                                                            compile_circuit)
        from noisyquantumsimulator_tpu.qec.executor import execute
        from noisyquantumsimulator_tpu.qec.topology import grid_topology
        gates = [Gate("h", (0,)), Gate("cx", (0, 1))]
        compiled = compile_circuit(gates, grid_topology(1, 2),
                                   platform="cavity_qed")
        assert any(op.name == "cz" for op in compiled.ops)
        res = execute(compiled, backend=cav, shots=2000, seed=3)
        assert 0.0 < res.p_any_error < 0.2


class TestFluorescenceReadout:
    """Engine-driven readout (gate/readout.py): the counting master
    equation solved exactly (reference spec:
    micro_physics/neutral_atoms/measurement.py:11-25)."""

    @pytest.fixture(scope="class")
    def result(self):
        from noisyquantumsimulator_tpu.gate.readout import (
            simulate_fluorescence_readout)
        return simulate_fluorescence_readout()

    def test_confusion_rows_normalized(self, result):
        assert np.allclose(result.confusion_matrix.sum(axis=1), 1.0,
                           atol=1e-9)
        assert result.fidelity > 0.99
        assert 0 < result.threshold < result.mean_counts_bright

    def test_poisson_limit_exact(self):
        """With every jump mechanism off, the engine must reproduce the
        analytic Poisson count distribution to numerical precision —
        the oracle check that the generator + expm are right."""
        from scipy.stats import poisson
        from noisyquantumsimulator_tpu.gate.readout import (
            simulate_fluorescence_readout)
        r = simulate_fluorescence_readout(
            duration=1e-3, eta=0.05, background_rate=0.0,
            delta_hf_excited=1e30, delta_hf_ground=1e30,
            recoil_energy_over_trap=0.0)
        lam = r.parameters["eta"] * r.parameters["R_sc"] * r.duration
        pn = r.count_distributions["bright"]
        ref = poisson.pmf(np.arange(len(pn)), lam)
        assert float(np.max(np.abs(pn - ref))) < 1e-8
        # dark state with no background and no repump: exactly 0 counts
        assert r.count_distributions["dark"][0] == pytest.approx(1.0,
                                                                 abs=1e-12)

    def test_late_depump_does_not_misread(self):
        """The engine's headline over closed-form models: the in-window
        depump PROBABILITY is ~6%, but only depumps that happen before
        the threshold count is reached misread — the false-negative
        rate must come out far below the depump probability."""
        from noisyquantumsimulator_tpu.gate.readout import (
            simulate_fluorescence_readout)
        r = simulate_fluorescence_readout()
        p_depump_window = r.error_budget["depump_bright_to_dark"]
        assert p_depump_window > 0.02          # the naive model's error
        assert r.false_negative < p_depump_window / 5.0

    def test_background_raises_false_positive(self):
        from noisyquantumsimulator_tpu.gate.readout import (
            simulate_fluorescence_readout)
        lo = simulate_fluorescence_readout(background_rate=10.0)
        hi = simulate_fluorescence_readout(background_rate=3000.0)
        assert hi.false_positive > lo.false_positive

    def test_loss_scales_with_scattering(self):
        from noisyquantumsimulator_tpu.gate.readout import (
            simulate_fluorescence_readout)
        shallow = simulate_fluorescence_readout(
            recoil_energy_over_trap=2.4e-5)
        deep = simulate_fluorescence_readout(
            recoil_energy_over_trap=2.4e-7)
        assert shallow.loss_probability_bright > \
            deep.loss_probability_bright * 10

    def test_record_roundtrip_and_backend_consumption(self, result,
                                                      tmp_path):
        from noisyquantumsimulator_tpu.gate.readout import (
            readout_calibration_record)
        from noisyquantumsimulator_tpu.channels.calibration import (
            CalibrationStore)
        rec = readout_calibration_record(result, "test_regime")
        store = CalibrationStore(root=str(tmp_path))
        store.save(rec)
        rec2 = store.load("neutral_atoms", "readout", "test_regime")
        cm = np.asarray(rec2.metadata["confusion_matrix"])
        assert np.allclose(cm, result.confusion_matrix, atol=1e-12)
        b = NeutralAtomBackend(readout_calibration=rec2)
        assert b.measure().fidelity == pytest.approx(
            0.5 * (cm[0, 0] + cm[1, 1]), abs=0.51 * abs(cm[0, 0]
                                                        - cm[1, 1]) + 1e-9)
        assert b.measure().duration == rec2.duration

    def test_shipped_calibration_loads(self):
        """The repo ships the generated record; the default backend must
        consume it rather than regenerate."""
        b = NeutralAtomBackend()
        assert b.readout_calibration.regime == "rb87_highna_2ms"
        assert b.readout_calibration.metadata["generator"] == \
            "noisyquantumsimulator_tpu.gate.readout"


class TestSidebandCooling:
    """Engine-driven cooling (gate/cooling.py): exact Fock-ladder master
    equation (reference spec: micro_physics/neutral_atoms/cooling.py)."""

    @pytest.fixture(scope="class")
    def result(self):
        from noisyquantumsimulator_tpu.gate.cooling import (
            simulate_sideband_cooling)
        return simulate_sideband_cooling()

    def test_mean_matches_exact_ode(self, result):
        """For the linear birth-death ladder the mean obeys
        dn/dt = -(A- - A+) n + (A+ + R) EXACTLY — an independent oracle
        for the generator + expm (matches to ~1e-12)."""
        p = result.parameters
        rate = p["a_minus"] - p["a_plus"]
        nss = (p["a_plus"] + p["r_trap_heating"]) / rate
        pred = nss + (p["nbar0"] - nss) * np.exp(-rate * result.duration)
        assert result.final_nbar == pytest.approx(pred, rel=1e-9)

    def test_ground_state_and_floor(self, result):
        assert result.ground_state_fraction > 0.98
        assert result.final_nbar >= result.nbar_ss - 1e-12
        assert result.error_budget["truncation_tail"] < 1e-10

    def test_time_tradeoff(self):
        """Shorter windows leave transient excess; the spec's
        'cooling time vs final temperature tradeoff'."""
        from noisyquantumsimulator_tpu.gate.cooling import (
            simulate_sideband_cooling)
        short = simulate_sideband_cooling(duration=0.1e-3)
        mid = simulate_sideband_cooling(duration=1e-3)
        full = simulate_sideband_cooling(duration=10e-3)
        assert short.final_nbar > mid.final_nbar > full.final_nbar
        assert full.final_nbar == pytest.approx(full.nbar_ss, rel=0.01)

    def test_sideband_resolution_degrades_floor(self):
        """nbar_ss scales as (gamma_eff / 4 omega)^2 — losing sideband
        resolution must raise the floor quadratically."""
        from noisyquantumsimulator_tpu.gate.cooling import (
            simulate_sideband_cooling)
        res = simulate_sideband_cooling(gamma_eff=2 * np.pi * 20e3,
                                        r_trap_heating=0.0,
                                        duration=50e-3)
        bad = simulate_sideband_cooling(gamma_eff=2 * np.pi * 80e3,
                                        r_trap_heating=0.0,
                                        duration=50e-3)
        assert bad.nbar_ss / res.nbar_ss == pytest.approx(16.0, rel=0.3)

    def test_record_and_primitive_consumption(self, result, tmp_path):
        from noisyquantumsimulator_tpu.gate.cooling import (
            cooling_calibration_record)
        from noisyquantumsimulator_tpu.channels.calibration import (
            CalibrationStore)
        from noisyquantumsimulator_tpu.primitives.motion import Cool
        rec = cooling_calibration_record(result, "test_regime")
        store = CalibrationStore(root=str(tmp_path))
        store.save(rec)
        rec2 = store.load("neutral_atoms", "cooling", "test_regime")
        cool = Cool(calibration=rec2)
        r = cool(method="sideband")
        assert r.final_nbar == pytest.approx(result.final_nbar, rel=1e-9)
        assert r.success_probability == pytest.approx(
            result.ground_state_fraction, rel=1e-9)
        # uncalibrated methods keep the analytic table
        assert cool(method="doppler").final_temperature > 0

    def test_backend_ships_engine_cooling(self):
        b = NeutralAtomBackend()
        r = b.cool(method="sideband")
        assert r.metadata["engine"] == \
            "noisyquantumsimulator_tpu.gate.cooling"
        assert r.final_nbar < 0.01
