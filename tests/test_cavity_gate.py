"""Engine-driven cavity exchange gate (gate/cavity_gate.py): the cavity-QED
platform as a SIMULATION through the shared Lindblad solver, per the
reference contract (reference: micro_physics/cavity_qed/** — JC cavity
gates -> CPTP map + duration).

Assertion style mirrors the MS-gate suite: noiseless ~ ideal (closure is
exact in the one-excitation sector; the two-excitation leakage is the
DOCUMENTED model floor), each isolated noise source degrades with the
physically-correct scaling, and the analytic module
(physics/cavity_qed.photon_mediated_gate) is the order-of-magnitude
cross-check, not the oracle."""
import numpy as np
import pytest

from noisyquantumsimulator_tpu.core.constants import TWO_PI
from noisyquantumsimulator_tpu.gate.cavity_gate import (
    CavityGateSimResult, _ee_return_amplitude, cavity_calibration_record,
    exchange_closure_params, simulate_cavity_gate)

_G = TWO_PI * 10e6
_QUIET = dict(g=_G, kappa=0.0, gamma_spont=0.0, dephasing_rate=0.0,
              nbar_cavity=0.0, cavity_drift_sigma=0.0,
              include_budget=False, engine="host", gh_points=5)


def _eps(n_loops=9, n_fock=5, **kw):
    base = dict(_QUIET, n_loops=n_loops, n_fock=n_fock)
    base.update(kw)
    return 1.0 - simulate_cavity_gate(**base).fidelity


@pytest.fixture(scope="module")
def floor9():
    """Two-excitation nonadiabatic floor at m=9 (n_fock=5)."""
    return _eps()


class TestNoiselessGate:
    def test_one_excitation_closure_exact(self):
        """The floor is ONLY the |ee> sector: it matches the exact 3-level
        return amplitude, and grows no further with Fock truncation."""
        delta_c, tau = exchange_closure_params(_G, 9)
        a_ee = _ee_return_amplitude(_G, delta_c, tau)
        leak_ee = 1.0 - abs(a_ee) ** 2
        r = simulate_cavity_gate(n_loops=9, n_fock=6, **_QUIET)
        # avg gate fidelity weight of one leaky basis state out of four
        assert 0.05 * leak_ee < (1.0 - r.fidelity) < 1.2 * leak_ee
        assert r.completely_positive and r.trace_preserving

    def test_floor_falls_with_loops(self):
        """More loops = more dispersive (g/Delta_c ~ 1/sqrt(2m)): the
        |ee> leakage floor must fall monotonically."""
        e5, e9, e21 = _eps(n_loops=5), _eps(n_loops=9), _eps(n_loops=21)
        assert e5 > e9 > e21
        assert e21 < 2e-3

    def test_entangling_phase_approaches_pi(self):
        """phi_ee -> -pi (CZ-class CPHASE content) as m grows."""
        r9 = simulate_cavity_gate(n_loops=9, **_QUIET)
        r21 = simulate_cavity_gate(n_loops=21, **_QUIET)
        assert abs(r21.cphase_angle + np.pi) < abs(r9.cphase_angle + np.pi)
        assert abs(r21.cphase_angle + np.pi) < 0.1

    def test_wrong_phase_target_fails(self):
        """Guards the phase convention: shifting phi_ee by pi (a
        non-entangling SWAP.ZZ target) must score visibly worse."""
        from noisyquantumsimulator_tpu.channels.conversions import (
            average_gate_fidelity)
        from noisyquantumsimulator_tpu.gate.cavity_gate import (
            _ideal_exchange_unitary)
        r = simulate_cavity_gate(n_loops=9, **_QUIET)
        wrong = average_gate_fidelity(
            r.superop, _ideal_exchange_unitary(r.cphase_angle + np.pi))
        assert wrong < r.fidelity - 0.1

    def test_closure_parameters(self):
        """Duration and detuning follow the closure algebra exactly."""
        delta_c, tau = exchange_closure_params(_G, 9)
        r = simulate_cavity_gate(n_loops=9, **_QUIET)
        assert r.duration == pytest.approx(tau, rel=1e-12)
        assert delta_c == pytest.approx(
            _G * np.sqrt(8 * 64 / 17.0), rel=1e-12)
        with pytest.raises(ValueError):
            exchange_closure_params(_G, 1)


class TestNoiseScalings:
    """Each source isolated; epsilons are floor-subtracted differences."""

    def test_cavity_decay_linear_and_photon_weighted(self, floor9):
        """eps_kappa ~ kappa tau <n_ph>: linear in kappa, and the
        magnitude carries the closed-orbit photon suppression g^2/R^2
        (the crude analytic kappa*tau/4 overestimates by ~6x here —
        the engine resolves what the formula sheet cannot)."""
        kap = TWO_PI * 100e3
        e1 = _eps(kappa=kap) - floor9
        e2 = _eps(kappa=2 * kap) - floor9
        assert 1.8 < e2 / e1 < 2.2
        delta_c, tau = exchange_closure_params(_G, 9)
        R = np.sqrt(delta_c ** 2 / 4 + 2 * _G ** 2)
        est = kap * tau * (_G ** 2 / R ** 2) * 0.5
        assert est / 4 < e1 < est * 4

    def test_spontaneous_emission_linear(self, floor9):
        gam = TWO_PI * 30e3
        e1 = _eps(gamma_spont=gam) - floor9
        e2 = _eps(gamma_spont=2 * gam) - floor9
        assert 1.8 < e2 / e1 < 2.2
        _, tau = exchange_closure_params(_G, 9)
        # eps ~ gamma tau <P_e>, <P_e> ~ 1/2 over the basis average
        assert 0.2 * gam * tau < e1 < 1.5 * gam * tau

    def test_dephasing_linear(self, floor9):
        e1 = _eps(dephasing_rate=TWO_PI * 10e3) - floor9
        e2 = _eps(dephasing_rate=TWO_PI * 20e3) - floor9
        assert 1.8 < e2 / e1 < 2.2

    def test_thermal_photons_degrade(self, floor9):
        kap = TWO_PI * 100e3
        e0 = _eps(kappa=kap) - floor9
        e1 = _eps(kappa=kap, nbar_cavity=0.2) - floor9
        assert e1 > e0 * 1.2

    def test_quasistatic_drift_quadratic(self, floor9):
        """Slow cavity-frequency drift: GH ensemble gives the quadratic
        quasi-static law, like the MS gate's motional dephasing."""
        s = 0.002 * _G
        e1 = _eps(cavity_drift_sigma=s) - floor9
        e2 = _eps(cavity_drift_sigma=2 * s) - floor9
        assert 3.0 < e2 / e1 < 5.0

    def test_cooperativity_scaling(self, floor9):
        """The analytic module's headline claim (error ~ 1/C for the
        virtual-photon gate, physics/cavity_qed.photon_mediated_gate):
        scaling kappa and gamma down 4x (C up 16x) cuts the decoherence
        error 4x at fixed geometry — the 1/C law at fixed tau*."""
        kap, gam = TWO_PI * 100e3, TWO_PI * 30e3
        e1 = _eps(kappa=kap, gamma_spont=gam) - floor9
        e2 = _eps(kappa=kap / 4, gamma_spont=gam / 4) - floor9
        assert 3.5 < e1 / e2 < 4.5


class TestChannelOutputs:
    @pytest.fixture(scope="class")
    def result(self) -> CavityGateSimResult:
        return simulate_cavity_gate(
            g=_G, kappa=TWO_PI * 100e3, gamma_spont=TWO_PI * 30e3,
            nbar_cavity=0.05, n_loops=9, n_fock=5, gh_points=5,
            neighbor_mode_splitting=TWO_PI * 1e9,
            engine="host", include_budget=True)

    def test_budget_structure(self, result):
        b = result.error_budget
        for k in ("cavity_decay", "spontaneous_emission", "dephasing",
                  "thermal_photons", "cavity_drift", "model_floor"):
            assert k in b and b[k] >= 0.0
        total = sum(v for k, v in b.items()
                    if k != "spectator_mode(analytic)")
        assert total == pytest.approx(1 - result.fidelity, rel=0.35)
        assert result.cooperativity == pytest.approx(
            _G ** 2 / (TWO_PI * 100e3 * TWO_PI * 30e3))

    def test_twirled_probs(self, result):
        p = result.error_map_pauli
        assert p.shape == (16,)
        assert np.all(p >= -1e-9)
        assert np.sum(p) == pytest.approx(1.0, abs=1e-6)
        assert p[0] > 0.9

    def test_calibration_record_roundtrip(self, result, tmp_path):
        from noisyquantumsimulator_tpu.channels.calibration import (
            CalibrationStore)
        rec = cavity_calibration_record(result, regime="strong_coupling")
        assert rec.platform == "cavity_qed"
        assert rec.operation == "exchange_gate"
        store = CalibrationStore(root=str(tmp_path))
        store.save(rec)
        back = store.load("cavity_qed", "exchange_gate", "strong_coupling")
        assert back.duration == pytest.approx(result.duration)
        assert back.error_rates["avg_gate_infidelity"] == pytest.approx(
            1 - result.fidelity, abs=1e-12)

    def test_analytic_module_is_cross_check(self, result):
        """physics/cavity_qed.photon_mediated_gate('raman_virtual') at the
        same (g, kappa, gamma) lands within 30x of the engine's
        decoherence error — order-of-magnitude agreement is all the
        formula sheet ever offered (its tau is its own crude estimate)."""
        from noisyquantumsimulator_tpu.physics.cavity_qed import (
            photon_mediated_gate)
        a = photon_mediated_gate(g=_G, kappa=TWO_PI * 100e3,
                                 gamma=TWO_PI * 30e3,
                                 technique="raman_virtual")
        eng = (result.error_budget["cavity_decay"]
               + result.error_budget["spontaneous_emission"])
        ana = 1 - a.fidelity
        assert ana / 30 < eng < ana * 30


class TestJaxEngineParity:
    def test_jax_solver_path_matches_host(self):
        """engine='jax' routes through the f64-plane expm device path;
        under x64 it must match the scipy host oracle."""
        kw = dict(_QUIET, n_loops=5, n_fock=4, kappa=TWO_PI * 100e3,
                  nbar_cavity=0.1)
        r_host = simulate_cavity_gate(**kw)
        kw["engine"] = "jax"
        r_jax = simulate_cavity_gate(**kw)
        assert np.max(np.abs(r_jax.superop - r_host.superop)) < 1e-8
        assert r_jax.fidelity == pytest.approx(r_host.fidelity, abs=1e-9)
