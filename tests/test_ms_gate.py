"""Engine-driven MS gate (gate/ms_gate.py): the trapped-ion platform as a
SIMULATION through the shared Lindblad solver, per the reference contract
(reference: micro_physics/trapped_ions/qccd/gates.py:1-28).

Assertion style mirrors the rydberg property suite: noiseless ~ ideal,
each isolated noise source degrades with the physically-correct scaling,
and the analytic module (physics/trapped_ions.ms_gate) is the
order-of-magnitude cross-check, not the oracle."""
import numpy as np
import pytest

from noisyquantumsimulator_tpu.core.constants import TWO_PI
from noisyquantumsimulator_tpu.gate.ms_gate import (
    MSGateSimResult, _ideal_ms_unitary, ms_calibration_record,
    simulate_ms_gate)

_QUIET = dict(nbar=0.0, heating_rate_quanta_per_s=0.0,
              motional_coherence_time=0.0, laser_coherence_time=0.0,
              scattering_rate=0.0, include_budget=False, engine="host",
              gh_nodes=5)


def _eps(n_fock=6, exact_lamb_dicke=False, **kw):
    base = dict(_QUIET, n_fock=n_fock, exact_lamb_dicke=exact_lamb_dicke)
    base.update(kw)
    return 1.0 - simulate_ms_gate(**base).fidelity


@pytest.fixture(scope="module")
def floor6():
    """Fock-truncation floor at n_fock=6, ideal Lamb-Dicke coupling."""
    return _eps()


class TestNoiselessGate:
    def test_hits_ideal_xx(self):
        """Noiseless ideal-LD gate is exp(-i pi/4 XX) to truncation
        accuracy: the rotating-frame closure is exact (one expm, no
        discretization)."""
        r = simulate_ms_gate(n_fock=8, exact_lamb_dicke=False, **_QUIET)
        assert r.fidelity > 0.99999
        assert r.completely_positive and r.trace_preserving
        assert r.leakage < 1e-6

    def test_wrong_sign_target_fails(self):
        """Guards the sign convention: exp(+i pi/4 XX) scores ~0.2."""
        from noisyquantumsimulator_tpu.channels.conversions import (
            average_gate_fidelity)
        r = simulate_ms_gate(n_fock=6, exact_lamb_dicke=False, **_QUIET)
        wrong = average_gate_fidelity(r.superop, _ideal_ms_unitary().conj())
        assert wrong < 0.5

    def test_multi_loop_closure(self):
        """K=2 loops: tau doubles (delta fixed), fidelity still ideal."""
        r1 = simulate_ms_gate(n_fock=6, exact_lamb_dicke=False,
                              n_loops=1, **_QUIET)
        r2 = simulate_ms_gate(n_fock=6, exact_lamb_dicke=False,
                              n_loops=2, **_QUIET)
        assert r2.duration == pytest.approx(2 * r1.duration)
        assert r2.fidelity > 0.9999

    def test_amplitude_miscalibration_degrades(self):
        e0 = _eps()
        e1 = _eps(amplitude_error=0.02)
        assert e1 > e0 + 1e-4        # 2% Rabi error is a visible error


class TestNoiseScalings:
    """Each source isolated; epsilons are floor-subtracted differences."""

    def test_heating_linear_and_literature_magnitude(self, floor6):
        """Gate-mode heating: eps ~ ndot*tau/2 (Ballance/Turchette), NOT
        eta^2-suppressed — the engine corrects the analytic module's
        spectator-mode formula here."""
        tau = 50e-6
        e1 = _eps(heating_rate_quanta_per_s=100.0) - floor6
        e2 = _eps(heating_rate_quanta_per_s=200.0) - floor6
        assert 1.7 < e2 / e1 < 2.1                    # linear
        assert 0.25 * (100 * tau / 2) < e1 < 1.5 * (100 * tau / 2)

    def test_quasistatic_motional_dephasing_quadratic(self, floor6):
        """Slow mode-frequency drift: eps ~ (tau/tau_coh)^2 — the GH
        ensemble reproduces the quasi-static quadratic law the analytic
        budget assumes (a markovian collapse could not)."""
        e1 = _eps(motional_coherence_time=10e-3) - floor6
        e2 = _eps(motional_coherence_time=5e-3) - floor6
        assert 3.5 < e2 / e1 < 4.5
        # analytic: 0.5*(tau/tau_coh)^2 = 1.25e-5 at 10 ms
        assert 0.2e-5 < e1 < 5e-5

    def test_markovian_motional_dephasing_linear(self, floor6):
        e1 = _eps(motional_coherence_time=10e-3,
                  motional_dephasing_model="markovian") - floor6
        e2 = _eps(motional_coherence_time=5e-3,
                  motional_dephasing_model="markovian") - floor6
        assert 1.7 < e2 / e1 < 2.3                    # rate-linear

    def test_laser_dephasing_linear(self, floor6):
        e1 = _eps(laser_coherence_time=1.0) - floor6
        e2 = _eps(laser_coherence_time=0.5) - floor6
        assert 1.8 < e2 / e1 < 2.2
        assert 0.3 * 5e-5 < e1 < 3 * 5e-5             # ~tau/T2 = 5e-5

    def test_scattering_linear(self, floor6):
        e1 = _eps(scattering_rate=1.0) - floor6
        e2 = _eps(scattering_rate=2.0) - floor6
        assert 1.8 < e2 / e1 < 2.2

    def test_thermal_debye_waller(self):
        """Beyond-Lamb-Dicke coupling spread: monotone and superlinear in
        nbar, within 10x of the analytic (pi^2/2) nbar eta^4 estimate."""
        f0 = _eps(exact_lamb_dicke=True, n_fock=8)
        e1 = _eps(exact_lamb_dicke=True, n_fock=8, nbar=0.1) - f0
        e2 = _eps(exact_lamb_dicke=True, n_fock=8, nbar=0.2) - f0
        assert 0 < e1 < e2
        assert e2 / e1 > 2.0                          # superlinear
        from noisyquantumsimulator_tpu.physics.trapped_ions import (
            ION_MASSES, lamb_dicke_parameter)
        eta = lamb_dicke_parameter(ION_MASSES["Yb171"], TWO_PI * 3e6,
                                   2.0 * TWO_PI / 355e-9)
        analytic = (np.pi ** 2 / 2) * 0.1 * eta ** 4
        assert analytic / 10 < e1 < analytic * 10


class TestChannelOutputs:
    @pytest.fixture(scope="class")
    def result(self) -> MSGateSimResult:
        return simulate_ms_gate(n_fock=6, gh_nodes=5, engine="host",
                                include_budget=True)

    def test_budget_structure(self, result):
        b = result.error_budget
        for k in ("thermal", "heating", "motional_dephasing",
                  "laser_dephasing", "scattering", "model_floor"):
            assert k in b and b[k] >= 0.0
        # heating dominates the default operating point
        assert b["heating"] == max(
            v for k, v in b.items() if k != "spectator_mode(analytic)")
        # budget parts roughly compose to the full infidelity
        total = sum(v for k, v in b.items()
                    if k != "spectator_mode(analytic)")
        assert total == pytest.approx(1 - result.fidelity, rel=0.35)

    def test_twirled_probs(self, result):
        p = result.error_map_pauli
        assert p.shape == (16,)
        assert np.all(p >= -1e-9)
        assert np.sum(p) == pytest.approx(1.0, abs=1e-6)
        assert p[0] > 0.99                            # II dominates
        # heating = lost spin-motion coherence in the S_x eigenbasis:
        # the twirl puts it on X-type Paulis (IX/XI dominant, then XX)
        from noisyquantumsimulator_tpu.channels.conversions import pauli_basis
        labels, _ = pauli_basis(2)
        order = np.argsort(p[1:])[::-1] + 1
        top2 = {labels[i] for i in order[:2]}
        assert top2 == {"IX", "XI"}
        assert labels[order[2]] == "XX"

    def test_calibration_record_roundtrip(self, result, tmp_path):
        from noisyquantumsimulator_tpu.channels.calibration import (
            CalibrationStore)
        rec = ms_calibration_record(result, regime="yb171_test")
        assert rec.platform == "trapped_ions"
        assert rec.operation == "ms_gate"
        store = CalibrationStore(root=str(tmp_path))
        path = store.save(rec)
        back = store.load("trapped_ions", "ms_gate", "yb171_test")
        assert back.duration == pytest.approx(result.duration)
        assert back.error_rates["avg_gate_infidelity"] == pytest.approx(
            1 - result.fidelity, abs=1e-12)
        assert path  # file written

    def test_analytic_module_is_cross_check(self, result):
        """The analytic ms_gate agrees on tau exactly and on total error
        within an order of magnitude at the default operating point."""
        from noisyquantumsimulator_tpu.physics.trapped_ions import ms_gate
        a = ms_gate()
        assert a.duration == pytest.approx(result.duration, rel=1e-12)
        eng = 1 - result.fidelity
        ana = 1 - a.fidelity
        assert ana / 12 < eng < ana * 12


class TestJaxEngineParity:
    def test_jax_solver_path_matches_host(self):
        """engine='jax' routes through solver/propagator.total_propagator;
        under x64 it must match the scipy host oracle to solver precision."""
        kw = dict(_QUIET, n_fock=4, exact_lamb_dicke=True, nbar=0.1)
        r_host = simulate_ms_gate(**kw)
        kw["engine"] = "jax"
        r_jax = simulate_ms_gate(**kw)
        assert np.max(np.abs(r_jax.superop - r_host.superop)) < 1e-8
        assert r_jax.fidelity == pytest.approx(r_host.fidelity, abs=1e-9)
