"""Closed-form unit tests for the physics layer (laser / trap / noise rates).

Mirrors the reference property tests (test_rydberg_noise_physics.py
TestNoiseRateFunctions :623, plus laser/trap closed forms).
"""
import numpy as np
import pytest

from noisyquantumsimulator_tpu.core.constants import HBAR, KB, TWO_PI
from noisyquantumsimulator_tpu.core.atom_data import get_C6, get_mass
from noisyquantumsimulator_tpu.physics import laser, trap, pulses
from noisyquantumsimulator_tpu.physics import noise_rates as nr
from noisyquantumsimulator_tpu.physics import protocols as proto


class TestLaser:
    def test_E0(self):
        # 1 W into a 20 um waist: I0 = 1.59e9 W/m^2 -> E0 = 1.095 MV/m
        assert float(laser.laser_E0(1.0, 20e-6)) == pytest.approx(1.0951e6, rel=1e-3)

    def test_two_photon_rabi(self):
        O1, O2 = TWO_PI * 100e6, TWO_PI * 720e6
        De = TWO_PI * 7.8e9
        Oeff = float(laser.two_photon_rabi(O1, O2, De))
        assert Oeff / TWO_PI / 1e6 == pytest.approx(4.615, rel=1e-3)

    def test_blockade_and_radius_consistency(self):
        C6 = get_C6(70, "Rb87")
        Om = TWO_PI * 5e6
        Rb = float(laser.blockade_radius(C6, Om))
        assert float(laser.rydberg_blockade(C6, Rb)) == pytest.approx(Om, rel=1e-9)
        assert Rb == pytest.approx(7.4613e-6, rel=1e-3)

    def test_scattering_rate_closed_form(self):
        # gamma = Gamma * Omega1^2/(4 Delta^2) in the far-detuned limit
        # (test_rydberg_noise_physics.py:629)
        O1, De, Ge = TWO_PI * 100e6, TWO_PI * 7.8e9, TWO_PI * 6e6
        g = float(laser.intermediate_state_scattering_rate(O1, De, Ge))
        expected = Ge * O1 ** 2 / (4 * De ** 2)
        assert g == pytest.approx(expected, rel=1e-4)

    def test_scattering_decreases_with_detuning(self):
        O1, Ge = TWO_PI * 100e6, TWO_PI * 6e6
        g1 = float(laser.intermediate_state_scattering_rate(O1, TWO_PI * 1e9, Ge))
        g2 = float(laser.intermediate_state_scattering_rate(O1, TWO_PI * 10e9, Ge))
        assert g1 / g2 == pytest.approx(100.0, rel=1e-3)

    def test_clebsch_gordan_selection_rules(self):
        # pi transition preserves mF; clock transition F=2,mF=0 -> F'=3
        assert laser.get_clebsch_gordan(2, 0, 3, "pi") == pytest.approx(-np.sqrt(2 / 5))
        assert laser.get_clebsch_gordan(1, 0, 0, "sigma+") == 0.0

    def test_required_powers_roundtrip(self):
        d1, d2 = 3.6e-29, 1.2e-31
        w1 = w2 = 50e-6
        De = TWO_PI * 2e9
        target = TWO_PI * 4e6
        P1, P2 = laser.required_powers_for_two_photon_rabi(target, De, d1, d2, w1, w2)
        O1 = laser.single_photon_rabi(d1, laser.laser_E0(P1, w1))
        O2 = laser.single_photon_rabi(d2, laser.laser_E0(P2, w2))
        assert float(laser.two_photon_rabi(O1, O2, De)) == pytest.approx(float(target), rel=1e-6)


class TestTrap:
    mass = get_mass("Rb87")

    def test_trap_depth_scaling(self):
        from noisyquantumsimulator_tpu.core.atom_data import RB87
        U1 = float(trap.trap_depth(10e-3, 1e-6, RB87.alpha_ground))
        U2 = float(trap.trap_depth(20e-3, 1e-6, RB87.alpha_ground))
        assert U2 / U1 == pytest.approx(2.0)
        # ~1 mK ballpark for 10 mW / 1 um
        assert 0.1e-3 < U1 / KB < 5e-3

    def test_trap_frequencies_hierarchy(self):
        from noisyquantumsimulator_tpu.core.atom_data import RB87
        U0 = trap.trap_depth(10e-3, 1e-6, RB87.alpha_ground)
        wr, wz = trap.trap_frequencies(U0, self.mass, 1e-6, 852e-9)
        assert float(wr) > float(wz)  # radial much stiffer
        assert 10e3 < float(wr) / TWO_PI < 1e6

    def test_position_uncertainty_temperature_scaling(self):
        w = TWO_PI * 100e3
        s1 = float(trap.position_uncertainty(20e-6, self.mass, w))
        s2 = float(trap.position_uncertainty(5e-6, self.mass, w))
        assert s1 / s2 == pytest.approx(2.0)
        assert 10e-9 < s1 < 500e-9

    def test_blockade_fluctuation_formula(self):
        # dV/V = 6 sqrt(2) sigma / R (test_rydberg_noise_physics.py:699)
        val = float(trap.blockade_fluctuation(3e-6, 50e-9))
        assert val == pytest.approx(6 * np.sqrt(2) * 50e-9 / 3e-6)

    def test_thermal_dephasing_regimes(self):
        dvv = 0.1
        Om = TWO_PI * 5e6
        g_weak = float(trap.thermal_dephasing_rate(dvv, 2 * Om, Om))
        g_strong = float(trap.thermal_dephasing_rate(dvv, 100 * Om, Om))
        assert g_strong < g_weak  # strong blockade suppresses

    def test_doppler_rate(self):
        k_eff = TWO_PI * (1 / 780e-9 - 1 / 480e-9)
        g = float(trap.doppler_dephasing_rate(20e-6, self.mass, abs(k_eff), 200e-9))
        assert 10 < g < 100e3  # few kHz scale

    def test_doppler_counter_vs_co_propagating(self):
        k1, k2 = TWO_PI / 780e-9, TWO_PI / 480e-9
        g_counter = float(trap.doppler_dephasing_rate(20e-6, self.mass, abs(k1 - k2), 200e-9))
        g_co = float(trap.doppler_dephasing_rate(20e-6, self.mass, k1 + k2, 200e-9))
        assert g_co > g_counter

    def test_anti_trap_loss_increases_with_time(self):
        from noisyquantumsimulator_tpu.core.atom_data import RB87
        U0 = float(trap.trap_depth(10e-3, 1e-6, RB87.alpha_ground))
        p1 = float(trap.atom_loss_probability(0.2e-6, U0, 300, self.mass, 1e-6, 20e-6))
        p2 = float(trap.atom_loss_probability(2e-6, U0, 300, self.mass, 1e-6, 20e-6))
        assert p2 >= p1

    def test_zeeman_shift_clock_vs_stretched(self):
        # clock: quadratic (small); stretched: linear (large)
        dz_clock = float(trap.calculate_zeeman_shift(1e-4, (1, 0), (2, 0), "Rb87"))
        dz_str = float(trap.calculate_zeeman_shift(1e-4, (1, 1), (2, 2), "Rb87"))
        assert abs(dz_str) > 100 * abs(dz_clock)
        assert dz_clock / TWO_PI == pytest.approx(575.0, rel=1e-6)  # 575 Hz at 1 G

    def test_qubit_stark_shift_70khz_per_mk(self):
        ds = float(trap.calculate_qubit_stark_shift(10e-3, 1e-6, "Rb87",
                                                    trap_depth_mK=1.0))
        assert ds / TWO_PI == pytest.approx(70e3, rel=1e-6)

    def test_unified_pipeline_keys(self):
        d = trap.compute_trap_dependent_noise(
            "Rb87", 30e-3, 1e-6, 2e-6, 3e-6, 0.5e-6,
            Omega_1=TWO_PI * 50e6, Omega_eff=TWO_PI * 5e6)
        for k in ("gamma_r", "gamma_phi_thermal", "gamma_phi_doppler",
                  "gamma_loss_antitrap", "alpha_ratio", "magic_enhancement",
                  "trap_depth_uK", "blockade_fluctuation_percent"):
            assert k in d
        assert float(d["gamma_r"]) == pytest.approx(1 / 140e-6, rel=1e-6)


class TestNoiseRates:
    def test_decay_rate(self):
        assert float(nr.rydberg_decay_rate(140e-6)) == pytest.approx(7142.86, rel=1e-4)

    def test_bbr_rate(self):
        g = float(nr.bbr_decay_rate(280e-6, 140e-6))
        assert g == pytest.approx(1 / 140e-6 - 1 / 280e-6)

    def test_laser_dephasing(self):
        assert float(nr.laser_dephasing_rate(1e3)) == pytest.approx(TWO_PI * 1e3)

    def test_zeeman_dephasing_clock_much_smaller(self):
        g_clock = float(nr.zeeman_dephasing_rate(1e-3, "clock"))
        g_str = float(nr.zeeman_dephasing_rate(1e-3, "stretched"))
        assert g_str > 100 * g_clock

    def test_leakage_shape_dependence(self):
        # smooth pulses suppress leakage
        # (test_rydberg_noise_physics.py:672)
        Om, Dl = TWO_PI * 10e6, TWO_PI * 50e6
        g_sq = nr.leakage_rate_to_adjacent_states(Om, Dl, "square", 1e-6)
        g_bl = nr.leakage_rate_to_adjacent_states(Om, Dl, "blackman", 1e-6)
        assert g_bl < g_sq

    def test_mj_mixing_purity(self):
        Om, Dz = TWO_PI * 5e6, TWO_PI * 1.4e6
        g99 = nr.mJ_mixing_rate(Om, 0.99, Dz)
        g999 = nr.mJ_mixing_rate(Om, 0.999, Dz)
        assert g99 / g999 == pytest.approx(100.0, rel=1e-6)

    def test_compute_noise_rates_aggregate(self):
        rates = nr.compute_noise_rates()
        assert rates.gamma_r > 0
        assert rates.total_decay_rate >= rates.gamma_r
        d = rates.to_dict()
        assert d["total_dephasing"] == pytest.approx(rates.total_dephasing_rate)
        assert "NOISE RATE SUMMARY" in rates.summary_table()

    def test_dark_state_suppression(self):
        s_dark = nr.dark_state_suppression_factor(
            TWO_PI * 1e9, TWO_PI * 1e6, TWO_PI * 100e6, TWO_PI * 100e6)
        s_bright = nr.dark_state_suppression_factor(
            TWO_PI * 1e9, -TWO_PI * 1e6, TWO_PI * 100e6, TWO_PI * 100e6)
        assert s_dark < s_bright == 1.0


class TestProtocols:
    def test_lp_asymptotic(self):
        p = proto.get_protocol_params("levine_pichler")
        assert p["delta_over_omega"] == pytest.approx(0.377371)
        assert p["omega_tau"] == pytest.approx(4.29268)
        assert p["xi"] == pytest.approx(3.90242)

    def test_lp_adaptive_lookup(self):
        p = proto.get_adaptive_protocol_params("lp", 50)
        assert p["delta_over_omega"] == pytest.approx(0.370)
        # interpolated point
        p2 = proto.get_adaptive_protocol_params("lp", 70)
        assert 0.370 < p2["delta_over_omega"] < 0.375

    def test_lp_weak_blockade_warns(self):
        with pytest.warns(UserWarning):
            proto.get_adaptive_protocol_params("lp", 5)

    def test_smooth_jp_params(self):
        p = proto.get_protocol_params("smooth_jp")
        assert p["A"] == pytest.approx(0.311 * np.pi)
        assert p["omega_mod_ratio"] == pytest.approx(1.242)
        assert p["omega_tau"] == pytest.approx(10.09)
        assert p["delta_over_omega"] == pytest.approx(0.0205)

    def test_bangbang_params(self):
        p = proto.get_protocol_params("jandura_pupillo")
        assert p["omega_tau"] == pytest.approx(22.08)
        assert len(p["phases"]) == len(p["switching_times"]) + 1

    def test_unknown_protocol_raises(self):
        with pytest.raises(ValueError):
            proto.get_protocol_params("teleportation")

    def test_xi_value(self):
        # at the asymptotic optimum, angle(e^{i xi}) ~ 3.902 rad (mod 2pi)
        Om = TWO_PI * 5e6
        xi = complex(np.asarray(proto.compute_phase_shift_xi(
            0.377371 * Om, Om, 4.29268 / Om)))
        # the code returns e^{+i(2pi - 3.90242)} = conj of the documented
        # value; both produce the same LP gate (H2 uses Omega*xi).
        angle = np.angle(xi) % (2 * np.pi)
        assert angle == pytest.approx(2 * np.pi - 3.90242, abs=0.02)
        assert abs(xi) == pytest.approx(1.0, rel=1e-9)


class TestPulses:
    def test_envelope_shapes(self):
        import jax.numpy as jnp
        t = jnp.linspace(0, 1e-6, 201)
        for shape in ("square", "gaussian", "cosine", "blackman"):
            env = np.asarray(pulses.get_pulse_envelope(shape, t, 1e-6))
            assert env.max() == pytest.approx(1.0, rel=1e-6)
            assert env.min() >= -1e-12

    def test_cosine_zero_at_edges(self):
        import jax.numpy as jnp
        t = jnp.array([0.0, 1e-6])
        env = np.asarray(pulses.pulse_envelope_cosine(t, 1e-6))
        assert abs(env[0]) < 1e-12 and abs(env[1]) < 1e-12

    def test_area_correction(self):
        # cosine area = tau/2 -> correction factor 2
        assert pulses.area_correction_factor("cosine", 1e-6) == pytest.approx(2.0, rel=1e-3)
        assert pulses.area_correction_factor("square") == 1.0

    def test_spectral_hierarchy(self):
        tau, Dl = 1e-6, TWO_PI * 50e6
        S_sq = pulses.spectral_leakage_factor("square", tau, Dl)
        S_bl = pulses.spectral_leakage_factor("blackman", tau, Dl)
        assert S_bl < S_sq

    def test_unknown_shape_raises(self):
        with pytest.raises(ValueError):
            pulses.get_pulse_envelope("triangle", np.linspace(0, 1, 5), 1.0)


class TestTransport:
    def test_slow_move_is_cold(self):
        from noisyquantumsimulator_tpu.physics.transport import simulate_transport
        r = simulate_transport(distance=50e-6, duration=300e-6)
        assert r.energy_gain_quanta < 0.1
        assert r.survival_probability > 0.999

    def test_fast_move_heats(self):
        from noisyquantumsimulator_tpu.physics.transport import simulate_transport
        slow = simulate_transport(duration=200e-6)
        fast = simulate_transport(duration=50e-6)
        assert fast.energy_gain_quanta > 100 * slow.energy_gain_quanta

    def test_min_jerk_heats_less_on_average(self):
        # at any single duration either profile can hit a spectral null of
        # the acceleration at omega_trap, so compare geometric means over a
        # duration sweep: the smoother profile must win on average
        from noisyquantumsimulator_tpu.physics.transport import simulate_transport
        Ts = np.linspace(40e-6, 200e-6, 8)
        def gm(profile):
            qs = [simulate_transport(duration=float(T), profile=profile
                                     ).energy_gain_quanta for T in Ts]
            return np.exp(np.mean(np.log(np.maximum(qs, 1e-12))))
        assert gm("min_jerk") < gm("trapezoid")


class TestIonTraps:
    def test_paul_stability_boundary(self):
        from noisyquantumsimulator_tpu.physics.trapped_ions import paul_stability
        assert paul_stability(0.3)["stable"]
        assert not paul_stability(1.0)["stable"]

    def test_micromotion_scales_with_stray_field(self):
        from noisyquantumsimulator_tpu.physics.trapped_ions import paul_micromotion
        lo = paul_micromotion(excess_field=1.0)
        hi = paul_micromotion(excess_field=100.0)
        assert hi["micromotion_amplitude"] > 50 * lo["micromotion_amplitude"]
        assert hi["carrier_suppression"] < lo["carrier_suppression"]

    def test_penning_hierarchy(self):
        from noisyquantumsimulator_tpu.physics.trapped_ions import penning_frequencies
        f = penning_frequencies()
        assert f["stable"]
        # omega_- < omega_z < omega_+ and omega_+ + omega_- == omega_c
        assert f["omega_minus"] < f["omega_axial"] < f["omega_plus"]
        assert np.isclose(f["omega_plus"] + f["omega_minus"],
                          f["omega_cyclotron"])

    def test_penning_planar_crystal(self):
        from noisyquantumsimulator_tpu.physics.trapped_ions import penning_crystal
        c = penning_crystal()
        assert c["planar"] and 1e-6 < c["radius"] < 1e-3
