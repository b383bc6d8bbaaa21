"""Tests for channel conversions, tomography, Pauli library, calibration."""
import numpy as np
import pytest

from noisyquantumsimulator_tpu.channels import conversions as cv
from noisyquantumsimulator_tpu.channels import pauli as pl
from noisyquantumsimulator_tpu.channels.calibration import (
    CalibrationStore, calibrate_cz, record_from_channel)
from noisyquantumsimulator_tpu.channels.tomography import (
    CZ_MATRIX, extract_cz_channel)
from noisyquantumsimulator_tpu.core.configs import (NoiseSourceConfig,
                                                    SmoothJPSimulationInputs)


class TestConversions:
    def test_pauli_basis_orthogonality(self):
        _, P = cv.pauli_basis(2)
        G = np.einsum("aij,bji->ab", P, P)
        assert np.allclose(G, 4.0 * np.eye(16))

    def test_unitary_channel_roundtrips(self, rng):
        # random 2-qubit unitary via QR
        A = rng.normal(size=(4, 4)) + 1j * rng.normal(size=(4, 4))
        U, _ = np.linalg.qr(A)
        S = cv.unitary_superop(U)
        # choi <-> superop
        assert np.allclose(cv.choi_to_superop(cv.superop_to_choi(S)), S)
        # kraus roundtrip recovers U up to phase
        K = cv.choi_to_kraus(cv.superop_to_choi(S))
        assert len(K) == 1
        assert np.allclose(cv.kraus_to_superop(K), S, atol=1e-10)
        # ptm roundtrip
        assert np.allclose(cv.ptm_to_superop(cv.superop_to_ptm(S)), S,
                           atol=1e-10)
        # chi roundtrip
        C = cv.superop_to_choi(S)
        assert np.allclose(cv.chi_to_choi(cv.choi_to_chi(C)), C, atol=1e-10)

    def test_cptp_check(self):
        S = cv.unitary_superop(CZ_MATRIX)
        cp, tp = cv.is_cptp(S)
        assert cp and tp

    def test_average_gate_fidelity_ideal(self):
        S = cv.unitary_superop(CZ_MATRIX)
        assert cv.average_gate_fidelity(S, CZ_MATRIX) == pytest.approx(1.0)

    def test_depolarizing_fidelity(self):
        p = 0.1
        S = pl.pauli_channel_superop(pl.depolarizing_probs(p, 1), 1)
        F = cv.average_gate_fidelity(S, np.eye(2))
        assert F == pytest.approx(pl.depolarizing_rate_to_fidelity(p, 2))


class TestPauliLib:
    def test_prob_vectors_normalized(self):
        for probs in (pl.depolarizing_probs(0.2, 2), pl.dephasing_probs(0.1),
                      pl.asymmetric_pauli_probs(0.01, 0.02, 0.03)):
            assert probs.sum() == pytest.approx(1.0)
            assert (probs >= 0).all()

    def test_two_qubit_pauli_probs(self):
        p = pl.two_qubit_pauli_probs({"IX": 0.01, "ZZ": 0.02})
        assert p[0] == pytest.approx(0.97)
        with pytest.raises(ValueError):
            pl.two_qubit_pauli_probs({"II": 0.5})

    def test_twirl_of_pauli_channel_is_identity_op(self):
        probs = pl.depolarizing_probs(0.12, 1)
        S = pl.pauli_channel_superop(probs, 1)
        got = pl.pauli_twirl(S)
        assert np.allclose(got, probs, atol=1e-10)

    def test_t1t2_rates(self):
        px, py, pz = pl.t1_t2_to_pauli_rates(100e-6, 50e-6, 1e-6)
        assert px == py
        assert pz >= 0
        t1, t2 = pl.rates_to_t1_t2(px, py, pz, 1e-6)
        assert t1 == pytest.approx(100e-6, rel=1e-3)
        assert t2 == pytest.approx(50e-6, rel=1e-3)

    def test_loss_as_erasure(self):
        assert pl.loss_as_erasure_probs(1e4, 1e-6) == pytest.approx(
            1 - np.exp(-0.01))


class TestTomography:
    @pytest.fixture(scope="class")
    def noiseless_channel(self):
        return extract_cz_channel(
            SmoothJPSimulationInputs(noise=NoiseSourceConfig.noiseless()),
            include_noise=False, trap_laser_on=False)

    @pytest.fixture(scope="class")
    def noisy_channel(self):
        return extract_cz_channel()

    def test_noiseless_close_to_ideal(self, noiseless_channel):
        assert noiseless_channel.avg_gate_fidelity > 0.999
        assert noiseless_channel.mean_leakage < 1e-3
        assert noiseless_channel.completely_positive

    def test_noisy_has_leakage_and_lower_fidelity(self, noisy_channel,
                                                  noiseless_channel):
        assert noisy_channel.avg_gate_fidelity < noiseless_channel.avg_gate_fidelity
        assert noisy_channel.mean_leakage > noiseless_channel.mean_leakage

    def test_representations_consistent(self, noisy_channel):
        S = noisy_channel.superop
        assert np.allclose(cv.kraus_to_superop(noisy_channel.kraus()), S,
                           atol=1e-9)


class TestCalibration:
    def test_record_roundtrip(self, tmp_path):
        store = CalibrationStore(str(tmp_path))
        rec = calibrate_cz(store=store)
        rec2 = store.load("neutral_atoms", "rydberg_cz",
                          "n70_smooth_jp_default")
        assert rec2.duration == pytest.approx(rec.duration)
        S = store.load_superop("neutral_atoms", "rydberg_cz",
                               "n70_smooth_jp_default")
        assert S.shape == (16, 16)
        assert len(store.list_records()) == 1

    def test_twirled_probs_physical(self):
        rec = calibrate_cz()
        probs = np.asarray(rec.pauli_error_probs)
        assert probs[0] > 0.9              # mostly no error
        assert abs(probs.sum() - 1) < 1e-6
        # dephasing-dominated: IZ/ZI dominate over IX/XI
        labels = rec.pauli_labels
        assert probs[labels.index("IZ")] > probs[labels.index("IX")]


class TestLeakageSeepage:
    def test_seepage_cptp(self):
        from noisyquantumsimulator_tpu.channels.pauli import seepage_kraus
        ks = seepage_kraus(0.2)
        tot = sum(k.conj().T @ k for k in ks)
        assert np.allclose(tot, np.eye(3))

    def test_lru_conserves_probability(self):
        from noisyquantumsimulator_tpu.channels.pauli import (
            leakage_reduction_unit)
        r = leakage_reduction_unit(0.02, lru_fidelity=0.99)
        assert r["leakage_after"] < r["leakage_before"]
        assert np.isclose(r["leakage_after"] + r["herald_probability"],
                          r["leakage_before"])
