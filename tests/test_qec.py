"""Tests for the Layer-2 QEC architecture (sampler, surface code, decoders).

Fills the reference's empty tests/test_architecture/ tier, including the
parity checks the reference never had (deterministic noiseless circuits,
single-fault decodability, sub-threshold distance scaling).
"""
import numpy as np
import pytest

from noisyquantumsimulator_tpu.qec.circuits import Circuit, detector_matrix
from noisyquantumsimulator_tpu.qec.dem import build_dem, dem_to_edges
from noisyquantumsimulator_tpu.qec.decoders import (MatchingDecoder,
                                                    UnionFindDecoder,
                                                    decoder_for_circuit)
from noisyquantumsimulator_tpu.qec.memory import run_memory
from noisyquantumsimulator_tpu.qec.pauli_frame import sample_circuit
from noisyquantumsimulator_tpu.qec.surface_code import (build_layout,
                                                        code_metrics,
                                                        logical_error_rate,
                                                        memory_z_circuit)


class TestCircuitIR:
    def test_build_and_counts(self):
        c = Circuit(4)
        c.append("H", [0, 1]).append("CX", [[0, 2], [1, 3]])
        c.append("DEPOLARIZE2", [[0, 2]], arg=1e-3)
        c.append("M", [2, 3], arg=1e-3)
        c.detector([-2])
        c.observable_include(0, [-1])
        assert c.n_measurements == 2
        assert c.n_detectors == 1
        D = detector_matrix(c)
        assert D.shape == (1, 2) and D[0, 0] == 1

    def test_rec_out_of_range(self):
        c = Circuit(2)
        c.append("M", [0])
        with pytest.raises(ValueError):
            c.detector([-5])


class TestPauliFrame:
    def test_repetition_code_detects_flips(self):
        # 3-qubit repetition: two parity checks via CX onto ancillas
        c = Circuit(5)
        c.append("X_ERROR", [0, 1, 2], arg=0.1)
        c.append("CX", [[0, 3], [1, 4]])
        c.append("CX", [[1, 3], [2, 4]])
        c.append("M", [3, 4])
        c.detector([-2])
        c.detector([-1])
        out = sample_circuit(c, 20000, seed=0)
        # detector 0 fires iff q0 xor q1 flipped: 2 p (1-p)
        expect = 2 * 0.1 * 0.9
        assert out["detectors"][:, 0].mean() == pytest.approx(expect, abs=0.01)

    def test_noiseless_deterministic(self):
        c = memory_z_circuit(3, 2, p=0.0)
        out = sample_circuit(c, 128, seed=3)
        assert out["detectors"].sum() == 0
        assert out["observables"].sum() == 0

    def test_x_error_rate_statistics(self):
        c = Circuit(1)
        c.append("X_ERROR", [0], arg=0.25)
        c.append("M", [0])
        c.detector([-1])
        out = sample_circuit(c, 50000, seed=1)
        assert out["detectors"].mean() == pytest.approx(0.25, abs=0.01)

    def test_depolarize1_only_xy_flip_measurement(self):
        c = Circuit(1)
        c.append("DEPOLARIZE1", [0], arg=0.3)
        c.append("M", [0])
        c.detector([-1])
        out = sample_circuit(c, 50000, seed=2)
        # X or Y = 2/3 of errors flip Z measurement
        assert out["detectors"].mean() == pytest.approx(0.2, abs=0.01)


class TestSurfaceCode:
    @pytest.mark.parametrize("d", [3, 5, 7])
    def test_layout_counts(self, d):
        m = code_metrics(d)
        assert m["n_data"] == d * d
        assert m["n_x_stabilizers"] == (d * d - 1) // 2
        assert m["n_z_stabilizers"] == (d * d - 1) // 2

    def test_layout_validation_runs(self):
        build_layout(3)  # raises on inconsistency

    def test_circuit_shape(self):
        c = memory_z_circuit(3, 3, p=1e-3)
        # (d^2-1) ancillas per round + d^2 final data measurements
        assert c.n_measurements == 8 * 3 + 9
        # Z detectors per round + boundary
        assert c.n_detectors == 4 * 3 + 4


class TestDEM:
    def test_single_faults_decodable(self):
        """Weight-1 faults decode correctly, except the irreducible
        parallel-boundary-edge ambiguities (corner data qubits), whose
        probability weight must stay small."""
        c = memory_z_circuit(3, 3, p=1e-3)
        dem = build_dem(c)
        edges, probs, obs = dem_to_edges(dem)
        dec = MatchingDecoder(c.n_detectors, edges, probs, obs)
        dets = np.zeros((len(dem.mechanisms), c.n_detectors), np.uint8)
        want = np.zeros(len(dem.mechanisms), np.int64)
        ps = np.zeros(len(dem.mechanisms))
        for i, m in enumerate(dem.mechanisms):
            for dd in m.detectors:
                dets[i, dd] = 1
            want[i] = m.observables & 1
            ps[i] = m.probability
        pred = dec.decode_batch(dets)
        bad = pred != want
        assert ps[bad].sum() / ps.sum() < 0.05

    def test_mechanism_weights(self):
        c = memory_z_circuit(3, 2, p=1e-3)
        dem = build_dem(c)
        assert all(1 <= len(m.detectors) <= 4 for m in dem.mechanisms)
        assert all(0 < m.probability < 0.01 for m in dem.mechanisms)


class TestMemoryExperiments:
    def test_subthreshold_distance_scaling(self):
        r3 = run_memory(d=3, p=1e-3, shots=20000, seed=0)
        r5 = run_memory(d=5, p=1e-3, shots=20000, seed=0)
        assert r5.p_logical_round < r3.p_logical_round

    def test_error_rate_grows_with_p(self):
        r_lo = run_memory(d=3, p=5e-4, shots=20000, seed=1)
        r_hi = run_memory(d=3, p=4e-3, shots=20000, seed=1)
        assert r_hi.p_logical_shot > r_lo.p_logical_shot

    def test_uf_decoder_agrees_roughly(self):
        r_m = run_memory(d=3, p=2e-3, shots=3000, decoder="matching", seed=2)
        r_u = run_memory(d=3, p=2e-3, shots=3000, decoder="uf", seed=2)
        assert abs(r_m.p_logical_shot - r_u.p_logical_shot) < 0.02

    def test_calibrated_noise_mode(self):
        from noisyquantumsimulator_tpu.channels.calibration import calibrate_cz
        rec = calibrate_cz()
        r = run_memory(d=3, p=1e-3, shots=5000, noise="calibrated",
                       cz_pauli_probs=np.asarray(rec.pauli_error_probs),
                       seed=3)
        assert 0 <= r.p_logical_shot < 0.5
        assert r.detector_fraction > 0

    def test_logical_error_rate_math(self):
        r = logical_error_rate(100, 10000, 5)
        assert r["p_logical_shot"] == pytest.approx(0.01)
        # invert: (1 - (1-2 p_r)^rounds)/2 == p_shot
        p_r = r["p_logical_round"]
        assert (1 - (1 - 2 * p_r) ** 5) / 2 == pytest.approx(0.01, rel=1e-9)


class TestFastSampler:
    """One-matmul MXU sampler must be statistically identical to the
    per-instruction frame sampler."""

    def test_detector_rates_match_frame_sampler(self):
        import jax
        from noisyquantumsimulator_tpu.qec.fast_sampler import build_fast_sampler
        from noisyquantumsimulator_tpu.qec.pauli_frame import build_sampler
        from noisyquantumsimulator_tpu.qec.surface_code import memory_z_circuit
        c = memory_z_circuit(3, rounds=2, p=0.02)
        shots = 60000
        of = build_fast_sampler(c, shots)(jax.random.PRNGKey(0))
        os_ = build_sampler(c, shots)(jax.random.PRNGKey(1))
        rf = np.asarray(of["detectors"]).mean(0)
        rs = np.asarray(os_["detectors"]).mean(0)
        assert np.abs(rf - rs).max() < 6.0 * np.sqrt(rs.mean() / shots)

    def test_noiseless_silent(self):
        import jax
        from noisyquantumsimulator_tpu.qec.fast_sampler import build_fast_sampler
        from noisyquantumsimulator_tpu.qec.surface_code import memory_z_circuit
        c = memory_z_circuit(3, rounds=2, p=0.0)
        out = build_fast_sampler(c, 64)(jax.random.PRNGKey(0))
        assert not np.asarray(out["detectors"]).any()
        assert not np.asarray(out["observables"]).any()

    def test_memory_logical_rate_matches_frame_path(self):
        r_fast = run_memory(d=3, p=3e-3, shots=40000, seed=5)
        r_frame = run_memory(d=3, p=3e-3, shots=40000, seed=5,
                             sampler_kind="frame")
        # both estimate the same p_L; allow 4-sigma MC slack
        n = 40000
        pl = max(r_frame.p_logical_shot, 1.0 / n)
        sigma = np.sqrt(pl * (1 - pl) / n)
        assert abs(r_fast.p_logical_shot - r_frame.p_logical_shot) < 4 * sigma + 2e-3

    def test_measurement_flip_sites(self):
        # circuit with ONLY measurement flip noise: detectors fire at 2p(1-p)
        import jax
        from noisyquantumsimulator_tpu.qec.circuits import Circuit
        from noisyquantumsimulator_tpu.qec.fast_sampler import build_fast_sampler
        c = Circuit(n_qubits=1)
        p = 0.05
        c.append("R", [0])
        c.append("MR", [0], arg=p)
        c.append("MR", [0], arg=p)
        c.detector([-1, -2])
        out = build_fast_sampler(c, 200000)(jax.random.PRNGKey(2))
        rate = float(np.asarray(out["detectors"]).mean())
        expect = 2 * p * (1 - p)
        assert abs(rate - expect) < 0.005


class TestColorCode:
    def test_families(self):
        from noisyquantumsimulator_tpu.qec.color_code import triangular_color_code
        for d, n in ((3, 7), (5, 19), (7, 37)):
            c = triangular_color_code(d)
            assert (c.n, c.k) == (n, 1)
            assert set(np.unique(c.H.sum(1))) <= {4, 6}
            assert c.transversal_gates() == ("CX", "H", "S")

    def test_steane_is_d3(self):
        from noisyquantumsimulator_tpu.qec.color_code import steane_code
        assert steane_code().n == 7

    def test_memory_subthreshold_scaling(self):
        from noisyquantumsimulator_tpu.qec.color_code import run_color_memory
        r3 = run_color_memory(3, p=0.02, shots=20000, seed=1)
        r5 = run_color_memory(5, p=0.02, shots=20000, seed=1)
        assert r5.p_logical_shot < r3.p_logical_shot

    def test_even_d_rejected(self):
        from noisyquantumsimulator_tpu.qec.color_code import triangular_color_code
        with pytest.raises(ValueError):
            triangular_color_code(4)


class TestLatticeSurgery:
    def test_eigenstate_semantics(self):
        """merge/split must read (z1, z2, z1*z2) exactly for all four
        computational preparations, deterministically at p=0."""
        import jax
        from noisyquantumsimulator_tpu.qec.lattice_surgery import (
            zz_merge_split_circuit)
        from noisyquantumsimulator_tpu.qec.circuits import Instruction
        from noisyquantumsimulator_tpu.qec.pauli_frame import build_sampler
        d = 3
        lay = zz_merge_split_circuit(d, p=0.0).layout
        XL1 = [lay.data[(1, 2 * j + 1)] for j in range(d)]
        XL2 = [lay.data[(4 * d + 1, 2 * j + 1)] for j in range(d)]
        cases = [([], (0, 0, 0)), (XL1, (1, 0, 1)),
                 (XL2, (0, 1, 1)), (XL1 + XL2, (1, 1, 0))]
        for flips, want in cases:
            sc = zz_merge_split_circuit(d, p=0.0)
            if flips:
                sc.circuit.instructions.insert(
                    0, Instruction("X_ERROR", np.asarray(flips), 1.0, None))
            out = build_sampler(sc.circuit, 64)(jax.random.PRNGKey(0))
            obs = np.asarray(out["observables"])
            assert all(obs[:, i].min() == obs[:, i].max() for i in range(3))
            assert tuple(int(obs[0, i]) for i in range(3)) == want

    def test_noiseless_silent(self):
        from noisyquantumsimulator_tpu.qec.lattice_surgery import run_zz_surgery
        r = run_zz_surgery(3, p=0.0, shots=500)
        assert r["zz_error_rate_raw"] == 0.0
        assert r["detector_fraction"] == 0.0

    def test_noisy_error_grows_with_p(self):
        from noisyquantumsimulator_tpu.qec.lattice_surgery import run_zz_surgery
        lo = run_zz_surgery(3, p=5e-4, shots=20000, seed=1)
        hi = run_zz_surgery(3, p=5e-3, shots=20000, seed=1)
        assert 0 < lo["zz_error_rate_raw"] < hi["zz_error_rate_raw"]

    def test_fast_sampler_accepts(self):
        # the one-matmul sampler's gauge check is the determinism proof
        import jax
        from noisyquantumsimulator_tpu.qec.fast_sampler import build_fast_sampler
        from noisyquantumsimulator_tpu.qec.lattice_surgery import (
            zz_merge_split_circuit)
        sc = zz_merge_split_circuit(3, p=1e-3)
        out = build_fast_sampler(sc.circuit, 256)(jax.random.PRNGKey(1))
        assert out["observables"].shape == (256, 3)


class TestRectLayout:
    def test_rectangle_valid(self):
        from noisyquantumsimulator_tpu.qec.surface_code import build_rect_layout
        lay = build_rect_layout(7, 3)
        assert len(lay.data) == 21
        assert len(lay.x_anc) + len(lay.z_anc) == 20

    def test_square_counts_unchanged(self):
        from noisyquantumsimulator_tpu.qec.surface_code import build_layout
        lay = build_layout(5)
        assert len(lay.x_anc) == len(lay.z_anc) == 12


class TestExactNativeDecoder:
    def test_exact_beats_or_matches_greedy(self):
        from noisyquantumsimulator_tpu.qec.native import native_available
        if not native_available():
            pytest.skip("native library not built")
        r_n = run_memory(d=3, p=3e-3, shots=30000, decoder="native", seed=6)
        r_g = run_memory(d=3, p=3e-3, shots=30000, decoder="matching", seed=6)
        # exact MWPM can never be worse than greedy beyond MC noise
        assert r_n.p_logical_shot <= r_g.p_logical_shot + 3e-3

    def test_auto_selects_native(self):
        from noisyquantumsimulator_tpu.qec.native import native_available
        if not native_available():
            pytest.skip("native library not built")
        r = run_memory(d=3, p=1e-3, shots=2000, seed=7)
        assert r.decoder == "native"


class TestLDPCMovementPlanning:
    def test_bb_extraction_plan(self):
        from noisyquantumsimulator_tpu.qec.ldpc import bb_code
        from noisyquantumsimulator_tpu.qec.ldpc_layout import plan_bb_extraction
        Hx, _ = bb_code(6, 6, (3, 1, 2), (3, 1, 2))
        p = plan_bb_extraction(Hx)
        assert p.n_legs == int(Hx.sum())          # every check leg scheduled
        assert p.n_waves <= p.n_legs
        assert p.mean_parallelism > 1.0           # movement runs in parallel
        assert 0 < p.cycle_time < 0.1
        assert 0 < p.idle_error_budget < 0.1

    def test_denser_code_costs_more(self):
        from noisyquantumsimulator_tpu.qec.ldpc import bb_code
        from noisyquantumsimulator_tpu.qec.ldpc_layout import plan_bb_extraction
        Hs, _ = bb_code(6, 6, (3, 1, 2), (3, 1, 2))
        Hbig, _ = bb_code(12, 6, (3, 1, 2), (3, 1, 2))
        small = plan_bb_extraction(Hs)
        big = plan_bb_extraction(Hbig)
        assert big.total_move_distance > small.total_move_distance


class TestNNDecoder:
    def test_learns_better_than_trivial(self):
        from noisyquantumsimulator_tpu.qec.nn_decoder import train_nn_decoder
        dec, ev = train_nn_decoder(d=3, p=3e-3, steps=150, seed=1)
        assert ev["p_logical_nn"] < 0.6 * ev["p_logical_trivial"]
        assert dec.history[-1] < dec.history[0]

    def test_decode_batch_interface(self):
        import jax
        from noisyquantumsimulator_tpu.qec.nn_decoder import NNDecoder
        from noisyquantumsimulator_tpu.qec.surface_code import memory_z_circuit
        c = memory_z_circuit(3, 2, p=2e-3)
        dec = NNDecoder(c).train(steps=30)
        dets = np.zeros((16, c.n_detectors), dtype=np.uint8)
        out = dec.decode_batch(dets)
        assert out.shape == (16,)


class TestExecutor:
    def _compiled(self):
        from noisyquantumsimulator_tpu.qec.compiler import Gate, compile_circuit
        from noisyquantumsimulator_tpu.qec.topology import grid_topology
        gates = [Gate("H", (0,)), Gate("CX", (0, 1)), Gate("CZ", (1, 2)),
                 Gate("T", (2,))]
        return compile_circuit(gates, grid_topology(3, 3))

    def test_execute_reports_metrics(self):
        from noisyquantumsimulator_tpu.qec.executor import execute
        r = execute(self._compiled(), shots=5000, seed=0)
        assert r.n_ops > 4                       # decomposed to native set
        assert 0 <= r.p_any_error < 1
        assert r.total_time > 0
        assert "cz" in r.error_budget

    def test_calibrated_backend_increases_error(self):
        from noisyquantumsimulator_tpu.qec.executor import execute
        from noisyquantumsimulator_tpu.primitives import NeutralAtomBackend
        compiled = self._compiled()
        base = execute(compiled, shots=8000, seed=1)
        cal = execute(compiled, NeutralAtomBackend(), shots=8000, seed=1)
        # calibrated CZ channel carries the real (larger) error budget
        assert cal.p_any_error > base.p_any_error

    def test_error_circuit_zero_noise(self):
        from noisyquantumsimulator_tpu.qec.executor import execute
        r = execute(self._compiled(), shots=2000, seed=2,
                    cz_pauli_probs=np.eye(16)[0], p1=0.0, p_meas=0.0,
                    t1=1e9, t2=1e9)
        assert r.p_any_error == 0.0


class TestErasureDecoding:
    def test_heralds_emitted(self):
        import jax
        from noisyquantumsimulator_tpu.qec.fast_sampler import build_fast_sampler
        from noisyquantumsimulator_tpu.qec.surface_code import memory_z_circuit
        c = memory_z_circuit(3, 2, p=0.0, p_erase=0.1)
        fn = build_fast_sampler(c, 20000)
        out = fn(jax.random.PRNGKey(0))
        h = np.asarray(out["heralds"])
        assert h.shape[1] > 0
        assert abs(h.mean() - 0.1) < 0.01

    def test_heralded_beats_blind_decoding(self):
        from noisyquantumsimulator_tpu.qec.erasure import run_erasure_memory
        rh = run_erasure_memory(3, p=0.0, p_erase=0.05, shots=20000, seed=2)
        rn = run_erasure_memory(3, p=0.0, p_erase=0.05, shots=20000, seed=2,
                                use_heralds=False)
        # erasure conversion: heralded decoding must be >=5x better here
        assert rh["p_logical_shot"] * 5 < rn["p_logical_shot"]

    def test_mixed_pauli_and_erasure(self):
        from noisyquantumsimulator_tpu.qec.erasure import run_erasure_memory
        r = run_erasure_memory(3, p=1e-3, p_erase=0.02, shots=20000, seed=3)
        assert 0 <= r["p_logical_shot"] < 0.05

    def test_pure_erasure_noiseless_when_unheralded_zero(self):
        from noisyquantumsimulator_tpu.qec.erasure import run_erasure_memory
        r = run_erasure_memory(3, p=0.0, p_erase=0.0, shots=2000, seed=4)
        assert r["p_logical_shot"] == 0.0


class TestShardedBBMC:
    def test_sharded_matches_reference_physics(self):
        """north-star #4: BB-LDPC MC sharded over the mesh with psum."""
        from noisyquantumsimulator_tpu.parallel.bb_mc import (
            run_bb_memory_sharded)
        r = run_bb_memory_sharded(p=0.01, shots_per_device=2048, seed=3)
        assert r["n_devices"] >= 8            # virtual CPU mesh in tests
        assert r["shots"] == 2048 * r["n_devices"]
        # syndrome weight ~ p * mean column weight of Hz (3 per check side)
        assert 0.5 * 0.01 < r["syndrome_weight_mean"] < 10 * 0.01
        assert 0 <= r["p_logical_shot"] < 0.05
        assert r["bp_converged_frac"] > 0.98


class TestCircuitLevelBB:
    def test_noiseless_silent(self):
        from noisyquantumsimulator_tpu.qec.fast_sampler import sample_circuit_fast
        from noisyquantumsimulator_tpu.qec.ldpc import (bb_memory_circuit,
                                                        small_bb_code)
        c = bb_memory_circuit(*small_bb_code(), rounds=2, p=0.0)
        o = sample_circuit_fast(c, 128)
        assert not o["detectors"].any() and not o["observables"].any()

    def test_sparse_bp_matches_dense(self):
        import jax.numpy as jnp
        from noisyquantumsimulator_tpu.qec.ldpc import (_bp_batch, _bp_edges,
                                                        small_bb_code)
        Hx, Hz = small_bb_code()
        rng = np.random.default_rng(1)
        errors = (rng.random((256, Hz.shape[1])) < 0.01).astype(np.uint8)
        syn = ((errors @ Hz.T) % 2).astype(np.float32)
        llr0 = float(np.log(0.99 / 0.01))
        dense, _ = _bp_batch(jnp.asarray(syn),
                             H=jnp.asarray(Hz.astype(np.float32)),
                             mask=jnp.asarray(Hz.astype(bool)),
                             llr0=llr0, n_iters=30, scale=0.75)
        chk, var = np.nonzero(Hz)
        sparse, _ = _bp_edges(jnp.asarray(syn),
                              chk=jnp.asarray(chk.astype(np.int32)),
                              var=jnp.asarray(var.astype(np.int32)),
                              llr_var=jnp.full(Hz.shape[1], llr0,
                                               jnp.float32),
                              n_chk=Hz.shape[0], n_var=Hz.shape[1],
                              n_iters=30, scale=0.75)
        assert (np.asarray(dense) == np.asarray(sparse)).all()

    def test_circuit_level_decoding(self):
        from noisyquantumsimulator_tpu.qec.ldpc import run_bb_circuit_memory
        r = run_bb_circuit_memory(rounds=2, p=2e-3, shots=2000, seed=2,
                                  n_iters=30)
        assert r["p_logical_shot"] < 0.05
        assert 0 < r["detector_fraction"] < 0.2
        assert r["n_mechanisms"] > 100      # a real circuit-level DEM


class TestSurgeryD5:
    def test_d5_builds_and_decodes(self):
        from noisyquantumsimulator_tpu.qec.lattice_surgery import run_zz_surgery
        r = run_zz_surgery(5, p=1e-3, shots=5000, seed=3)
        assert r["zz_error_rate_decoded"] < r["zz_error_rate_raw"]
        assert r["n_zz_records"] > 9      # larger readout than d=3


class TestNNDecoderOnBB:
    def test_generic_circuit_support(self):
        from noisyquantumsimulator_tpu.qec.ldpc import (bb_memory_circuit,
                                                        small_bb_code)
        from noisyquantumsimulator_tpu.qec.nn_decoder import NNDecoder
        c = bb_memory_circuit(*small_bb_code(), rounds=2, p=8e-3)
        dec = NNDecoder(c, observable=0).train(steps=80)
        ev = dec.evaluate(shots=8000)
        assert ev["p_logical_nn"] < ev["p_logical_trivial"]


class TestMemoryX:
    def test_noiseless_silent_and_gauge_exact(self):
        import jax
        from noisyquantumsimulator_tpu.qec.fast_sampler import build_fast_sampler
        from noisyquantumsimulator_tpu.qec.surface_code import memory_x_circuit
        c = memory_x_circuit(3, 3, p=0.0)
        out = build_fast_sampler(c, 256)(jax.random.PRNGKey(0))
        assert not np.asarray(out["detectors"]).any()
        assert not np.asarray(out["observables"]).any()

    def test_error_type_sensitivity(self):
        from noisyquantumsimulator_tpu.qec.circuits import Instruction
        from noisyquantumsimulator_tpu.qec.fast_sampler import sample_circuit_fast
        from noisyquantumsimulator_tpu.qec.surface_code import memory_x_circuit
        data = np.arange(9)
        cz = memory_x_circuit(3, 2, p=0.0)
        cz.instructions.insert(2, Instruction("Z_ERROR", data, 0.05, None))
        cx = memory_x_circuit(3, 2, p=0.0)
        cx.instructions.insert(2, Instruction("X_ERROR", data, 0.05, None))
        assert sample_circuit_fast(cz, 5000)["detectors"].mean() > 0.01
        assert sample_circuit_fast(cx, 5000)["detectors"].mean() == 0.0

    def test_subthreshold_scaling(self):
        from noisyquantumsimulator_tpu.qec.memory import run_memory
        from noisyquantumsimulator_tpu.qec.surface_code import memory_x_circuit
        r3 = run_memory(d=3, p=1e-3, shots=20000, seed=5,
                        circuit=memory_x_circuit(3, 3, p=1e-3))
        r5 = run_memory(d=5, p=1e-3, shots=20000, seed=5,
                        circuit=memory_x_circuit(5, 5, p=1e-3))
        assert r5.p_logical_round < r3.p_logical_round


class TestNativeErasurePeeler:
    def test_matches_python_peeling(self):
        import jax
        from noisyquantumsimulator_tpu.qec.decoders import decoder_for_circuit
        from noisyquantumsimulator_tpu.qec.erasure import ErasureDecoder
        from noisyquantumsimulator_tpu.qec.fast_sampler import build_fast_sampler
        from noisyquantumsimulator_tpu.qec.surface_code import memory_z_circuit
        import noisyquantumsimulator_tpu.qec.native as nat
        if not nat.native_available():
            pytest.skip("native library not built")
        c = memory_z_circuit(3, 2, p=1e-3, p_erase=0.08)
        sampler = build_fast_sampler(c, 5000)
        out = sampler(jax.random.PRNGKey(7))
        dets = np.asarray(out["detectors"])
        hh = np.asarray(out["heralds"])
        base = decoder_for_circuit(c, kind="native")
        dec = ErasureDecoder(c.n_detectors, sampler.erasure_meta["x_det"],
                             sampler.erasure_meta["x_obs"], base)
        p_nat = dec.decode_batch(dets, hh)
        orig = nat.native_available
        nat.native_available = lambda: False
        try:
            p_py = dec.decode_batch(dets, hh)
        finally:
            nat.native_available = orig
        assert (p_nat == p_py).all()


class TestErasureBasisX:
    def test_x_basis_erasure_conversion(self):
        from noisyquantumsimulator_tpu.qec.erasure import run_erasure_memory
        rh = run_erasure_memory(3, p=0.0, p_erase=0.05, shots=10000,
                                seed=8, basis="X")
        rb = run_erasure_memory(3, p=0.0, p_erase=0.05, shots=10000,
                                seed=8, basis="X", use_heralds=False)
        assert rh["p_logical_shot"] * 5 < rb["p_logical_shot"]


class TestExactMatcherTPU:
    """On-device bitmask-DP MWPM must be bit-identical to the native C++
    exact decoder within the defect budget."""

    def test_bit_identical_to_native(self):
        import jax
        from noisyquantumsimulator_tpu.qec.surface_code import (
            memory_z_circuit)
        from noisyquantumsimulator_tpu.qec.exact_matcher import (
            exact_matcher_for_circuit)
        from noisyquantumsimulator_tpu.qec.decoders import (
            decoder_for_circuit)
        from noisyquantumsimulator_tpu.qec.fast_sampler import (
            build_fast_sampler)
        c = memory_z_circuit(3, rounds=3, p=4e-3)
        S = 2048
        out = build_fast_sampler(c, S)(jax.random.PRNGKey(5))
        dets = np.asarray(out["detectors"], np.uint8)
        ex = exact_matcher_for_circuit(c, max_defects=12, chunk=1024)
        nat = decoder_for_circuit(c, "native")
        within = dets.sum(1) <= 12
        pred_t = ex.decode_batch(dets)[within]
        pred_n = (np.asarray(nat.decode_batch(dets)) & 1)[within]
        assert within.mean() > 0.99
        assert (pred_t == pred_n).all()

    def test_beats_greedy_above_threshold(self):
        import jax
        from noisyquantumsimulator_tpu.qec.surface_code import (
            memory_z_circuit)
        from noisyquantumsimulator_tpu.qec.exact_matcher import (
            exact_matcher_for_circuit)
        from noisyquantumsimulator_tpu.qec.decoders import (
            decoder_for_circuit)
        from noisyquantumsimulator_tpu.qec.fast_sampler import (
            build_fast_sampler)
        c = memory_z_circuit(3, rounds=3, p=6e-3)
        S = 4096
        out = build_fast_sampler(c, S)(jax.random.PRNGKey(9))
        dets = np.asarray(out["detectors"], np.uint8)
        obs = np.asarray(out["observables"])[:, 0]
        ex = exact_matcher_for_circuit(c, chunk=1024)
        gr = decoder_for_circuit(c, "greedy")
        p_ex = np.mean((ex.decode_batch(dets) ^ obs) & 1)
        p_gr = np.mean(((np.asarray(gr.decode_batch(dets)) & 1) ^ obs) & 1)
        assert p_ex <= p_gr + 1e-9


class TestTieredMatcher:
    def test_bit_identical_to_pure_exact(self):
        """Tier routing (K=6 DP everywhere + compacted K=12 DP on the
        heavy tail) must reproduce the pure K=12 DP exactly."""
        import jax
        from noisyquantumsimulator_tpu.qec.surface_code import (
            memory_z_circuit)
        from noisyquantumsimulator_tpu.qec.fast_sampler import (
            build_fast_sampler)
        from noisyquantumsimulator_tpu.qec.dem import build_dem, dem_to_edges
        from noisyquantumsimulator_tpu.qec.exact_matcher import (
            ExactMatcherTPU, TieredMatcherTPU)
        c = memory_z_circuit(3, rounds=3, p=2e-2)  # plenty of heavy shots
        S = 2048
        out = build_fast_sampler(c, S)(jax.random.PRNGKey(3))
        dets = np.asarray(out["detectors"], np.uint8)
        # jitter the edge probabilities so min-weight matchings are unique
        # (the symmetric d=3 graph has massive weight degeneracy, and
        # different-K DPs may tie-break degenerate solutions differently —
        # both are valid MWPM answers, so the bit-identity contract only
        # holds for generic weights)
        edges, probs, obs = dem_to_edges(build_dem(c))
        rng = np.random.default_rng(7)
        probs = probs * np.exp(rng.normal(0, 0.13, probs.shape))
        # heavy_capacity=chunk: at this p ~20% of shots exceed k_light=2,
        # far past the default chunk/8 compaction budget
        ti = TieredMatcherTPU(c.n_detectors, edges, probs, obs,
                              k_light=2, chunk=1024, heavy_capacity=1024)
        ex = ExactMatcherTPU(c.n_detectors, edges, probs, obs,
                             max_defects=12, chunk=1024)
        within = dets.sum(1) <= 12
        assert 0.01 < np.mean(dets.sum(1) > ti.k_light)  # tail exercised
        assert (ti.decode_batch(dets)[within]
                == ex.decode_batch(dets)[within]).all()
        assert ti.overflow_fraction(dets) == ex.overflow_fraction(dets)

    def test_factory_small_chunks_and_device_batches(self):
        """tiered_matcher_for_circuit must work at awkward sizes: chunks
        below the old 64-slot capacity floor, decode_device batches
        smaller than heavy_capacity, and invalid capacities must raise."""
        import jax
        import jax.numpy as jnp
        import pytest
        from noisyquantumsimulator_tpu.qec.surface_code import (
            memory_z_circuit)
        from noisyquantumsimulator_tpu.qec.exact_matcher import (
            exact_matcher_for_circuit, tiered_matcher_for_circuit)
        from noisyquantumsimulator_tpu.qec.fast_sampler import (
            build_fast_sampler)
        c = memory_z_circuit(3, rounds=3, p=6e-3)
        out = build_fast_sampler(c, 256)(jax.random.PRNGKey(5))
        dets = np.asarray(out["detectors"], np.uint8)
        # chunk=32 < the old default capacity floor of 64 (used to crash)
        ti = tiered_matcher_for_circuit(c, k_light=4, chunk=32)
        ex = exact_matcher_for_circuit(c, chunk=32)
        within = dets.sum(1) <= 12
        assert (ti.decode_batch(dets)[within]
                == ex.decode_batch(dets)[within]).all()
        # decode_device on a batch smaller than heavy_capacity
        small = jnp.asarray(dets[:8])
        assert np.array_equal(np.asarray(ti.decode_device(small)),
                              ti.decode_batch(dets[:8]).astype(np.int32))
        with pytest.raises(ValueError):
            tiered_matcher_for_circuit(c, chunk=32, heavy_capacity=64)
        with pytest.raises(ValueError):
            tiered_matcher_for_circuit(c, chunk=32, heavy_capacity=0)

    def test_match_extraction_bit_identical_and_valid(self):
        """The traceback matching must (a) reproduce decode_device's
        parity bit-for-bit, (b) be a valid perfect matching on the defect
        set, and (c) re-score to the same observable parity when its
        pairs are looked up directly in the parity table."""
        import jax
        from noisyquantumsimulator_tpu.qec.surface_code import (
            memory_z_circuit)
        from noisyquantumsimulator_tpu.qec.fast_sampler import (
            build_fast_sampler)
        from noisyquantumsimulator_tpu.qec.dem import build_dem, dem_to_edges
        from noisyquantumsimulator_tpu.qec.exact_matcher import (
            ExactMatcherTPU)
        c = memory_z_circuit(3, rounds=3, p=1.5e-2)
        S = 512
        out = build_fast_sampler(c, S)(jax.random.PRNGKey(8))
        dets = np.asarray(out["detectors"], np.uint8)
        edges, probs, obs = dem_to_edges(build_dem(c))
        rng = np.random.default_rng(4)
        probs = probs * np.exp(rng.normal(0, 0.11, probs.shape))
        ex = ExactMatcherTPU(c.n_detectors, edges, probs, obs,
                             max_defects=8, chunk=S)
        K, n_det = ex.max_defects, c.n_detectors
        pred0 = np.asarray(ex.decode_device(dets))
        pred, match, det_idx = (np.asarray(a)
                                for a in ex.match_device(dets))
        assert (pred == pred0).all()
        par_tbl = ex.graph.parity
        nd = dets.sum(1).clip(0, K)
        for s in range(S):
            p = 0
            seen = set()
            for i in range(K):
                m = match[s, i]
                if i < nd[s]:
                    assert m != -1
                    di = det_idx[s, i]
                    assert dets[s, di] == 1
                    if m == K:
                        p ^= int(par_tbl[di, n_det])
                    else:
                        assert match[s, m] == i      # symmetric
                        if (min(i, m), max(i, m)) not in seen:
                            seen.add((min(i, m), max(i, m)))
                            p ^= int(par_tbl[di, det_idx[s, m]])
                else:
                    assert m == -1
                    assert det_idx[s, i] == n_det
            assert p == pred[s]

    def test_overflow_fraction_no_double_count(self):
        """Shots that both exceed k_heavy and overflow heavy_capacity
        must be counted once; the fraction can never exceed 1."""
        from noisyquantumsimulator_tpu.qec.exact_matcher import (
            TieredMatcherTPU)
        n_det = 20
        edges = np.array([[i, i + 1] for i in range(n_det - 1)]
                         + [[i, -1] for i in range(n_det)])
        probs = np.full(len(edges), 1e-3)
        obs = np.zeros(len(edges), np.int64)
        ti = TieredMatcherTPU(n_det, edges, probs, obs, k_light=2,
                              k_heavy=4, chunk=8, heavy_capacity=1)
        dets = np.ones((8, n_det), np.uint8)  # every shot has 20 defects
        f = ti.overflow_fraction(dets)
        assert f == 1.0  # all truncated (> k_heavy), none double-counted


class TestWindowMatcher:
    def _setup(self, d, rounds, p, S, seed):
        import jax
        from noisyquantumsimulator_tpu.qec.surface_code import (
            memory_z_circuit, memory_z_detector_rounds)
        from noisyquantumsimulator_tpu.qec.fast_sampler import (
            build_fast_sampler)
        c = memory_z_circuit(d, rounds, p=p)
        det_round = memory_z_detector_rounds(d, rounds)
        assert det_round.shape[0] == c.n_detectors
        out = build_fast_sampler(c, S)(jax.random.PRNGKey(seed))
        dets = np.asarray(out["detectors"], np.uint8)
        obs = np.asarray(out["observables"])[:, 0]
        return c, det_round, dets, obs

    def test_single_window_bit_identical_to_exact(self):
        """A window covering every round commits everything in one DP —
        must equal the plain exact matcher bit-for-bit."""
        from noisyquantumsimulator_tpu.qec.exact_matcher import (
            exact_matcher_for_circuit)
        from noisyquantumsimulator_tpu.qec.window_matcher import (
            window_matcher_for_circuit)
        c, det_round, dets, _ = self._setup(3, 4, 6e-3, 1024, 12)
        wm = window_matcher_for_circuit(c, det_round, window_rounds=16,
                                        commit_rounds=2, chunk=1024)
        assert wm.n_windows == 1
        ex = exact_matcher_for_circuit(c, chunk=1024)
        within = dets.sum(1) <= 12
        assert (wm.decode_batch(dets)[within]
                == ex.decode_batch(dets)[within]).all()

    def test_sliding_windows_match_global_exact(self):
        """Multi-window decoding with the default buffer must agree with
        the global DP on (essentially) every shot — the sliding-window
        guarantee below threshold — while spanning more rounds than any
        single K-budget DP could."""
        from noisyquantumsimulator_tpu.qec.exact_matcher import (
            exact_matcher_for_circuit)
        from noisyquantumsimulator_tpu.qec.window_matcher import (
            window_matcher_for_circuit)
        c, det_round, dets, obs = self._setup(3, 9, 6e-3, 2048, 5)
        wm = window_matcher_for_circuit(c, det_round, window_rounds=5,
                                        commit_rounds=2, chunk=2048)
        assert wm.n_windows > 2
        ex = exact_matcher_for_circuit(c, chunk=2048)
        within = dets.sum(1) <= 12
        pw = wm.decode_batch(dets)[within]
        pe = ex.decode_batch(dets)[within]
        agree = float(np.mean(pw == pe))
        assert agree > 0.995, f"window/global agreement only {agree}"
        # decoding quality must match the global decoder's
        p_win = np.mean((wm.decode_batch(dets) ^ obs) & 1)
        p_ex = np.mean((ex.decode_batch(dets) ^ obs) & 1)
        assert p_win <= p_ex * 1.2 + 1e-3
        # windows keep the per-DP defect count bounded
        assert wm.overflow_fraction(dets) <= ex.overflow_fraction(dets)

    def test_greedy_match_reproduces_greedy_parity(self):
        """_greedy_match_batch's extracted matching, re-scored against
        the parity tables, must reproduce _greedy_decode_batch exactly."""
        import jax.numpy as jnp
        from noisyquantumsimulator_tpu.qec.surface_code import (
            memory_z_circuit)
        from noisyquantumsimulator_tpu.qec.fast_sampler import (
            build_fast_sampler)
        from noisyquantumsimulator_tpu.qec.dem import build_dem, dem_to_edges
        from noisyquantumsimulator_tpu.qec.decoders import (
            MatchingGraph, _greedy_decode_batch, _greedy_match_batch)
        import jax
        c = memory_z_circuit(3, rounds=4, p=2e-2)
        dets = np.asarray(build_fast_sampler(c, 512)(
            jax.random.PRNGKey(3))["detectors"], np.uint8)
        edges, probs, obs = dem_to_edges(build_dem(c))
        g = MatchingGraph.from_edges(c.n_detectors, edges, probs, obs)
        dist = jnp.asarray(g.dist.astype(np.float32))
        par = jnp.asarray(g.parity)
        M = 16
        p_ref = np.asarray(_greedy_decode_batch(jnp.asarray(dets), dist,
                                                par, M))
        match, det_idx = (np.asarray(a) for a in _greedy_match_batch(
            jnp.asarray(dets), dist, par, M))
        n_det = c.n_detectors
        ptbl = g.parity
        for s in range(dets.shape[0]):
            p = 0
            seen = set()
            for i in range(M):
                m = match[s, i]
                if m == -1:
                    continue
                di = det_idx[s, i]
                if m == M:
                    p ^= int(ptbl[di, n_det])
                elif (min(i, m), max(i, m)) not in seen:
                    seen.add((min(i, m), max(i, m)))
                    assert match[s, m] == i
                    p ^= int(ptbl[di, det_idx[s, m]])
            assert p == p_ref[s]

    def test_greedy_fallback_windows(self):
        """With greedy_fallback on, (a) shots that never overflow decode
        bit-identically to the plain windowed matcher, and (b) under
        heavy load the fallback decodes at least as well overall while
        the overflow fraction drops (the greedy tier serves >K windows
        instead of deferral-only)."""
        import jax.numpy as jnp
        from noisyquantumsimulator_tpu.qec.window_matcher import (
            window_matcher_for_circuit)
        c, det_round, dets, obs = self._setup(5, 12, 1.5e-2, 1024, 11)
        base = window_matcher_for_circuit(c, det_round, window_rounds=5,
                                          commit_rounds=2, chunk=1024)
        gr = window_matcher_for_circuit(c, det_round, window_rounds=5,
                                        commit_rounds=2, chunk=1024,
                                        greedy_fallback=32)
        pb = base.decode_batch(dets)
        pg = gr.decode_batch(dets)
        # shots with no overflow anywhere must be identical
        _, ovf_b = (np.asarray(a)
                    for a in base.decode_device_with_overflow(
                        jnp.asarray(dets)))
        assert (pb[~ovf_b] == pg[~ovf_b]).all()
        assert ovf_b.mean() > 0.02          # overload regime exercised
        p_base = np.mean((pb ^ obs) & 1)
        p_greedy = np.mean((pg ^ obs) & 1)
        assert p_greedy <= p_base + 0.01
        assert gr.overflow_fraction(dets) < ovf_b.mean()

    def test_tiered_windows_bit_identical(self):
        """Window tiering (K=6 light trace on all shots, K=12 on the
        compacted heavy windows) must reproduce the untiered windowed
        decoder exactly when the compaction capacity covers every heavy
        shot."""
        from noisyquantumsimulator_tpu.qec.window_matcher import (
            window_matcher_for_circuit)
        c, det_round, dets, _ = self._setup(3, 9, 8e-3, 1024, 6)
        base = window_matcher_for_circuit(c, det_round, window_rounds=5,
                                          commit_rounds=2, chunk=1024)
        tier = window_matcher_for_circuit(c, det_round, window_rounds=5,
                                          commit_rounds=2, chunk=1024,
                                          k_light=6, heavy_capacity=1024)
        assert (tier.decode_batch(dets) == base.decode_batch(dets)).all()
        assert tier.overflow_fraction(dets) == base.overflow_fraction(dets)

    def test_window_scales_past_global_budget(self):
        """At a defect load where the K=12 global DP truncates heavily,
        the windowed decoder must stay within budget and decode better."""
        from noisyquantumsimulator_tpu.qec.exact_matcher import (
            exact_matcher_for_circuit)
        from noisyquantumsimulator_tpu.qec.window_matcher import (
            window_matcher_for_circuit)
        c, det_round, dets, obs = self._setup(3, 24, 8e-3, 1024, 9)
        wm = window_matcher_for_circuit(c, det_round, window_rounds=5,
                                        commit_rounds=2, chunk=1024)
        ex = exact_matcher_for_circuit(c, chunk=1024)
        assert ex.overflow_fraction(dets) > 0.05    # global DP truncates
        assert wm.overflow_fraction(dets) < 0.02    # windows do not
        p_win = np.mean((wm.decode_batch(dets) ^ obs) & 1)
        p_ex = np.mean((ex.decode_batch(dets) ^ obs) & 1)
        assert p_win <= p_ex


class TestRunMemoryWindowRouting:
    def test_auto_routes_large_d_to_cluster(self):
        """run_memory's auto decoder must use on-device exact cluster
        decomposition at d >= 9 (fixed-budget whole-shot DPs truncate
        there) and produce a physical logical error rate."""
        from noisyquantumsimulator_tpu.qec.memory import run_memory
        r = run_memory(d=9, rounds=6, p=2e-3, shots=2048)
        # with the native library built the auto route escalates flagged
        # shots to the host exact cluster decoder; plain "cluster" is
        # the no-native fallback (flags surfaced as overflow_fraction)
        from noisyquantumsimulator_tpu.qec.native import native_available
        if native_available():
            assert r.decoder == "cluster_native"
            assert 0.0 <= r.extras["escalated_fraction"] < 0.5
        else:
            assert r.decoder == "cluster"
            assert "overflow_fraction" in r.extras
        assert 0.0 <= r.p_logical_shot < 0.1

    def test_window_decoder_rejects_external_circuit(self):
        import pytest
        from noisyquantumsimulator_tpu.qec.memory import run_memory
        from noisyquantumsimulator_tpu.qec.surface_code import (
            memory_z_circuit)
        c = memory_z_circuit(3, 3, p=1e-3)
        with pytest.raises(ValueError):
            run_memory(d=3, rounds=3, circuit=c, decoder="window",
                       shots=256)


class TestHybridMatcher:
    def test_matches_exact_below_budget_and_beats_both_near_threshold(self):
        import jax
        from noisyquantumsimulator_tpu.qec.surface_code import (
            memory_z_circuit)
        from noisyquantumsimulator_tpu.qec.exact_matcher import (
            exact_matcher_for_circuit)
        from noisyquantumsimulator_tpu.qec.fast_sampler import (
            build_fast_sampler)
        c = memory_z_circuit(3, rounds=3, p=2e-3)
        S = 2048
        out = build_fast_sampler(c, S)(jax.random.PRNGKey(2))
        dets = np.asarray(out["detectors"], np.uint8)
        hy = exact_matcher_for_circuit(c, hybrid=True, chunk=1024)
        ex = exact_matcher_for_circuit(c, chunk=1024)
        within = dets.sum(1) <= 12
        assert (hy.decode_batch(dets)[within]
                == ex.decode_batch(dets)[within]).all()


class TestNativeOSD:
    def test_bit_identical_to_python(self):
        from noisyquantumsimulator_tpu.qec.ldpc import _osd0
        from noisyquantumsimulator_tpu.qec.native import osd0_batch_native
        rng = np.random.default_rng(11)
        H = (rng.random((20, 60)) < 0.12).astype(np.uint8)
        dets = (rng.random((8, 20)) < 0.3).astype(np.uint8)
        bel = rng.normal(size=(8, 60)).astype(np.float32)
        ec = osd0_batch_native(H, dets, bel)
        ep = np.stack([_osd0(H, dets[s], bel[s]) for s in range(8)])
        assert (ec == ep).all()


class TestShardedDE:
    """DE population evaluation sharded over the 8-device CPU mesh
    (SURVEY 2d parallel axis #3: optimizer populations)."""

    def test_sharded_matches_single_device(self):
        from noisyquantumsimulator_tpu.optimize.apparatus import (
            ApparatusConstraints)
        from noisyquantumsimulator_tpu.optimize.engine import (
            build_fixed_problem, make_population_objective)
        from noisyquantumsimulator_tpu.parallel.de_sharded import (
            make_population_objective_sharded)
        from noisyquantumsimulator_tpu.parallel.mesh import make_mesh

        app = ApparatusConstraints()
        problem = build_fixed_problem(app, app.make_full_noise())
        mesh = make_mesh(8, axis_names=("pop",))
        obj_sh = make_population_objective_sharded(problem, "smooth_jp",
                                                   mesh=mesh)
        obj_1 = make_population_objective(problem, "smooth_jp")
        rng = np.random.default_rng(0)
        # 13 members: forces padding to 16 (8-device mesh)
        pop = np.column_stack([
            rng.uniform(8.0, 12.0, 13),
            rng.uniform(0.2, 1.2, 13),
            rng.uniform(1.0, 1.5, 13),
            rng.uniform(4.0, 5.5, 13),
            rng.uniform(0.01, 0.03, 13)]).astype(np.float32)
        c_sh, m_sh = obj_sh(pop)
        c_1, m_1 = obj_1(pop)
        assert np.asarray(c_sh).shape == (13,)
        np.testing.assert_allclose(np.asarray(c_sh), np.asarray(c_1),
                                   rtol=2e-4, atol=2e-4)

    def test_drives_differential_evolution(self):
        from noisyquantumsimulator_tpu.optimize.apparatus import (
            ApparatusConstraints)
        from noisyquantumsimulator_tpu.optimize.engine import (
            build_fixed_problem)
        from noisyquantumsimulator_tpu.optimize.de import (
            differential_evolution)
        from noisyquantumsimulator_tpu.optimize.forward import (
            get_smooth_jp_bounds_and_x0)
        from noisyquantumsimulator_tpu.parallel.de_sharded import (
            make_population_objective_sharded)
        from noisyquantumsimulator_tpu.parallel.mesh import make_mesh

        app = ApparatusConstraints()
        problem = build_fixed_problem(app, app.make_full_noise())
        mesh = make_mesh(8, axis_names=("pop",))
        obj = make_population_objective_sharded(problem, "smooth_jp",
                                                mesh=mesh)
        b, x0 = get_smooth_jp_bounds_and_x0()
        r = differential_evolution(obj, b, x0=x0, popsize=8, maxiter=3)
        assert np.isfinite(r.fun)
        _, metrics = obj(r.x[None])
        assert float(np.asarray(metrics["avg_fidelity"])[0]) > 0.9


class TestNativeClusterExact:
    """The native decoder's >12-defect path: exact cluster decomposition
    (components under the strict adjacency D(i,j) < D(i,B) + D(j,B) match
    independently; per-component exact DP). Validated against the
    whole-shot exact DP oracle (mode=1) on matching COST — parity can
    differ only between degenerate minimum matchings."""

    def _heavy_setup(self):
        import jax
        from noisyquantumsimulator_tpu.qec.surface_code import (
            memory_z_circuit)
        from noisyquantumsimulator_tpu.qec.fast_sampler import (
            build_fast_sampler)
        from noisyquantumsimulator_tpu.qec.decoders import (
            decoder_for_circuit)
        from noisyquantumsimulator_tpu.qec.native import native_available
        if not native_available():
            pytest.skip("native library not built")
        c = memory_z_circuit(5, rounds=8, p=8e-3)
        out = build_fast_sampler(c, 4096)(jax.random.PRNGKey(7))
        dets = np.asarray(out["detectors"], np.uint8)
        return decoder_for_circuit(c, "native"), dets

    def test_cluster_cost_equals_whole_shot_exact(self):
        nat, dets = self._heavy_setup()
        nd = dets.sum(1)
        sel = (nd > 12) & (nd <= 20)
        assert sel.sum() > 100   # the regime the cluster path exists for
        rc = nat.decode_batch_ex(dets[sel], mode=0)
        ro = nat.decode_batch_ex(dets[sel], mode=1)
        ex = rc["exact"] & ro["exact"]
        assert ex.mean() > 0.98
        np.testing.assert_allclose(rc["cost"][ex], ro["cost"][ex],
                                   rtol=0, atol=1e-9)
        # parity ties between degenerate matchings are rare
        assert (rc["pred"][ex] == ro["pred"][ex]).mean() > 0.99

    def test_cluster_beats_greedy(self):
        nat, dets = self._heavy_setup()
        nd = dets.sum(1)
        sel = nd > 12
        rc = nat.decode_batch_ex(dets[sel], mode=0)
        rg = nat.decode_batch_ex(dets[sel], mode=2)
        ex = rc["exact"]
        # exact matching weight is a lower bound on greedy's
        assert (rg["cost"][ex] >= rc["cost"][ex] - 1e-9).all()
        # and greedy is strictly suboptimal on a real fraction
        assert (rg["cost"][ex] > rc["cost"][ex] + 1e-9).mean() > 0.02

    def test_small_shots_unchanged(self):
        nat, dets = self._heavy_setup()
        nd = dets.sum(1)
        small = nd <= 12
        rc = nat.decode_batch_ex(dets[small], mode=0)
        pred_old = np.asarray(nat.decode_batch(dets[small])) & 1
        assert rc["exact"].all()
        assert ((rc["pred"] & 1) == pred_old).all()


class TestBlossomMatching:
    """The native O(n^3) blossom matcher (uf_decoder.cpp decode_blossom,
    mode=3): exact MWPM in polynomial time via the boundary reduction
    w'(i,j) = min(D(i,j), D(i,B)+D(j,B)) (+1 virtual node when the defect
    count is odd). Must reproduce the bitmask-DP oracle's matching COST
    exactly on every shot; parity can differ only between cost-degenerate
    minimum matchings."""

    def _setup(self, d=5, rounds=None, p=8e-3, shots=4096, seed=5):
        import jax
        from noisyquantumsimulator_tpu.qec.surface_code import (
            memory_z_circuit)
        from noisyquantumsimulator_tpu.qec.fast_sampler import (
            build_fast_sampler)
        from noisyquantumsimulator_tpu.qec.decoders import (
            decoder_for_circuit)
        from noisyquantumsimulator_tpu.qec.native import native_available
        if not native_available():
            pytest.skip("native library not built")
        c = memory_z_circuit(d, rounds=rounds or d, p=p)
        out = build_fast_sampler(c, shots)(jax.random.PRNGKey(seed))
        dets = np.asarray(out["detectors"], np.uint8)
        return decoder_for_circuit(c, "native"), dets

    def test_blossom_matches_dp_oracle_cost(self):
        nat, dets = self._setup()
        nd = dets.sum(1)
        dets = dets[nd <= 20]          # oracle-certifiable budget
        ro = nat.decode_batch_ex(dets, mode=1)
        rb = nat.decode_batch_ex(dets, mode=3)
        assert ro["exact"].all() and rb["exact"].all()
        np.testing.assert_allclose(rb["cost"], ro["cost"],
                                   rtol=0, atol=1e-6)
        mism = (rb["pred"] & 1) != (ro["pred"] & 1)
        if mism.any():                 # tie-equivalent matchings only
            np.testing.assert_allclose(rb["cost"][mism], ro["cost"][mism],
                                       rtol=0, atol=1e-6)
            assert mism.mean() < 0.01

    def test_blossom_handles_odd_and_tiny_counts(self):
        nat, dets = self._setup(shots=8192)
        nd = dets.sum(1)
        for k in (1, 2, 3, 5):
            sel = nd == k
            if not sel.any():
                continue
            ro = nat.decode_batch_ex(dets[sel], mode=1)
            rb = nat.decode_batch_ex(dets[sel], mode=3)
            np.testing.assert_allclose(rb["cost"], ro["cost"],
                                       rtol=0, atol=1e-6)

    def test_cluster_mode_uses_blossom_beyond_dp_budget(self):
        """mode 0 components above the 12-defect DP budget route to
        blossom: the exact flag stays set and the cost is still the
        oracle minimum (the old greedy fallback cleared the flag)."""
        nat, dets = self._setup(shots=8192, seed=7)
        nd = dets.sum(1)
        sel = (nd > 12) & (nd <= 20)
        assert sel.sum() > 100
        rc = nat.decode_batch_ex(dets[sel], mode=0)
        ro = nat.decode_batch_ex(dets[sel], mode=1)
        assert rc["exact"].all()
        np.testing.assert_allclose(rc["cost"], ro["cost"],
                                   rtol=0, atol=1e-6)


class TestBPSlotKernel:
    """The dense check-slot BP kernel (_bp_slots) must reproduce the
    per-edge segment-reduction kernel (_bp_edges): same message schedule,
    same min1/min2 tie rule, so hard decisions agree bit-for-bit and
    beliefs to float association order."""

    def _setup(self):
        import jax
        from noisyquantumsimulator_tpu.qec.ldpc import (bb_memory_circuit,
                                                        small_bb_code)
        from noisyquantumsimulator_tpu.qec.fast_sampler import (
            build_fast_sampler)
        Hx, Hz = small_bb_code()
        c = bb_memory_circuit(Hx, Hz, 2, 3e-3)
        out = build_fast_sampler(c, 1024)(jax.random.PRNGKey(11))
        return c, np.asarray(out["detectors"], np.uint8), \
            np.asarray(out["observables"])

    def test_slots_matches_edges_kernel(self):
        import jax.numpy as jnp
        from noisyquantumsimulator_tpu.qec.dem_decoder import DemBPDecoder
        c, dets, _ = self._setup()
        de = DemBPDecoder(c, n_iters=25, kernel="edges")
        ds = DemBPDecoder(c, n_iters=25, kernel="slots")
        pe, be, ble = (np.asarray(a) for a in
                       de._full(jnp.asarray(dets, jnp.float32)))
        ps, bs, bls = (np.asarray(a) for a in
                       ds._full(jnp.asarray(dets, jnp.float32)))
        assert (pe == ps).all()
        assert (be == bs).all()
        assert np.abs(ble - bls).max() < 1e-2

    def test_tiering_transparent(self):
        """fast_iters tiering must not change any converged result: the
        fast tier's output is kept only where its residual syndrome is
        zero, and (with damping off) the retry tier reproduces the
        full-depth run bit-identically."""
        import jax.numpy as jnp
        from noisyquantumsimulator_tpu.qec.dem_decoder import DemBPDecoder
        c, dets, _ = self._setup()
        ds = DemBPDecoder(c, n_iters=25, kernel="slots",
                          retry_damping=0.0)
        dt = DemBPDecoder(c, n_iters=25, kernel="slots", fast_iters=6,
                          retry_damping=0.0)
        ps, bs, _ = (np.asarray(a) for a in
                     ds._full(jnp.asarray(dets, jnp.float32)))
        pt, bt, _ = (np.asarray(a) for a in
                     dt._full(jnp.asarray(dets, jnp.float32)))
        # non-converged flags agree and predictions agree wherever the
        # full-depth run converged
        assert (bs == bt).all()
        assert (ps[~bs] == pt[~bs]).all()

    def test_damped_retry_stronger_and_valid(self):
        """The default DAMPED retry tier must (a) never mark a shot
        converged whose estimate fails the exact residual-syndrome
        check — the decoder's validity contract — and (b) converge at
        least as many shots as the plain undamped retry (min-sum with
        memory breaks the oscillations that dominate the tail)."""
        import jax.numpy as jnp
        from noisyquantumsimulator_tpu.qec.dem_decoder import DemBPDecoder
        c, dets, _ = self._setup()
        plain = DemBPDecoder(c, n_iters=25, kernel="slots", fast_iters=6,
                             retry_damping=0.0)
        damped = DemBPDecoder(c, n_iters=25, kernel="slots", fast_iters=6)
        _, bp_, _ = (np.asarray(a) for a in
                     plain._full(jnp.asarray(dets, jnp.float32)))
        pd, bd, _ = (np.asarray(a) for a in
                     damped._full(jnp.asarray(dets, jnp.float32)))
        assert bd.sum() <= bp_.sum()
        # (a) is enforced structurally: _full keeps a retry result only
        # where score()'s exact int32 residual check passes, so every
        # ~bd shot carries a syndrome-valid estimate by construction;
        # sanity-check the decoder still converges the bulk
        assert bd.mean() < 0.05

    def test_onehot_varsum_matches_gather(self):
        """The MXU one-hot variable-sum must reproduce the gather form
        (f32: exact sums of <= d_max terms, identical hard decisions)."""
        import jax.numpy as jnp
        from functools import partial
        from noisyquantumsimulator_tpu.qec.dem_decoder import DemBPDecoder
        from noisyquantumsimulator_tpu.qec.ldpc import (_bp_slots,
                                                        build_slot_tables)
        c, dets, _ = self._setup()
        dec = DemBPDecoder(c, n_iters=20, kernel="slots",
                           fast_impl="xla")
        chk, var = np.nonzero(dec.H)
        tables = build_slot_tables(chk.astype(np.int64),
                                   var.astype(np.int64),
                                   dec.n_det, dec.n_mech)
        syn = jnp.asarray(dets[:256], jnp.float32)
        bp = partial(_bp_slots, llr_var=dec._llr, tables=tables,
                     n_chk=dec.n_det, n_var=dec.n_mech, n_iters=20,
                     scale=0.75)
        h0, b0 = bp(syn)
        h1, b1 = bp(syn, onehot_varsum=True)
        assert (np.asarray(h0) == np.asarray(h1)).mean() > 0.999
        assert np.abs(np.asarray(b0) - np.asarray(b1)).max() < 1e-3

    def test_pallas_c2v_interpret_matches_xla(self):
        """Kernel-level parity: the Pallas check-node update (interpret
        mode, runs on CPU) against the XLA slab formulation, including
        the unique-min tie rule and padding (+big) slots."""
        import jax.numpy as jnp
        from noisyquantumsimulator_tpu.qec.bp_kernels import c2v_pallas
        rng = np.random.default_rng(7)
        w, n_chk, S = 5, 16, 128
        m = rng.normal(size=(w, n_chk, S)).astype(np.float32)
        m[3, :, :] = 1e30  # a padding slab
        # force ties in a few columns
        m[1, :, :8] = m[0, :, :8]
        sgn_syn = np.sign(rng.normal(size=(n_chk, S))).astype(np.float32)
        big = jnp.asarray(1e30, jnp.float32)
        mj = jnp.asarray(m)
        sgn = jnp.where(mj < 0, -1.0, 1.0)
        mag = jnp.abs(mj)
        m1 = jnp.min(mag, axis=0)
        is1 = mag == m1[None]
        cnt = jnp.sum(is1.astype(jnp.int32), axis=0)
        m2 = jnp.min(jnp.where(is1, big, mag), axis=0)
        prod = jnp.prod(sgn, axis=0) * jnp.asarray(sgn_syn)
        ext_min = jnp.where(is1 & (cnt == 1)[None], m2[None], m1[None])
        ref = 0.75 * prod[None] * sgn * ext_min
        out = c2v_pallas(mj, jnp.asarray(sgn_syn), 0.75, interpret=True)
        assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    def test_decode_batch_osd_cleans_tail(self):
        from noisyquantumsimulator_tpu.qec.dem_decoder import DemBPDecoder
        c, dets, obs = self._setup()
        dec = DemBPDecoder(c, n_iters=30, kernel="slots", fast_iters=8)
        pred = dec.decode_batch(dets)
        k = obs.shape[1]
        fail = np.zeros(dets.shape[0], bool)
        for b in range(k):
            fail |= (((pred >> b) & 1) != obs[:, b])
        assert fail.mean() < 0.02

    def test_bf16_fast_tier_safe_and_comparable(self):
        """A bfloat16 fast tier may only trade extra retries, never
        correctness: every shot it marks converged carries a prediction
        whose estimate satisfied the EXACT int32 syndrome check, and the
        end-to-end failure rate must match the f32-tier decoder's."""
        import jax.numpy as jnp
        from noisyquantumsimulator_tpu.qec.dem_decoder import DemBPDecoder
        c, dets, obs = self._setup()
        d32 = DemBPDecoder(c, n_iters=25, kernel="slots", fast_iters=6)
        d16 = DemBPDecoder(c, n_iters=25, kernel="slots", fast_iters=6,
                           fast_dtype=jnp.bfloat16)
        p32, b32, _ = (np.asarray(a) for a in
                       d32._full(jnp.asarray(dets, jnp.float32)))
        p16, b16, _ = (np.asarray(a) for a in
                       d16._full(jnp.asarray(dets, jnp.float32)))
        # retry tier is f32 in both: anything EITHER marks non-converged
        # must agree, and both tiers' kept shots are valid corrections,
        # so predictions can only differ on shots where the two valid
        # corrections differ — compare failure rates instead of bits
        k = obs.shape[1]
        def fails(pred):
            f = np.zeros(dets.shape[0], bool)
            for b in range(k):
                f |= (((pred >> b) & 1) != obs[:, b])
            return f
        f32r, f16r = fails(p32), fails(p16)
        assert abs(f32r.mean() - f16r.mean()) < 5e-3
        # bf16 non-convergence can only be a (near-)superset event class;
        # in practice the sets nearly coincide
        assert abs(b32.mean() - b16.mean()) < 5e-3


class TestTruncSplit3:
    """_trunc_split3 must reconstruct ANY f32 exactly: truncated planes
    occupy non-overlapping mantissa bit ranges of the same sign, so
    every partial sum (in either association order) is exact — the
    property the cluster decoder's bf16 table dots rely on for
    bit-identity with the HIGHEST-precision einsum path."""

    def test_exact_reconstruction(self):
        import jax.numpy as jnp
        from noisyquantumsimulator_tpu.qec.cluster_matcher import (
            _trunc_split3)
        rng = np.random.default_rng(0)
        vals = np.concatenate([
            rng.standard_normal(4096).astype(np.float32) * 10 ** rng.integers(-6, 18, 4096).astype(np.float32),
            np.array([0.0, 1e18, 1.0, np.pi, 2.0 ** -126], np.float32)])
        M = jnp.asarray(vals.reshape(1, -1))
        m1, m2, m3 = _trunc_split3(M)
        back = (m1.astype(jnp.float32) + m2.astype(jnp.float32)
                + m3.astype(jnp.float32))
        assert (np.asarray(back) == vals.reshape(1, -1)).all()
        # partial sums in the other association order are exact too
        back2 = (m1.astype(jnp.float32)
                 + (m2.astype(jnp.float32) + m3.astype(jnp.float32)))
        assert (np.asarray(back2) == vals.reshape(1, -1)).all()


class TestClusterMatcherTPU:
    """On-device exact cluster decomposition (qec/cluster_matcher.py):
    per-shot components under the strict adjacency D(i,j) < D(i,B) +
    D(j,B) decoded by per-size-class bitmask DPs. Non-flagged shots must
    be parity-identical to the native C++ exact cluster decoder (the
    host oracle implementing the same theorem in f64); flagged shots
    must be a superset of everything the device could not certify."""

    def _setup(self, d, p, shots, seed=0, **kw):
        import jax
        from noisyquantumsimulator_tpu.qec.surface_code import (
            memory_z_circuit)
        from noisyquantumsimulator_tpu.qec.fast_sampler import (
            build_fast_sampler)
        from noisyquantumsimulator_tpu.qec.dem import (build_dem,
                                                       dem_to_edges)
        from noisyquantumsimulator_tpu.qec.native import (
            NativeMatchingDecoder, native_available)
        from noisyquantumsimulator_tpu.qec.cluster_matcher import (
            ClusterMatcherTPU)
        if not native_available():
            pytest.skip("native library not built")
        c = memory_z_circuit(d, rounds=d, p=p)
        edges, probs, obs = dem_to_edges(build_dem(c))
        nat = NativeMatchingDecoder(c.n_detectors, edges, probs, obs)
        cm = ClusterMatcherTPU(c.n_detectors, edges, probs, obs,
                               chunk=shots, **kw)
        out = build_fast_sampler(c, shots)(jax.random.PRNGKey(seed))
        dets = np.asarray(out["detectors"], np.uint8)
        return cm, nat, dets

    def test_parity_identical_to_native_oracle(self):
        import jax.numpy as jnp
        for d, p, shots in ((5, 3e-3, 2048), (9, 2e-3, 1024)):
            cm, nat, dets = self._setup(d, p, shots)
            pred, ovf = cm.decode_device_with_overflow(jnp.asarray(dets))
            pred = np.asarray(pred) & 1
            ovf = np.asarray(ovf)
            ref = nat.decode_batch_ex(dets, mode=0)["pred"] & 1
            ok = ~ovf
            assert ok.sum() > shots // 2
            assert (pred[ok] == ref[ok]).all(), (
                f"d={d}: device cluster parity diverged from the native "
                "oracle on certified shots")

    def test_flags_cover_oversize_components(self):
        import jax.numpy as jnp
        cm, nat, dets = self._setup(9, 2e-3, 1024)
        _, ovf = cm.decode_device_with_overflow(jnp.asarray(dets))
        ovf = np.asarray(ovf)
        maxc = nat.decode_batch_ex(dets, mode=0)["max_cluster"]
        # every shot with a component beyond the big-DP budget is flagged
        assert ovf[maxc > cm.k_big].all()

    def test_capacity_overflow_flags_not_truncates(self):
        import jax.numpy as jnp
        # starve the small-DP row capacity: affected shots must FLAG
        cm, nat, dets = self._setup(7, 5e-3, 512,
                                    small_rows_per_shot=0.13,
                                    big_rows_per_shot=0.13)
        pred, ovf = cm.decode_device_with_overflow(jnp.asarray(dets))
        pred = np.asarray(pred) & 1
        ovf = np.asarray(ovf)
        assert ovf.any()   # the starvation fired
        ref = nat.decode_batch_ex(dets, mode=0)["pred"] & 1
        assert (pred[~ovf] == ref[~ovf]).all()

    def test_escalating_equals_native_everywhere(self):
        from noisyquantumsimulator_tpu.qec.surface_code import (
            memory_z_circuit)
        from noisyquantumsimulator_tpu.qec.cluster_matcher import (
            cluster_matcher_for_circuit)
        from noisyquantumsimulator_tpu.qec.native import native_available
        import jax
        from noisyquantumsimulator_tpu.qec.fast_sampler import (
            build_fast_sampler)
        if not native_available():
            pytest.skip("native library not built")
        c = memory_z_circuit(9, rounds=9, p=2e-3)
        ec = cluster_matcher_for_circuit(c, chunk=512, escalating=True)
        out = build_fast_sampler(c, 1024)(jax.random.PRNGKey(3))
        dets = np.asarray(out["detectors"], np.uint8)
        pred = ec.decode_batch(dets) & 1
        ref = ec.native.decode_batch_ex(dets, mode=0)["pred"] & 1
        assert (pred == ref).all()
        assert 0.0 < ec.last_flagged_fraction < 1.0

    def test_gather_tiers_match_native_oracle(self):
        """K=13/14 components decode on device through the GATHER DP
        (exact_matcher._dp_from_tables_gather — index tables instead of
        the one-hot matmul form, whose K>=14 constants exceed the
        tunnel's remote-compile limit). Forcing mid-size components
        through a K=14 gather tier must stay parity-identical to the
        native f64 oracle on every certified shot."""
        import jax.numpy as jnp
        cm, nat, dets = self._setup(
            9, 3e-3, 1024,
            tiers=((3, 6, 6, 0.9), (7, 14, 14, 0.5), (15, 16, 16, 0.1)))
        pred, ovf = cm.decode_device_with_overflow(jnp.asarray(dets))
        pred = np.asarray(pred) & 1
        ovf = np.asarray(ovf)
        ref = nat.decode_batch_ex(dets, mode=0)["pred"] & 1
        ok = ~ovf
        assert ok.sum() > 1024 // 2
        # the gather tier actually served components (size 7..14 exist
        # in this regime)
        maxc = nat.decode_batch_ex(dets, mode=0)["max_cluster"]
        assert ((maxc >= 7) & (maxc <= 14) & ok).sum() > 0
        assert (pred[ok] == ref[ok]).all()


class TestGatherDP:
    """exact_matcher._dp_from_tables_gather vs the one-hot DP and a
    brute-force matcher: same recurrence, bit-identical tie-breaks."""

    @staticmethod
    def _brute(Wm, Pm, Wb, Pb):
        K = Wb.shape[0]
        best = [1e30, 0]

        def rec(rem, cost, par):
            if not rem:
                if cost < best[0] - 1e-12:
                    best[0], best[1] = cost, par
                return
            i = rem[0]
            rest = rem[1:]
            rec(rest, cost + Wb[i], par ^ int(Pb[i]))
            for idx, j in enumerate(rest):
                rec(rest[:idx] + rest[idx + 1:], cost + Wm[i, j],
                    par ^ int(Pm[i, j]))

        rec(list(range(K)), 0.0, 0)
        return best[1]

    @staticmethod
    def _rand_tables(rng, R, K):
        Wm = rng.uniform(0.1, 10, (R, K, K))
        Wm = ((Wm + Wm.transpose(0, 2, 1)) / 2).astype(np.float32)
        Wb = rng.uniform(0.1, 10, (R, K)).astype(np.float32)
        Pm = rng.integers(0, 2, (R, K, K)).astype(np.float32)
        Pm = np.triu(Pm, 1)
        Pm = Pm + Pm.transpose(0, 2, 1)
        Pb = rng.integers(0, 2, (R, K)).astype(np.float32)
        return Wm, Pm, Wb, Pb

    def test_agrees_with_onehot_dp(self, rng):
        import jax.numpy as jnp
        from noisyquantumsimulator_tpu.qec.exact_matcher import (
            _build_level_indices, _build_level_tables, _dp_from_tables,
            _dp_from_tables_gather)
        for K in (4, 6, 8, 10):
            Wm, Pm, Wb, Pb = self._rand_tables(rng, 37, K)
            a = np.asarray(_dp_from_tables(
                jnp.asarray(Wm), jnp.asarray(Pm), jnp.asarray(Wb),
                jnp.asarray(Pb), _build_level_tables(K), K))
            b = np.asarray(_dp_from_tables_gather(
                jnp.asarray(Wm), jnp.asarray(Pm), jnp.asarray(Wb),
                jnp.asarray(Pb), _build_level_indices(K), K))
            assert np.array_equal(a, b), f"K={K}"

    def test_agrees_with_brute_force_large_k(self, rng):
        import jax.numpy as jnp
        from noisyquantumsimulator_tpu.qec.exact_matcher import (
            _build_level_indices, _dp_from_tables_gather)
        for K, R in ((9, 10), (13, 8), (14, 4)):
            Wm, Pm, Wb, Pb = self._rand_tables(rng, R, K)
            g = np.asarray(_dp_from_tables_gather(
                jnp.asarray(Wm), jnp.asarray(Pm), jnp.asarray(Wb),
                jnp.asarray(Pb), _build_level_indices(K), K))
            bf = [self._brute(Wm[r].astype(float), Pm[r].astype(int),
                              Wb[r].astype(float), Pb[r].astype(int))
                  for r in range(R)]
            assert list(map(int, g)) == bf, f"K={K}"
