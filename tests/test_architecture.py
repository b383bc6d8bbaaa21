"""Tests for topology / scheduler / compiler / LDPC (Layer-2 rest) and the
multi-platform micro-physics + hardware configs."""
import numpy as np
import pytest

from noisyquantumsimulator_tpu.qec.topology import (
    graph_topology, grid_topology, reconfigurable_topology, zoned_topology)
from noisyquantumsimulator_tpu.qec.scheduler import Op, Scheduler
from noisyquantumsimulator_tpu.qec.compiler import (
    Gate, compile_circuit, decompose, map_qubits, peephole_optimize)
from noisyquantumsimulator_tpu.qec import ldpc
from noisyquantumsimulator_tpu.physics import trapped_ions as ti
from noisyquantumsimulator_tpu.physics import cavity_qed as cq
from noisyquantumsimulator_tpu.models.hardware_configs import (
    CavityQEDConfig, NeutralAtomConfig, TrappedIonConfig, list_experiments)
from noisyquantumsimulator_tpu.utils.math import (
    concurrence_2q, partial_trace, purity, trace_distance,
    von_neumann_entropy)


class TestTopology:
    def test_grid(self):
        t = grid_topology(3, 3)
        assert t.n_qubits == 9
        assert sorted(t.get_neighbors(4)) == [1, 3, 5, 7]
        assert t.can_interact(0, 1) and not t.can_interact(0, 8)
        assert t.get_path(0, 8)[0] == 0 and t.get_path(0, 8)[-1] == 8
        assert t.get_hop_distance(0, 8) == 4

    def test_graph(self):
        t = graph_topology([(0, 0), (1, 0), (2, 0)], [(0, 2)])
        assert t.can_interact(0, 2) and not t.can_interact(0, 1)

    def test_zoned(self):
        t = zoned_topology([3, 2])
        assert t.zones is not None
        assert (t.zones == [0, 0, 0, 1, 1]).all()
        # cross-zone qubits are too far to interact
        assert not t.can_interact(2, 3)

    def test_blockade_conflicts(self):
        t = grid_topology(1, 4, spacing=3e-6)
        conf = t.blockade_conflicts([(0, 1), (2, 3)], blockade_radius=4e-6)
        assert conf == [(0, 1)]
        conf2 = t.blockade_conflicts([(0, 1), (2, 3)], blockade_radius=2e-6)
        assert conf2 == []


class TestScheduler:
    def test_parallel_when_far(self):
        t = grid_topology(3, 3)
        res = Scheduler(t).schedule([Op("cz", (0, 1), 1e-6),
                                     Op("cz", (7, 8), 1e-6)])
        assert res.n_layers == 1
        assert res.total_time == pytest.approx(1e-6)

    def test_blockade_serializes(self):
        t = grid_topology(1, 4)
        res = Scheduler(t).schedule([Op("cz", (0, 1), 1e-6),
                                     Op("cz", (2, 3), 1e-6)])
        # adjacent pairs within blockade radius must serialize
        assert res.total_time == pytest.approx(2e-6)

    def test_dependency_order(self):
        t = grid_topology(1, 3)
        res = Scheduler(t).schedule([Op("sq", (0,), 1e-6),
                                     Op("cz", (0, 1), 1e-6)])
        czs = [s for s in res.ops if s.op.name == "cz"]
        assert czs[0].start >= 1e-6

    def test_idle_accounting(self):
        t = grid_topology(1, 3)
        res = Scheduler(t).schedule([Op("sq", (0,), 1e-6),
                                     Op("cz", (0, 1), 1e-6)])
        # qubit 1 idles during the first sq
        assert res.idle_time_per_qubit[1] == pytest.approx(1e-6)

    def test_measurement_exclusion(self):
        t = grid_topology(1, 2, spacing=3e-6)
        res = Scheduler(t).schedule([Op("measure", (0,), 5e-6),
                                     Op("sq", (1,), 1e-6)])
        # gate on the neighbor cannot overlap the measurement
        sq = [s for s in res.ops if s.op.name == "sq"][0]
        assert sq.start >= 5e-6 or sq.end <= 0

    def test_nonadjacent_gate_rejected(self):
        t = grid_topology(3, 3)
        with pytest.raises(ValueError):
            Scheduler(t).schedule([Op("cz", (0, 8), 1e-6)])

    def test_alap_mirrors_asap_makespan(self):
        t = grid_topology(1, 4)
        ops = [Op("cz", (0, 1), 1e-6), Op("cz", (2, 3), 1e-6),
               Op("sq", (0,), 0.5e-6)]
        a = Scheduler(t).schedule(ops, "asap")
        b = Scheduler(t).schedule(ops, "alap")
        assert a.total_time == pytest.approx(b.total_time)


class TestCompiler:
    def test_decompose_neutral(self):
        out = decompose([Gate("cx", (0, 1))], "neutral_atoms")
        assert any(g.name == "cz" for g in out)
        assert all(g.name in ("rz", "rxy", "cz") for g in out)

    def test_decompose_ions(self):
        out = decompose([Gate("cx", (0, 1))], "trapped_ions")
        assert any(g.name == "ms" for g in out)

    def test_peephole_merges_rz(self):
        out = peephole_optimize([Gate("rz", (0,), 0.3), Gate("rz", (0,), -0.3)])
        assert out == []

    def test_full_pipeline_distant_qubits(self):
        # a 4-cycle of CZs cannot embed in a line: some gate must route
        t = grid_topology(1, 4)
        circ = [Gate("cz", (0, 1)), Gate("cz", (1, 2)), Gate("cz", (2, 3)),
                Gate("cz", (3, 0))]
        cc = compile_circuit(circ, t, routing_strategy="swap")
        assert cc.n_swaps >= 1
        assert cc.schedule.total_time > 0

    def test_move_routing_on_reconfigurable(self):
        # 2x3 reconfigurable grid with free sites: the ring closure routes
        # via MOVE (free neighbor slots exist), not SWAP
        t = reconfigurable_topology(2, 3)
        circ = [Gate("cz", (0, 1)), Gate("cz", (1, 2)), Gate("cz", (2, 3)),
                Gate("cz", (3, 0))]
        cc = compile_circuit(circ, t, routing_strategy="move")
        assert cc.n_swaps == 0
        assert cc.schedule.total_time > 0


class TestLDPC:
    def test_bb_code_parameters(self):
        Hx, Hz = ldpc.small_bb_code()
        assert ldpc.check_css(Hx, Hz)
        assert ldpc.css_n_k(Hx, Hz) == (72, 12)
        Hx2, Hz2 = ldpc.gross_code()
        assert ldpc.check_css(Hx2, Hz2)
        assert ldpc.css_n_k(Hx2, Hz2) == (144, 12)

    def test_logical_operators(self):
        Hx, Hz = ldpc.small_bb_code()
        L = ldpc.logical_operators(Hx, Hz)
        assert L.shape[0] == 12
        # logicals commute with X checks: Hx . L^T = 0
        assert not ((Hx.astype(int) @ L.T.astype(int)) % 2).any()
        assert L.sum(1).min() >= 6  # weight >= distance

    def test_bp_repetition(self):
        H = np.array([[1, 1, 0], [0, 1, 1]], np.uint8)
        dec = ldpc.BPDecoder(H, error_prob=0.1, n_iters=8)
        est = dec.decode_batch(np.array([[1, 0], [0, 0], [1, 1]], np.uint8))
        assert est.tolist() == [[1, 0, 0], [0, 0, 0], [0, 1, 0]]

    def test_bp_weight_one_exact(self):
        Hx, Hz = ldpc.small_bb_code()
        errors = np.eye(Hz.shape[1], dtype=np.uint8)
        syn = (errors @ Hz.T) % 2
        dec = ldpc.BPDecoder(Hz, error_prob=0.002, n_iters=30)
        est = dec.decode_batch(syn)
        assert (est == errors).all()

    def test_bb_memory_subthreshold(self):
        r = ldpc.run_bb_memory(p=2e-3, shots=1500, seed=0)
        assert r.decoder_converged_frac == 1.0
        assert r.p_logical_shot < 0.01
        r_hi = ldpc.run_bb_memory(p=2e-2, shots=1500, seed=0)
        assert r_hi.p_logical_shot > r.p_logical_shot


class TestTrappedIons:
    def test_ms_gate_budget(self):
        r = ti.ms_gate()
        assert 0.9 < r.fidelity < 1.0
        assert r.duration > 0
        assert abs(r.error_map_pauli.sum() - 1) < 1e-9
        assert set(r.error_budget) >= {"thermal", "heating", "scattering"}

    def test_ms_hotter_is_worse(self):
        cold = ti.ms_gate(nbar=0.02)
        hot = ti.ms_gate(nbar=1.0)
        assert hot.fidelity < cold.fidelity

    def test_mode_frequencies(self):
        f = ti.axial_mode_frequencies(2 * np.pi * 1e6, 2)
        assert f[1] / f[0] == pytest.approx(np.sqrt(3))

    def test_shuttle(self):
        s = ti.shuttle(100e-6)
        sj = ti.shuttle(100e-6, junction=True)
        assert sj.duration > s.duration
        assert sj.heating_quanta > s.heating_quanta

    def test_readout_confusion(self):
        cm, fid = ti.fluorescence_readout()
        assert np.allclose(cm.sum(axis=1), 1.0)
        assert fid > 0.95

    def test_sideband_limit(self):
        nbar = ti.sideband_cooling_limit(2 * np.pi * 3e6, 2 * np.pi * 20e3)
        assert nbar < 0.01


class TestCavityQED:
    def test_cooperativity(self):
        cfg = CavityQEDConfig.from_experiment("rempe_fiber")
        assert cfg.cooperativity > 10

    def test_gate_error_scales_with_C(self):
        good = cq.photon_mediated_gate(g=2 * np.pi * 40e6)
        bad = cq.photon_mediated_gate(g=2 * np.pi * 5e6)
        assert good.fidelity > bad.fidelity

    def test_jc_hamiltonian_hermitian(self):
        H = cq.jaynes_cummings_hamiltonian(2 * np.pi * 1e6, 0.0, n_fock=4)
        assert np.allclose(H, H.conj().T)

    def test_vacuum_rabi_doublet(self):
        d = np.linspace(-3e7, 3e7, 501)
        T = cq.atom_cavity_spectrum(2 * np.pi * 3e6, 2 * np.pi * 1e6,
                                    2 * np.pi * 0.1e6, d)
        # transmission dip at resonance, peaks at +-g
        assert T[250] < 0.1
        assert T.max() > 0.5


class TestHardwareConfigs:
    def test_registry(self):
        exps = list_experiments()
        assert "lukin_2022" in exps["neutral_atoms"]
        assert "quantinuum_h2" in exps["trapped_ions"]

    def test_from_experiment_and_apparatus(self):
        cfg = NeutralAtomConfig.from_experiment("lukin_2022")
        app = cfg.apparatus()
        assert app.n_rydberg == 53
        with pytest.raises(ValueError):
            NeutralAtomConfig.from_experiment("nonexistent_lab")

    def test_ion_config(self):
        c = TrappedIonConfig.from_experiment("quantinuum_h2")
        assert c.ms_gate_fidelity > 0.99


class TestMathUtils:
    def test_partial_trace_bell(self):
        bell = np.array([1, 0, 0, 1], complex) / np.sqrt(2)
        rho = np.outer(bell, bell.conj())
        red = np.asarray(partial_trace(rho, 0, (2, 2)))
        assert np.allclose(red, np.eye(2) / 2)
        assert float(von_neumann_entropy(red)) == pytest.approx(1.0)

    def test_concurrence(self):
        bell = np.array([1, 0, 0, 1], complex) / np.sqrt(2)
        rho = np.outer(bell, bell.conj())
        assert float(concurrence_2q(rho)) == pytest.approx(1.0, abs=1e-6)
        assert float(concurrence_2q(np.eye(4) / 4)) == pytest.approx(0.0, abs=1e-6)

    def test_purity_and_distance(self):
        rho = np.eye(2, dtype=complex) / 2
        assert float(purity(rho)) == pytest.approx(0.5)
        assert float(trace_distance(rho, rho)) == pytest.approx(0.0, abs=1e-12)


class TestObservability:
    def test_metrics_registry_roundtrip(self, tmp_path):
        from noisyquantumsimulator_tpu.utils.observability import (
            MetricsRegistry)
        m = MetricsRegistry()
        m.incr("sims", 5)
        m.gauge("fidelity", 0.99)
        with m.timer("solve"):
            pass
        m.event("calib", protocol="lp")
        s = m.summary()
        assert s["counters"]["sims"] == 5
        assert s["gauges"]["fidelity"] == 0.99
        assert "solve" in s["timings"]
        path = tmp_path / "metrics.jsonl"
        m.dump_jsonl(str(path))
        assert path.exists() and path.read_text().strip()
        m.reset()
        assert m.summary()["counters"] == {}

    def test_log_compile_time(self):
        import jax.numpy as jnp
        from noisyquantumsimulator_tpu.utils.observability import (
            MetricsRegistry, log_compile_time)
        import jax
        reg = MetricsRegistry()
        compiled = log_compile_time(lambda x: x * 2, jnp.ones(4),
                                    registry=reg)
        assert np.allclose(np.asarray(compiled(jnp.ones(4))), 2.0)
        assert reg.timings["compile.compile_s"]

    def test_device_memory_stats_shape(self):
        from noisyquantumsimulator_tpu.utils.observability import (
            device_memory_stats)
        stats = device_memory_stats()
        assert isinstance(stats, dict)
