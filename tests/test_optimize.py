"""Tests for the optimization layer: cost, DE, objectives, sweeps, inverse."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from noisyquantumsimulator_tpu.optimize.apparatus import (ApparatusConstraints,
                                                          SimulationCache)
from noisyquantumsimulator_tpu.optimize.cost import (compute_cost,
                                                     compute_cost_arrays,
                                                     extract_metrics)
from noisyquantumsimulator_tpu.optimize.de import differential_evolution
from noisyquantumsimulator_tpu.optimize.engine import (
    build_fixed_problem, make_objective, make_population_objective)
from noisyquantumsimulator_tpu.optimize.forward import (
    get_jp_bangbang_bounds_and_x0, get_lp_bounds_and_x0,
    get_smooth_jp_bounds_and_x0, run_baseline, warm_start_bounds)
from noisyquantumsimulator_tpu.optimize.sweeps import (hardware_sweep,
                                                       protocol_sweep)


@pytest.fixture(scope="module")
def problem():
    app = ApparatusConstraints()
    return build_fixed_problem(app, app.make_noiseless(), include_noise=False)


class TestCost:
    def test_perfect_gate_cheap(self):
        m = {"avg_fidelity": 1.0, "f11": 1.0, "cz_phase_fidelity": 1.0}
        assert compute_cost(m, gate_time_us=0.3) == pytest.approx(0.003)

    def test_floor_below_half(self):
        m = {"avg_fidelity": 0.4, "f11": 0.4, "cz_phase_fidelity": 0.9}
        assert compute_cost(m) == 1e6

    def test_nan_guard(self):
        m = {"avg_fidelity": np.nan, "f11": 0.9, "cz_phase_fidelity": 0.9}
        assert compute_cost(m) == 1e6

    def test_array_version_matches(self):
        c = float(compute_cost_arrays(jnp.asarray(0.99), jnp.asarray(0.98),
                                      jnp.asarray(0.995), jnp.asarray(0.3)))
        want = compute_cost({"avg_fidelity": 0.99, "f11": 0.98,
                             "cz_phase_fidelity": 0.995}, 0.3)
        assert c == pytest.approx(want)


class TestApparatus:
    def test_fingerprint_changes(self):
        a = ApparatusConstraints()
        b = ApparatusConstraints(temperature=5e-6)
        assert a.fingerprint() != b.fingerprint()

    def test_cache_roundtrip(self, tmp_path):
        cache = SimulationCache()
        k = cache.make_key("lp", [0.377, 4.29], "abc")
        cache[k] = (1.23, {"avg_fidelity": 0.99})
        path = str(tmp_path / "c.json")
        cache.save(path)
        c2 = SimulationCache()
        c2.load(path)
        assert c2[k][0] == 1.23


class TestObjectives:
    def test_lp_objective_at_optimum(self, problem):
        obj = make_objective(problem, "lp")
        cost, m = obj(jnp.asarray([0.377371, 4.29268]))
        # trap-on Stark shift costs ~0.5% even noiseless (see gate tests)
        assert float(m["avg_fidelity"]) > 0.99
        assert float(cost) < 5000.0

    def test_lp_objective_is_differentiable(self, problem):
        obj = make_objective(problem, "lp")
        g = jax.grad(lambda x: obj(x)[0])(jnp.asarray([0.36, 4.2]))
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.any(np.abs(np.asarray(g)) > 0)

    def test_population_objective_batched(self, problem):
        pop_obj = make_population_objective(problem, "smooth_jp")
        x0 = jnp.asarray([10.09, 0.311 * np.pi, 1.242, 4.696, 0.0205])
        pop = jnp.stack([x0, x0 * 1.02, x0 * 0.98])
        costs, metrics = pop_obj(pop)
        assert costs.shape == (3,)
        assert float(metrics["avg_fidelity"][0]) > 0.99
        # default params should be near-optimal in this neighborhood
        assert float(costs[0]) <= float(costs[1]) + 1e3

    def test_bangbang_objective(self, problem):
        obj = make_objective(problem, "jandura_pupillo", n_segments=5)
        bounds, x0 = get_jp_bangbang_bounds_and_x0(5)
        cost, m = obj(jnp.asarray(x0))
        assert np.isfinite(float(cost))

    def test_optimize_cz_gate_grape_protocol(self):
        """optimize_cz_gate(protocol='grape') runs the full adam loop and
        returns a standard OptimizationResult with per-phase params."""
        from noisyquantumsimulator_tpu.optimize.forward import (
            optimize_cz_gate)
        r = optimize_cz_gate("grape", grape_steps=15, grape_n_steps=48)
        assert r.protocol == "grape"
        assert len(r.best_params) == 48
        assert len(r.param_names) == 48
        assert r.best_metrics["avg_fidelity"] > 0.95
        assert r.history[-1] <= r.history[0]

    def test_grape_free_phases_descends(self, problem):
        """GRAPE mode: every segment phase is a parameter; adam through
        the differentiable solver must reduce the cost from the smooth-JP
        starting pulse and keep physical fidelity."""
        import optax
        from noisyquantumsimulator_tpu.optimize.engine import (
            make_value_and_grad, smooth_jp_uniform_from_params)
        n = 64
        x0 = jnp.asarray([10.09, 0.311 * np.pi, 1.242, 4.696, 0.0205])
        phases0, _, _ = smooth_jp_uniform_from_params(x0, problem,
                                                      n_steps=n)
        vg = make_value_and_grad(problem, "grape", omega_tau=10.09,
                                 delta_over_omega=0.0205)
        obj = make_objective(problem, "grape", omega_tau=10.09,
                             delta_over_omega=0.0205)
        c_start, m_start = obj(phases0)
        opt = optax.adam(2e-3)
        ph = jnp.asarray(phases0)
        st = opt.init(ph)
        for _ in range(25):
            cost, grad = vg(ph)
            assert np.all(np.isfinite(np.asarray(grad)))
            upd, st = opt.update(grad, st)
            ph = optax.apply_updates(ph, upd)
        c_end, m_end = obj(ph)
        assert float(c_end) < float(c_start)
        assert float(m_end["avg_fidelity"]) >= \
            float(m_start["avg_fidelity"]) - 1e-3


class TestDE:
    def test_minimizes_quadratic(self):
        def cost_fn(pop):
            c = jnp.sum((pop - jnp.asarray([1.0, -2.0])) ** 2, axis=1)
            return c, {}
        res = differential_evolution(cost_fn, [(-5, 5), (-5, 5)],
                                     popsize=20, maxiter=60, seed=0)
        assert res.fun < 1e-3
        assert np.allclose(res.x, [1.0, -2.0], atol=0.05)
        assert res.history[-1] <= res.history[0]


class TestBoundsAndBaseline:
    def test_bounds_shapes(self):
        b, x = get_lp_bounds_and_x0()
        assert len(b) == len(x) == 2
        b, x = get_smooth_jp_bounds_and_x0()
        assert len(b) == len(x) == 5
        b, x = get_jp_bangbang_bounds_and_x0(5)
        assert len(b) == len(x) == 10
        with pytest.raises(ValueError):
            get_jp_bangbang_bounds_and_x0(6)

    def test_run_baseline(self):
        result, metrics = run_baseline("smooth_jp", verbose=False)
        assert 0.9 < metrics["avg_fidelity"] <= 1.0
        assert metrics["gate_time_us"] > 0

    def test_warm_start_bounds(self):
        from noisyquantumsimulator_tpu.optimize.apparatus import OptimizationResult
        res = OptimizationResult(
            success=True, protocol="lp", best_params=np.array([0.37, 4.3]),
            param_names=["delta_over_omega", "omega_tau"], best_cost=1.0,
            best_metrics={}, n_evaluations=10, runtime_s=1.0)
        b, x = warm_start_bounds(res, frac=0.1)
        assert b[0][0] < 0.37 < b[0][1]


class TestSweeps:
    def test_protocol_sweep_one_call(self):
        res = protocol_sweep("lp", 0, np.linspace(0.3, 0.45, 5),
                             [0.377371, 4.29268], include_noise=False)
        assert len(res.fidelity) == 5
        # optimum near 0.377
        assert 0.33 < res.values[res.best()] < 0.42

    def test_hardware_sweep_temperature(self):
        res = hardware_sweep("temperature", [2e-6, 50e-6],
                             protocol="smooth_jp")
        assert res.fidelity[0] > res.fidelity[1]


class TestLegacyShims:
    def test_deprecation_and_delegation(self):
        import warnings
        from noisyquantumsimulator_tpu.optimize import jp_legacy
        from noisyquantumsimulator_tpu.optimize.forward import (
            get_jp_bangbang_bounds_and_x0)
        _, x0 = get_jp_bangbang_bounds_and_x0(5)
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            c = jp_legacy.jp_bangbang_cost(x0)
        assert np.isfinite(c)
        assert any(issubclass(x.category, DeprecationWarning) for x in w)


class TestForwardOptimizerParity:
    """Reference parity gaps closed in round 2: spacing_factor
    co-optimization and the two_phase strategy
    (reference optimize_cz_gate.py:905-991, 1043-1051, 1179-1244)."""

    def test_spacing_co_optimization(self):
        from noisyquantumsimulator_tpu.optimize.forward import (
            optimize_cz_gate)
        r = optimize_cz_gate("smooth_jp", maxiter=3, popsize=5,
                             grad_polish=False, co_optimize_spacing=True,
                             spacing_bounds=(2.0, 4.0))
        assert r.param_names[-1] == "spacing_factor"
        assert 2.0 <= r.best_params[-1] <= 4.0
        assert r.best_metrics["avg_fidelity"] > 0.9

    def test_two_phase_strategy(self):
        from noisyquantumsimulator_tpu.optimize.forward import (
            optimize_cz_gate)
        r = optimize_cz_gate("smooth_jp", maxiter=3, popsize=5,
                             grad_polish=False, strategy="two_phase")
        assert r.best_metrics["avg_fidelity"] > 0.9

    def test_spacing_replan_changes_physics(self):
        # different spacing -> different blockade V in L0 (full replan,
        # not just a coherent rescale)
        from noisyquantumsimulator_tpu.optimize.apparatus import (
            ApparatusConstraints)
        from noisyquantumsimulator_tpu.optimize.engine import (
            make_spacing_population_objective)
        import numpy as np
        app = ApparatusConstraints()
        obj = make_spacing_population_objective(
            app, app.make_full_noise(), "smooth_jp")
        p1 = obj.problem_for(2.4)
        p2 = obj.problem_for(3.2)
        assert not np.allclose(p1.L0_bare, p2.L0_bare)
        pop = np.array([[10.09, 0.977, 1.242, 4.696, 0.0205, 2.4],
                        [10.09, 0.977, 1.242, 4.696, 0.0205, 3.2]],
                       dtype=np.float32)
        costs, metrics = obj(pop)
        assert np.asarray(costs).shape == (2,)
        assert float(np.asarray(costs)[0]) != float(np.asarray(costs)[1])


class TestRealUniformCore:
    """The uniform fast core now runs in the real Hermitian basis
    (engine._evaluate_uniform_real); it must agree with the general
    per-segment complex path on the SAME schedule."""

    @pytest.mark.parametrize("protocol,params", [
        ("lp", [0.377371, 4.29268]),
        ("smooth_jp", [10.09, 0.311 * np.pi, 1.242, 4.696, 0.0205]),
    ])
    def test_real_core_matches_general(self, protocol, params):
        from dataclasses import replace
        app = ApparatusConstraints()
        prob = build_fixed_problem(app, app.make_full_noise(),
                                   include_noise=True)
        assert prob.g is not None and prob.R_L0 is not None
        kw = {"n_steps": 96} if protocol == "smooth_jp" else {}
        fast = make_objective(prob, protocol, **kw)
        # force the general per-segment path by dropping the generator
        slow = make_objective(replace(prob, g=None), protocol, **kw)
        cf, mf = fast(np.asarray(params))
        cs, ms = slow(np.asarray(params))
        assert float(mf["avg_fidelity"]) == pytest.approx(
            float(ms["avg_fidelity"]), abs=5e-6)
        assert float(cf) == pytest.approx(float(cs), rel=2e-3, abs=1e-2)
        assert float(mf["controlled_phase_deg"]) == pytest.approx(
            float(ms["controlled_phase_deg"]), abs=0.01)
