"""DEPRECATED JP-protocol optimizer shims.

Parity module for the reference's deprecated `optimize_jp_protocols.py`
(reference: optimize_jp_protocols.py:25-32 module-level deprecation
warning; kept entry points at :157, :279, :490, :561, :730). The
reference kept these because old scripts import them; they monkey-patched
protocol globals the simulator never read. Here each entry point is a
thin wrapper over the real optimizer (optimize/forward.py), so legacy
call sites keep working AND actually optimize.

Every function emits a DeprecationWarning pointing at the replacement.
"""
from __future__ import annotations

import warnings

import numpy as np

warnings.warn(
    "optimize.jp_legacy is deprecated; use optimize.forward.optimize_cz_gate"
    "(protocol=...) directly.", DeprecationWarning, stacklevel=2)


def _warn(name: str, repl: str):
    warnings.warn(f"{name} is deprecated; use {repl}",
                  DeprecationWarning, stacklevel=3)


def jp_bangbang_cost(params, apparatus=None, n_segments: int = 5) -> float:
    """(optimize_jp_protocols.py:157) Cost of a bang-bang parameter vector."""
    _warn("jp_bangbang_cost", "optimize.engine.make_objective")
    from .apparatus import ApparatusConstraints
    from .engine import build_fixed_problem, make_objective
    app = apparatus or ApparatusConstraints()
    problem = build_fixed_problem(app, app.make_full_noise())
    obj = make_objective(problem, "jandura_pupillo", n_segments=n_segments)
    cost, _ = obj(np.asarray(params, dtype=float))
    return float(cost)


def optimize_jp_bangbang(apparatus=None, n_segments: int = 5,
                         maxiter: int = 40, **kw):
    """(optimize_jp_protocols.py:279)"""
    _warn("optimize_jp_bangbang", "optimize.forward.optimize_cz_gate")
    from .forward import optimize_cz_gate
    return optimize_cz_gate("jandura_pupillo", apparatus=apparatus,
                            maxiter=maxiter, n_segments=n_segments, **kw)


def smooth_jp_cost(params, apparatus=None) -> float:
    """(optimize_jp_protocols.py:490)"""
    _warn("smooth_jp_cost", "optimize.engine.make_objective")
    from .apparatus import ApparatusConstraints
    from .engine import build_fixed_problem, make_objective
    app = apparatus or ApparatusConstraints()
    problem = build_fixed_problem(app, app.make_full_noise())
    obj = make_objective(problem, "smooth_jp")
    cost, _ = obj(np.asarray(params, dtype=float))
    return float(cost)


def optimize_smooth_jp(apparatus=None, maxiter: int = 40, **kw):
    """(optimize_jp_protocols.py:561)"""
    _warn("optimize_smooth_jp", "optimize.forward.optimize_cz_gate")
    from .forward import optimize_cz_gate
    return optimize_cz_gate("smooth_jp", apparatus=apparatus,
                            maxiter=maxiter, **kw)


def evaluate_lp_baseline(apparatus=None):
    """(optimize_jp_protocols.py:730)"""
    _warn("evaluate_lp_baseline", "optimize.forward.run_baseline")
    from .forward import run_baseline
    return run_baseline("lp", apparatus=apparatus)


__all__ = ["jp_bangbang_cost", "optimize_jp_bangbang", "smooth_jp_cost",
           "optimize_smooth_jp", "evaluate_lp_baseline"]
