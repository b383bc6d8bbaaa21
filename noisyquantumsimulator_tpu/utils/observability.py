"""Structured metrics, timers, and profiler hooks.

The reference has only ad-hoc verbose prints and wall-clock fields
(SURVEY.md 5: simulation.py:2994, optimize_cz_gate.py:1059). This module
provides the structured replacement: hierarchical timers, a metrics
registry with JSONL export, and jax.profiler integration for TPU traces.
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import jax


@dataclass
class MetricsRegistry:
    """Counter/gauge/timer store with JSONL export."""
    counters: Dict[str, float] = field(default_factory=lambda: defaultdict(float))
    gauges: Dict[str, float] = field(default_factory=dict)
    timings: Dict[str, List[float]] = field(default_factory=lambda: defaultdict(list))
    events: List[Dict] = field(default_factory=list)

    def incr(self, name: str, value: float = 1.0):
        self.counters[name] += value

    def gauge(self, name: str, value: float):
        self.gauges[name] = float(value)

    def record(self, name: str, seconds: float):
        self.timings[name].append(float(seconds))

    def event(self, name: str, **fields):
        self.events.append({"event": name, "t": time.time(), **fields})

    @contextlib.contextmanager
    def timer(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.record(name, time.perf_counter() - t0)

    def summary(self) -> Dict[str, Any]:
        timing_stats = {
            k: {"n": len(v), "total_s": sum(v),
                "mean_s": sum(v) / len(v) if v else 0.0,
                "max_s": max(v) if v else 0.0}
            for k, v in self.timings.items()}
        return {"counters": dict(self.counters), "gauges": dict(self.gauges),
                "timings": timing_stats, "n_events": len(self.events)}

    def dump_jsonl(self, path: str):
        with open(path, "a") as f:
            f.write(json.dumps({"summary": self.summary(),
                                "t": time.time()}) + "\n")
            for e in self.events:
                f.write(json.dumps(e) + "\n")

    def reset(self):
        self.counters.clear()
        self.gauges.clear()
        self.timings.clear()
        self.events.clear()


# global default registry (opt-in; engine code does not auto-register)
metrics = MetricsRegistry()


@contextlib.contextmanager
def profile_trace(logdir: str = "/tmp/nqs_tpu_trace",
                  host_tracer_level: int = 2):
    """jax.profiler trace context: view with TensorBoard or Perfetto."""
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region visible in profiler traces (TraceAnnotation)."""
    with jax.profiler.TraceAnnotation(name):
        yield


def provenance_stamp() -> Dict[str, str]:
    """`{generated_at_commit, engine, backend}` for study/bench JSON
    artifacts, so a stale artifact is detectable by commit instead of
    silently contradicting newer records (the round-3 drift failure
    mode: examples/ numbers disagreeing with BENCH_CANON.json)."""
    import subprocess
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    try:
        commit = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
            cwd=repo).stdout.strip() or "unknown"
    except Exception:
        commit = "unknown"
    try:
        backend = jax.devices()[0].platform
    except Exception:
        backend = "unknown"
    return {"generated_at_commit": commit, "backend": backend,
            "generated_at": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                          time.gmtime())}


def device_memory_stats() -> Dict[str, Any]:
    """Per-device memory stats where the backend exposes them."""
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out


def log_compile_time(fn, *args, registry: Optional[MetricsRegistry] = None,
                     name: str = "compile", **kwargs):
    """Measure AOT lowering+compile time of a jitted function."""
    reg = registry or metrics
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    reg.record(f"{name}.compile_s", time.perf_counter() - t0)
    try:
        reg.gauge(f"{name}.flops",
                  compiled.cost_analysis()["flops"])
    except Exception:
        pass
    return compiled


__all__ = ["MetricsRegistry", "metrics", "profile_trace", "annotate",
           "device_memory_stats", "log_compile_time", "provenance_stamp"]
