"""Ablation timing of the sliding-window decoder at d >= 9 on one chip.

Round-2 measured d=9/11 e2e decode collapsing 13-17x below d=7 (56k/43k
vs 711k shots/s) and attributed it to the per-window heavy K=12 trace.
This script isolates decoder-only throughput for a grid of configs on
identical pre-sampled detector data so the levers (light-tier K, heavy
capacity, chunk size, greedy tier, window geometry) can be ranked by
measurement instead of theory.

Each config runs in its OWN subprocess: the tunneled TPU worker crashes
on some multi-window jits and the crash wedges the whole jax client, so
in-process sweeps lose every subsequent config (measured 9/9 lost).

Usage: python examples/window_profile.py [--d 11] [--shots 65536] [--tpu]
       (the measurements of record are taken on the v5e via the axon
       tunnel — run ONE tunneled job at a time)

Prints one row per config; no JSON artifact (this is a tuning tool).
"""
from __future__ import annotations

import os
import subprocess
import sys
import time

# Focused grid on the accuracy-validated W7C3 geometry. The binding
# constraint found at d >= 9 is the HEAVY-TIER CAPACITY: per-window
# P(defects > 6) is 12-14% at d=9 (clustered tail, ~2x Poisson), so a
# cap of chunk/16 = 6.25% starves half the heavy rows, flagging 13% of
# shots for host escalation. The levers here are the light-tier budget
# (k_light: raising it shrinks the heavy population ~3x per +2) vs the
# capacity (raising it serves more heavy rows at 2^K DP cost).
CONFIGS = [
    ("W7C3 K6/K12 cap=256 c=4096 (r3 default)",
     dict(chunk=4096, k_light=6, heavy_capacity=256,
          window_rounds=7, commit_rounds=3)),
    ("W7C3 K6/K12 cap=1024 c=4096",
     dict(chunk=4096, k_light=6, heavy_capacity=1024,
          window_rounds=7, commit_rounds=3)),
    ("W7C3 K8/K12 cap=256 c=4096",
     dict(chunk=4096, k_light=8, heavy_capacity=256,
          window_rounds=7, commit_rounds=3)),
    ("W7C3 K8/K12 cap=512 c=4096",
     dict(chunk=4096, k_light=8, heavy_capacity=512,
          window_rounds=7, commit_rounds=3)),
    ("W7C3 K8/K12 cap=1024 c=8192",
     dict(chunk=8192, k_light=8, heavy_capacity=1024,
          window_rounds=7, commit_rounds=3)),
    ("W7C3 K12-all cap=n/a c=4096",
     dict(chunk=4096, k_light=0, window_rounds=7, commit_rounds=3)),
    # d=11 candidates: per-window P(>8) is 11-20% there, so the K12 tier
    # either needs more capacity or a cheaper K=10 budget; blossom-fast
    # host escalation (90k shots/s) makes moderate flag rates affordable
    ("W7C3 K8/K10 cap=768 c=4096",
     dict(chunk=4096, k_light=8, heavy_capacity=768, max_defects=10,
          window_rounds=7, commit_rounds=3)),
    ("W7C3 K6/K10 cap=768 c=4096",
     dict(chunk=4096, k_light=6, heavy_capacity=768, max_defects=10,
          window_rounds=7, commit_rounds=3)),
    ("W6C2 K8/K12 cap=512 c=4096",
     dict(chunk=4096, k_light=8, heavy_capacity=512,
          window_rounds=6, commit_rounds=2)),
    # capacity-headroom variants: d=11 flag at cap=512-768 still tracks
    # capacity (29% -> 19% from 256 -> 512), so push cap until the flag
    # floor (true >K-defect window clusters) is exposed
    ("W7C3 K8/K12 cap=768 c=4096",
     dict(chunk=4096, k_light=8, heavy_capacity=768,
          window_rounds=7, commit_rounds=3)),
    ("W7C3 K8/K10 cap=1024 c=4096",
     dict(chunk=4096, k_light=8, heavy_capacity=1024, max_defects=10,
          window_rounds=7, commit_rounds=3)),
    ("W7C3 K8/K12 cap=1024 c=4096",
     dict(chunk=4096, k_light=8, heavy_capacity=1024,
          window_rounds=7, commit_rounds=3)),
]


def _flag(args, name, default, cast=int):
    return cast(args[args.index(name) + 1]) if name in args else default


def run_one(idx: int, d: int, rounds: int, p: float, shots: int) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from noisyquantumsimulator_tpu.qec.surface_code import (
        memory_z_circuit, memory_z_detector_rounds)
    from noisyquantumsimulator_tpu.qec.fast_sampler import build_fast_sampler
    from noisyquantumsimulator_tpu.qec.dem import build_dem, dem_to_edges
    from noisyquantumsimulator_tpu.qec.window_matcher import WindowMatcherTPU

    label, kw = CONFIGS[idx]
    kw = dict(kw)
    circuit = memory_z_circuit(d, rounds, p=p)
    det_round = memory_z_detector_rounds(d, rounds)
    edges, probs, obs = dem_to_edges(build_dem(circuit))
    sampler = build_fast_sampler(circuit, shots)
    out = sampler(jax.random.PRNGKey(1))
    dets = jnp.asarray(np.asarray(out["detectors"], np.uint8))

    chunk = min(kw.pop("chunk"), shots)
    t_build = time.perf_counter()
    wm = WindowMatcherTPU(circuit.n_detectors, edges, probs, obs,
                          det_round, chunk=chunk, **kw)
    def one(b):
        par, ovf = wm._fn(b)
        return par, jnp.sum(ovf.astype(jnp.int32))

    fn = jax.jit(lambda blocks: jax.lax.map(one, blocks))
    blocks = dets.reshape(shots // chunk, chunk, -1)
    r, novf = fn(blocks)
    float(jnp.sum(r))  # compile+warm fence
    t_compile = time.perf_counter() - t_build
    flag_frac = float(jnp.sum(novf)) / shots
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        r, _ = fn(blocks)
    float(jnp.sum(r))
    dt = time.perf_counter() - t0
    print(f"{label:45s} {shots * reps / dt:>10.0f} shots/s "
          f"flag {flag_frac:.2e} "
          f"(windows={wm.n_windows}, compile {t_compile:.0f}s)",
          flush=True)


def main() -> None:
    args = sys.argv[1:]
    d = _flag(args, "--d", 11)
    rounds = _flag(args, "--rounds", d)
    p = _flag(args, "--p", 1e-3, float)
    shots = _flag(args, "--shots", 1 << 16)

    if "--one" in args:
        run_one(_flag(args, "--one", 0), d, rounds, p, shots)
        return

    idxs = range(len(CONFIGS) if "--quick" not in args else 4)
    if "--configs" in args:
        idxs = [int(x) for x in
                args[args.index("--configs") + 1].split(",")]
    print(f"d={d} rounds={rounds} shots={shots} (per-config subprocesses)",
          flush=True)
    for i in idxs:
        cmd = [sys.executable, os.path.abspath(__file__), "--one", str(i),
               "--d", str(d), "--rounds", str(rounds), "--p", str(p),
               "--shots", str(shots)]
        if "--tpu" in args:
            cmd.append("--tpu")
        try:
            r = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=2400)
            body = [ln for ln in r.stdout.splitlines() if "shots/s" in ln
                    and "FAILED" not in ln]
            if body:
                print(body[-1], flush=True)
            else:
                tail = (r.stderr or r.stdout).strip().splitlines()
                print(f"{CONFIGS[i][0]:55s} FAILED: "
                      f"{tail[-1][:120] if tail else 'no output'}",
                      flush=True)
        except subprocess.TimeoutExpired:
            print(f"{CONFIGS[i][0]:55s} FAILED: timeout", flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    if "--tpu" not in sys.argv:
        import jax
        jax.config.update("jax_platforms", "cpu")
    main()
