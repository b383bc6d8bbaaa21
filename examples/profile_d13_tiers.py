"""Per-tier cost profile of the d=13 exact cluster decoder (VERDICT r4
#3: the K=14/16 gather-DP tiers regressed d=13 e2e 55k -> 28.7k shots/s;
this measures WHERE the time goes so default_tiers can be sized from
evidence, and whether the device or the single-core host binds).

For each tier configuration at d=13, rounds=13, p=1e-3:
  - device decode shots/s (32k shots, 4096-chunks, async-dispatched),
  - escalation fraction (shots the config cannot certify-exactly decode),
  - implied e2e ceiling given the measured host escalation rate.

Also times the native C++ whole-shot re-decode on REAL flagged shots
(the host side of the escalation pipeline, one core on this box).

Writes examples/profile_d13_tiers.json. TPU-discipline: run ONE tunneled
job at a time.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))


def main():
    import jax
    import jax.numpy as jnp
    from noisyquantumsimulator_tpu.qec.surface_code import memory_z_circuit
    from noisyquantumsimulator_tpu.qec.fast_sampler import build_fast_sampler
    from noisyquantumsimulator_tpu.qec.dem import build_dem, dem_to_edges
    from noisyquantumsimulator_tpu.qec.cluster_matcher import (
        ClusterMatcherTPU, default_tiers)
    from noisyquantumsimulator_tpu.qec.native import NativeMatchingDecoder

    d, rounds, p = 13, 13, 1e-3
    shots = 32768
    chunk = 4096
    circuit = memory_z_circuit(d, rounds, p=p)
    edges, eprobs, eobs = dem_to_edges(build_dem(circuit))
    n_det = circuit.n_detectors
    print(f"d={d} n_det={n_det}", flush=True)

    sampler = build_fast_sampler(circuit, shots)
    out = sampler(jax.random.PRNGKey(7))
    dets = np.asarray(out["detectors"], dtype=np.uint8)

    r = max(1.0, n_det / 1176.0)
    base = ((3, 6, 6, 1.0 * r), (7, 8, 8, 0.25 * r),
            (9, 10, 10, 0.21 * r), (11, 12, 12, 0.19 * r))
    configs = {
        "K<=12 (round-3)": base,
        "K<=14": base + ((13, 14, 14, 0.16 * r),),
        "K<=16 (round-4 default)": default_tiers(n_det),
    }

    results = {}
    host_rate = None
    for name, tiers in configs.items():
        t0 = time.perf_counter()
        dec = ClusterMatcherTPU(n_det, edges, eprobs, eobs, chunk=chunk,
                                max_slots=24, tiers=tiers)
        # async-dispatch all chunks, then drain (the production shape)
        blocks = [jnp.asarray(dets[i:i + chunk])
                  for i in range(0, shots, chunk)]
        outs = [dec.decode_device_with_overflow(b) for b in blocks]
        jax.block_until_ready(outs)          # warm-up incl. compile
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            outs = [dec.decode_device_with_overflow(b) for b in blocks]
            jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / reps
        ovf = np.concatenate([np.asarray(o)[...] for _, o in outs])
        esc = float(ovf.mean())
        dev_rate = shots / dt
        results[name] = {
            "tiers": [list(t) for t in tiers],
            "device_shots_per_sec": round(dev_rate, 1),
            "escalated_fraction": esc,
            "compile_plus_first_s": round(t_compile, 1),
            "decode_s_per_32k": round(dt, 3),
        }
        print(f"{name}: device {dev_rate:,.0f} shots/s, "
              f"esc {esc:.3f} (compile+first {t_compile:.0f}s)", flush=True)

        if host_rate is None:
            # host whole-shot re-decode rate on the REAL flagged set of
            # the base config (the escalation workload)
            nat = NativeMatchingDecoder(n_det, edges, eprobs, eobs)
            flag = dets[np.nonzero(ovf)[0]]
            n_f = min(len(flag), 4096)
            t0 = time.perf_counter()
            nat.decode_batch_ex(flag[:n_f], mode=0)
            host_dt = time.perf_counter() - t0
            host_rate = n_f / host_dt
            print(f"host escalation: {host_rate:,.0f} flagged shots/s "
                  f"({n_f} shots)", flush=True)

    for name, res in results.items():
        # pipelined ceiling: device and host overlap, so e2e is bounded
        # by whichever stream is longer
        t_dev = 1.0 / res["device_shots_per_sec"]
        t_host = res["escalated_fraction"] / host_rate
        res["host_flagged_shots_per_sec"] = round(host_rate, 1)
        res["e2e_ceiling_shots_per_sec"] = round(1.0 / max(t_dev, t_host), 1)
        res["bound_by"] = "device" if t_dev > t_host else "host"
        print(f"{name}: e2e ceiling {res['e2e_ceiling_shots_per_sec']:,.0f} "
              f"({res['bound_by']}-bound)", flush=True)

    from noisyquantumsimulator_tpu.utils.observability import provenance_stamp
    payload = {"d": d, "rounds": rounds, "p": p, "shots": shots,
               "chunk": chunk, "configs": results}
    payload.update(provenance_stamp())
    path = os.path.join(HERE, "profile_d13_tiers.json")
    with open(path, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
