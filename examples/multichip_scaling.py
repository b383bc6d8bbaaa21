"""Multi-chip scaling study: the same SPMD programs over 1/2/4/8 devices.

Runs the framework's two headline sharded workloads (SURVEY.md 2d /
BASELINE north-star #4) over meshes of increasing size and verifies the
weak-scaling contract — per-device work constant, only scalar `psum`
traffic crossing the mesh — plus statistical consistency of the reduced
results across mesh sizes:

  1. surface-code detector sampling MC (one-matmul sampler per device,
     psum'd detector/logical statistics),
  2. BB-LDPC sample + BP-decode + psum memory MC
     (`parallel.bb_mc.run_bb_memory_sharded`).

HONESTY NOTE on the timings: on a single host with a virtual
`--xla_force_host_platform_device_count` mesh, all "devices" share the
same CPU cores, so wall-clock does NOT improve with mesh size — the
numbers below validate the SPMD program structure (sharding, collectives,
invariance of the physics to the mesh), not real-chip speedup. On a real
v5e pod slice the identical code paths shard shots over ICI; per-device
throughput there is the single-chip number reported by `bench.py --qec`.

Usage: python examples/multichip_scaling.py   (self-provisions a virtual
8-device CPU mesh when needed, like __graft_entry__.dryrun_multichip).
"""
from __future__ import annotations

import json
import os
import sys
import time


def _ensure_devices(n: int) -> None:
    """Re-exec with a virtual n-device CPU platform if devices are short
    (must happen before jax backend init)."""
    if os.environ.get("_NQS_SCALING_CHILD"):
        return
    import jax

    if len(jax.devices()) >= n:
        return
    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = (
        f"{flags} --xla_force_host_platform_device_count={n}").strip()
    env["JAX_PLATFORMS"] = "cpu"
    env["_NQS_SCALING_CHILD"] = "1"
    os.execve(sys.executable, [sys.executable, os.path.abspath(__file__)],
              env)


def run_surface_mc(mesh, shots_per_dev: int = 8192, d: int = 5,
                   rounds: int = 5, p: float = 2e-3):
    """Sharded surface-code sampling MC: each device samples its own shot
    block, statistics are psum'd over the whole mesh."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    from noisyquantumsimulator_tpu.qec.fast_sampler import build_fast_sampler
    from noisyquantumsimulator_tpu.qec.surface_code import memory_z_circuit
    from noisyquantumsimulator_tpu.parallel.mesh import shard_map_compat

    n_dev = int(np.prod(mesh.devices.shape))
    circuit = memory_z_circuit(d, rounds, p=p)
    sampler = build_fast_sampler(circuit, shots_per_dev)
    axes = tuple(mesh.axis_names)

    def per_device(keys):
        out = sampler(keys[0])
        n_fire = jnp.sum(out["detectors"].astype(jnp.float32))
        n_obs = jnp.sum(out["observables"][:, 0].astype(jnp.float32))
        return (jax.lax.psum(n_fire, axes), jax.lax.psum(n_obs, axes))

    keys = jax.random.split(jax.random.PRNGKey(3), n_dev)
    keys = jax.device_put(np.asarray(keys), NamedSharding(mesh, P(axes)))
    fn = jax.jit(shard_map_compat(per_device, mesh, P(axes), (P(), P())))
    n_fire, n_obs = fn(keys)          # compile + warm
    n_fire.block_until_ready()
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        n_fire, n_obs = fn(keys)
        n_fire.block_until_ready()
    dt = time.perf_counter() - t0
    total = shots_per_dev * n_dev
    row = {
        "n_devices": n_dev,
        "shots_total": total,
        "detector_fraction": float(n_fire) / (total * circuit.n_detectors),
        "obs_rate": float(n_obs) / total,
        "shots_per_sec": total * reps / dt,
    }
    ncores = os.cpu_count() or 1
    if n_dev > ncores:
        # virtual devices beyond the physical core count time-slice the
        # same silicon; wall-clock collapses (e.g. 22.3k -> 1.8k shots/s
        # at 8 devices on a 1-core host). The statistics columns remain
        # valid; the throughput column does not measure scaling here.
        row["oversubscribed"] = True
        row["note"] = (f"{n_dev} virtual devices on {ncores} physical "
                       "core(s): host oversubscription, not a scaling "
                       "signal")
    return row


def main() -> None:
    _ensure_devices(8)
    import jax
    if os.environ.get("_NQS_SCALING_CHILD"):
        # the env alone is not enough on hosts whose profile pins a TPU
        # platform; force cpu before backend init (conftest.py recipe)
        jax.config.update("jax_platforms", "cpu")
    from noisyquantumsimulator_tpu.parallel.bb_mc import run_bb_memory_sharded
    from noisyquantumsimulator_tpu.parallel.mesh import make_mesh

    sizes = [n for n in (1, 2, 4, 8) if n <= len(jax.devices())]
    results = {"surface_mc": [], "bb_ldpc_mc": [],
               "platform": jax.devices()[0].platform,
               "note": ("virtual single-host mesh: timings validate SPMD "
                        "structure, not real-chip speedup — see module "
                        "docstring")}

    print(f"{'n_dev':>5} | {'surface shots/s':>15} {'det_frac':>9} | "
          f"{'bb shots':>8} {'p_L':>9} {'bp_conv':>8}")
    for n in sizes:
        mesh = make_mesh(n, axis_names=("shots",))
        s = run_surface_mc(mesh)
        t0 = time.perf_counter()
        b = run_bb_memory_sharded(p=5e-3, shots_per_device=2048, mesh=mesh,
                                  n_iters=30, seed=5)
        b["seconds"] = time.perf_counter() - t0
        if n > (os.cpu_count() or 1):
            b["oversubscribed"] = True
            b["note"] = (f"{n} virtual devices on {os.cpu_count() or 1} "
                         "physical core(s): wall-clock reflects host "
                         "oversubscription, not mesh scaling")
        results["surface_mc"].append(s)
        results["bb_ldpc_mc"].append(b)
        print(f"{n:>5} | {s['shots_per_sec']:>15.0f} "
              f"{s['detector_fraction']:>9.5f} | {b['shots']:>8d} "
              f"{b['p_logical_shot']:>9.5f} {b['bp_converged_frac']:>8.4f}")

    # statistical consistency across mesh sizes: the physics must not
    # depend on how shots are sharded
    dfs = [s["detector_fraction"] for s in results["surface_mc"]]
    assert max(dfs) - min(dfs) < 0.15 * max(dfs), \
        f"detector fraction varies with mesh size: {dfs}"
    pls = [b["p_logical_shot"] for b in results["bb_ldpc_mc"]]
    assert max(pls) < 0.5, f"unphysical BB p_L: {pls}"

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "multichip_scaling.json")
    from noisyquantumsimulator_tpu.utils.observability import \
        provenance_stamp
    results.update(provenance_stamp())
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()
