"""Component cost profile of the gross-code BB e2e bench (VERDICT r4 #6:
136,338 shots/s driver-captured vs the 150k target — find the 14%).

Times, on the real chip at the bench shape (shots=65536, rounds=3,
p=1e-3): the sampler alone, the fast bf16 8-iter BP tier alone, the
syndrome/observable scoring, the damped retry tier, and the full jitted
e2e. Also re-times the score matmul in int8 (MXU s8xs8->s32) vs the
current int32 dot. Writes examples/profile_bb.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))
# share bench.py's persistent compile cache (tunnel compiles are minutes)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(HERE), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")


def timeit(fn, *args, reps=5):
    # host-fetch fence: block_until_ready lies on the axon tunnel (see
    # bench.py gate workload) — a scalar fetch fences the in-order queue
    import jax
    import jax.numpy as jnp
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))          # warm-up fence
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp
    from noisyquantumsimulator_tpu.qec.dem_decoder import DemBPDecoder
    from noisyquantumsimulator_tpu.qec.fast_sampler import build_fast_sampler
    from noisyquantumsimulator_tpu.qec.ldpc import (bb_memory_circuit,
                                                    gross_code)

    shots, rounds, p = 65536, 3, 1e-3
    Hx, Hz = gross_code()
    circuit = bb_memory_circuit(Hx, Hz, rounds, p)
    sampler = build_fast_sampler(circuit, shots)
    dec = DemBPDecoder(circuit, n_iters=60, kernel="slots",
                       fast_iters=8, fast_dtype=jnp.bfloat16,
                       retry_damping=0.5, retry_iters=90)
    res = {"shots": shots, "rounds": rounds, "p": p,
           "n_det": circuit.n_detectors, "n_mech": dec.n_mech}

    o = sampler(jax.random.PRNGKey(0))
    dets_f = o["detectors"].astype(jnp.float32)
    dets_f = jax.device_put(dets_f)

    res["t_sampler_s"] = timeit(sampler, jax.random.PRNGKey(1))
    res["t_full_tiered_s"] = timeit(dec._full, dets_f)

    # fast tier alone (what _full runs on every shot), via _bp_slots
    from functools import partial
    from noisyquantumsimulator_tpu.qec.ldpc import (_bp_slots,
                                                    build_slot_tables)
    chk_idx, var_idx = np.nonzero(dec.H)
    tables = build_slot_tables(chk_idx.astype(np.int64),
                               var_idx.astype(np.int64),
                               dec.n_det, dec.n_mech)
    llr = jnp.asarray(np.log((1 - dec.probs) / dec.probs).astype(np.float32))
    for name, dt, pall in (("bf16_pallas", jnp.bfloat16, True),
                           ("bf16_xla", jnp.bfloat16, False),
                           ("f32_pallas", jnp.float32, True)):
        fn = jax.jit(partial(_bp_slots, llr_var=llr, tables=tables,
                             n_chk=dec.n_det, n_var=dec.n_mech,
                             n_iters=8, scale=0.75, dtype=dt,
                             pallas_c2v=pall, onehot_varsum=pall))
        res[f"t_fastbp8_{name}_s"] = timeit(fn, dets_f)

    # score matmul: int32 (current) vs int8 MXU form
    est = (jax.random.uniform(jax.random.PRNGKey(2),
                              (shots, dec.n_mech)) < 0.01)
    Ht32 = jnp.asarray(dec.H.T.astype(np.int32))
    Ht8 = jnp.asarray(dec.H.T.astype(np.int8))

    @jax.jit
    def score32(est):
        e = est.astype(jnp.int32)
        return jax.lax.dot_general(e, Ht32, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32) & 1

    @jax.jit
    def score8(est):
        e = est.astype(jnp.int8)
        return jax.lax.dot_general(e, Ht8, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32) & 1

    res["t_score_int32_s"] = timeit(score32, est)
    res["t_score_int8_s"] = timeit(score8, est)
    assert np.array_equal(np.asarray(score32(est)), np.asarray(score8(est)))

    # retry tier alone at its production capacity
    cap = max(shots // 32, 64)
    dets_cap = dets_f[:cap]
    fn_retry = jax.jit(partial(_bp_slots, llr_var=llr, tables=tables,
                               n_chk=dec.n_det, n_var=dec.n_mech,
                               n_iters=90, scale=0.75, dtype=jnp.float32,
                               damping=0.5, pallas_c2v=True,
                               onehot_varsum=True))
    res["t_retry90_cap_s"] = timeit(fn_retry, dets_cap)

    for k, v in res.items():
        if isinstance(v, float):
            print(f"{k:>28s}: {v*1e3:8.2f} ms")
        else:
            print(f"{k:>28s}: {v}")
    imp = shots / res["t_full_tiered_s"]
    print(f"implied decode-only shots/s: {imp:,.0f}")
    res["implied_decode_only_shots_per_sec"] = round(imp, 1)

    from noisyquantumsimulator_tpu.utils.observability import provenance_stamp
    res.update(provenance_stamp())
    with open(os.path.join(HERE, "profile_bb.json"), "w") as f:
        json.dump(res, f, indent=1)
    print("wrote examples/profile_bb.json", flush=True)


if __name__ == "__main__":
    main()
