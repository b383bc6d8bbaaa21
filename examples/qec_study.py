"""Surface-code memory study: threshold scan, Lambda, teraquop footprint.

The Layer-2 equivalent of the reference's research sweep drivers
(reference: architecture/qec/surface_code.py:20-24 names logical error
rate per round, threshold, and teraquop footprint as the code metrics):
one command produces the logical-error-rate table, the error-suppression
factor Lambda, and the teraquop projection.

Round-3 update: distances extend to d = 13 with TRUE-MWPM decoding at
every d (the native exact cluster decoder — the same matching the
on-device cluster decoder reproduces, cluster_matcher.py), so Lambda is
decoder-limited nowhere and the teraquop extrapolation is meaningful.
The d=13, p=5e-4/1e-3 cells sit at/below the 3.1M-shot budget's
resolution (~0-2 expected errors); zero-error cells are excluded from
Lambda means and the shots column records the budget either way.
Sampling runs in 2^18-shot device blocks (bit-packed fetches); per-d
shot budgets grow so sub-threshold p_L keeps >= ~10 expected errors.

Run: python examples/qec_study.py [cpu] [--quick]
Writes examples/qec_study.json (+ PNG when matplotlib is available).
"""
import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

BLOCK = 1 << 18


def measure_p_l(d: int, p: float, shots: int, seed: int = 1):
    """(p_logical_round, p_logical_shot, shots_done): sample on device in
    blocks, decode on host with the native exact cluster decoder."""
    import jax
    import jax.numpy as jnp
    from noisyquantumsimulator_tpu.qec.surface_code import (
        logical_error_rate, memory_z_circuit)
    from noisyquantumsimulator_tpu.qec.fast_sampler import build_fast_sampler
    from noisyquantumsimulator_tpu.qec.dem import build_dem, dem_to_edges
    from noisyquantumsimulator_tpu.qec.native import NativeMatchingDecoder

    rounds = d
    circuit = memory_z_circuit(d, rounds, p=p)
    n_det = circuit.n_detectors
    edges, probs, obs = dem_to_edges(build_dem(circuit))
    nat = NativeMatchingDecoder(n_det, edges, probs, obs)
    block = min(shots, BLOCK)
    sampler = build_fast_sampler(circuit, block)
    bitw = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.int32)

    @jax.jit
    def sample_packed(key):
        o = sampler(key)
        x = o["detectors"].astype(jnp.int32)
        pad = (-n_det) % 8
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad)))
        packed = jnp.sum(x.reshape(block, -1, 8) * bitw[None, None, :],
                         axis=2).astype(jnp.uint8)
        return packed, o["observables"][:, 0]

    errors = 0
    n_blocks = max(1, -(-shots // block))
    for b in range(n_blocks):
        packed, ob = sample_packed(jax.random.PRNGKey(seed * 7919 + b))
        dets = np.unpackbits(np.asarray(packed), axis=1,
                             bitorder="little")[:, :n_det].astype(np.uint8)
        pred = nat.decode_batch_ex(dets, mode=0)["pred"] & 1
        errors += int(np.sum(pred != (np.asarray(ob) & 1)))
    shots_done = block * n_blocks
    rates = logical_error_rate(errors, shots_done, rounds)
    return rates["p_logical_round"], rates["p_logical_shot"], shots_done


def shot_budget(d: int, p: float, quick: bool) -> int:
    if quick:
        return 20000
    if d <= 7:
        return 200000
    # sub-threshold p_L shrinks ~5x per distance step: grow the budget so
    # the estimate keeps >= ~10 expected errors (d=11, p=1e-3 true-MWPM
    # p_L/shot is ~1e-5-class)
    if p <= 1.1e-3:
        return (1 << 20) if d == 9 else (3 << 20)
    if d >= 13 and p > 2.2e-3:
        # above/near threshold p_L is large (>= 1e-2-class): 2^19 shots
        # already give >= ~5k errors, and the host-exact decode of dense
        # d=13 syndromes is the cost driver (rc=124 in the first run)
        return 1 << 19
    return 1 << 19 if d <= 11 else 1 << 20


def main():
    import jax
    if "cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    quick = "--quick" in sys.argv
    ds = (3, 5) if quick else (3, 5, 7, 9, 11, 13)
    if "--ds" in sys.argv:
        # measure a subset of distances and MERGE into the existing JSON
        # (Lambda/teraquop are recomputed from the merged table) — lets
        # the expensive d>=13 host-exact cells extend a published study
        # without re-burning the d<=11 budget
        ds = tuple(int(x) for x in
                   sys.argv[sys.argv.index("--ds") + 1].split(","))
        if quick:
            # merging 20k-shot --quick cells into a full-budget artifact
            # would mix incompatible statistics unmarked
            raise SystemExit("--ds cannot be combined with --quick: it "
                             "merges reduced-budget cells into the "
                             "full-budget artifact")
    ps = (1e-3, 2e-3, 4e-3) if quick else (5e-4, 1e-3, 2e-3, 4e-3, 8e-3)

    from noisyquantumsimulator_tpu.qec.surface_code import teraquop_footprint

    table = {}
    shots_used = {}
    path = os.path.join(HERE, "qec_study.json")
    if "--ds" in sys.argv and os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
        for key, v in prev.get("table", {}).items():
            dd, pp = key[1:].split("_p")
            table[(int(dd), float(pp))] = v
            shots_used[(int(dd), float(pp))] = prev.get("shots", {}).get(
                key, 0)
    def recompute_and_write():
        """Lambda/teraquop from the current (merged) table + JSON write.
        Called after EVERY cell: a timeout mid-run (first d=13 attempt
        died at rc=124 with zero cells persisted) keeps every finished
        measurement."""
        # Lambda at each p: suppression per distance step of 2. Steps
        # whose larger-d cell measured ZERO errors are excluded from the
        # mean (shot-budget artifact, not a suppression factor). Lambda
        # spans the UNION of p columns in the merged table — a --ds
        # extension run must not drop the previous artifact's p columns.
        lambdas = {}
        lambda_steps = {}
        all_ds = sorted({d for d, _ in table})
        all_ps = sorted({p for _, p in table})
        for p in all_ps:
            col = [d for d in all_ds if (d, p) in table]
            ratios = [table[(col[i], p)]
                      / max(table[(col[i + 1], p)], 1e-12)
                      for i in range(len(col) - 1)]
            ok = [r for i, r in enumerate(ratios)
                  if table[(col[i + 1], p)] > 0]
            lambdas[p] = float(np.mean(ok)) if ok else float("nan")
            lambda_steps[p] = ratios

        p_op = 1e-3
        nonzero = [d for d, pp in table if pp == p_op
                   and table[(d, pp)] > 0]
        if nonzero:
            d_max = max(nonzero)
            tq = teraquop_footprint(table[(d_max, p_op)], d_max)
        else:
            d_max, tq = None, None

        out = {
            "table": {f"d{d}_p{p}": v for (d, p), v in table.items()},
            "shots": {f"d{d}_p{p}": v
                      for (d, p), v in shots_used.items()},
            "lambda": {str(p): v for p, v in lambdas.items()},
            "lambda_per_step": {str(p): v
                                for p, v in lambda_steps.items()},
            "teraquop_d": tq,
            "teraquop_anchored_at_d": d_max,
            "decoder": "native exact cluster decomposition (true MWPM; "
                       "uf_decoder.cpp mode=0)",
        }
        from noisyquantumsimulator_tpu.utils.observability import \
            provenance_stamp
        out.update(provenance_stamp())
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        return lambdas, lambda_steps, tq, d_max

    for d in ds:
        for p in ps:
            shots = shot_budget(d, p, quick)
            plr, pls, sd = measure_p_l(d, p, shots)
            table[(d, p)] = plr
            shots_used[(d, p)] = sd
            print(f"d={d} p={p:.0e}: p_L/round={plr:.3e} "
                  f"p_L/shot={pls:.3e} ({sd} shots, native exact cluster "
                  "decode)", flush=True)
            recompute_and_write()

    lambdas, lambda_steps, tq, d_max = recompute_and_write()
    for p in sorted(lambdas):
        print(f"p={p:.0e}: Lambda = {lambdas[p]:.2f} "
              f"(per-step: {[f'{r:.1f}' for r in lambda_steps[p]]})")
    if tq is not None:
        print(f"teraquop distance estimate at p=1e-03: d = {tq} "
              f"(anchored at measured d={d_max})")
    else:
        print("teraquop estimate skipped: no nonzero p_L cell at p=1e-03")
    print(f"wrote {path}")

    try:
        from noisyquantumsimulator_tpu.utils.visualization import (
            plot_logical_error_scaling)
        png = os.path.join(HERE, "qec_study.png")
        plot_logical_error_scaling(table, png)
        print(f"wrote {png}")
    except Exception as e:
        print(f"(no plot: {e})")


if __name__ == "__main__":
    main()
