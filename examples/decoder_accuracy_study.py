"""Decoder accuracy study: window decoding vs true MWPM at d = 7, 9, 11.

Round-2 measured the sliding-window decoder's logical suppression BREAKING
above d = 7 (p_L rising 1.47e-4 -> 1.60e-4 -> 3.89e-4 for d = 7/9/11 at
p = 1e-3): the greedy tier serving >12-defect windows is suboptimal enough
to dominate p_L. This study quantifies the fix:

  oracle     — native C++ exact cluster decomposition of the WHOLE shot
               (uf_decoder.cpp decode_shot: per-component exact DP; the
               `exact` flag certifies every component was within budget).
               This is true MWPM up to ties for certified shots.
  window     — the device sliding-window tiered matcher (no greedy tier):
               over-budget windows defer their excess defects and raise
               the per-shot `ovf` flag.
  escalated  — window predictions with ovf-flagged shots re-decoded by
               the oracle (the production EscalatingWindowMatcher path:
               flagged fraction is small, so the host re-decode is cheap).

Also reports the d = 7 overflow split VERDICT asked for: p_L measured
separately on overflow vs non-overflow shots of the TIERED (non-window)
decoder.

Writes examples/decoder_accuracy.json. Backend-agnostic: the numbers are
statistical (p_L), not throughput, so CPU blocks are fine; run with
--shots to size the statistics (p_L ~ 1e-5 at d = 11 needs >= 1e6).

Reference: PyMatching's role, architecture/qec/decoders.py:6-17.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def run_point(d: int, rounds: int, p: float, shots: int, block: int,
              seed0: int = 0, wcs=((5, 2),)):
    import jax
    import jax.numpy as jnp
    from noisyquantumsimulator_tpu.qec.surface_code import (
        memory_z_circuit, memory_z_detector_rounds)
    from noisyquantumsimulator_tpu.qec.fast_sampler import build_fast_sampler
    from noisyquantumsimulator_tpu.qec.dem import build_dem, dem_to_edges
    from noisyquantumsimulator_tpu.qec.native import NativeMatchingDecoder

    circuit = memory_z_circuit(d, rounds, p=p)
    edges, probs, obs = dem_to_edges(build_dem(circuit))
    nat = NativeMatchingDecoder(circuit.n_detectors, edges, probs, obs)

    chunk = min(4096, block)
    from noisyquantumsimulator_tpu.qec.window_matcher import (
        WindowMatcherTPU)
    det_round = memory_z_detector_rounds(d, rounds)
    wms = {}
    for (W, C) in wcs:
        wms[(W, C)] = WindowMatcherTPU(
            circuit.n_detectors, edges, probs, obs, det_round,
            window_rounds=W, commit_rounds=C, max_defects=12,
            chunk=chunk, k_light=6,
            heavy_capacity=max(chunk // 16, 64))

    sampler = build_fast_sampler(circuit, block)

    # fetch detectors BIT-PACKED: the raw (block, n_det) uint8 fetch is
    # ~50 MB/block over the axon tunnel and has crashed the TPU worker;
    # packing on device cuts the transfer 8x
    n_det = circuit.n_detectors
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

    def sample_block(key):
        packed, ob = sample_packed(key)
        dets = np.unpackbits(np.asarray(packed), axis=1,
                             bitorder="little")[:, :n_det].astype(np.uint8)
        return dets, np.asarray(ob)

    acc = dict(shots=0, err_oracle=0, n_cert=0, sum_ndef=0.0, t_oracle=0.0)
    wacc = {wc: dict(err_window=0, err_escalated=0, n_flagged=0,
                     err_window_flagged=0, err_window_unflagged=0,
                     err_oracle_flagged=0, t_window=0.0) for wc in wcs}
    cluster_hist = np.zeros(64, np.int64)
    ndef_hist = np.zeros(128, np.int64)

    n_blocks = (shots + block - 1) // block
    for b in range(n_blocks):
        dets, ob = sample_block(jax.random.PRNGKey(seed0 + 1000 + b))
        obs_bits = ob & 1

        t0 = time.perf_counter()
        ro = nat.decode_batch_ex(dets, mode=0)
        acc["t_oracle"] += time.perf_counter() - t0
        pred_o = ro["pred"] & 1
        acc["err_oracle"] += int(np.sum(pred_o != obs_bits))
        acc["n_cert"] += int(ro["exact"].sum())
        acc["sum_ndef"] += float(ro["n_defects"].sum())
        mc = np.clip(ro["max_cluster"], 0, 63)
        cluster_hist += np.bincount(mc, minlength=64)
        ndef_hist += np.bincount(np.clip(ro["n_defects"], 0, 127),
                                 minlength=128)

        for wc, wm in wms.items():
            a = wacc[wc]
            t0 = time.perf_counter()
            preds = []
            ovfs = []
            for s0 in range(0, block, chunk):
                pw, ov = wm.decode_device_with_overflow(
                    jnp.asarray(dets[s0:s0 + chunk]))
                preds.append(np.asarray(pw))
                ovfs.append(np.asarray(ov))
            a["t_window"] += time.perf_counter() - t0
            pred_w = np.concatenate(preds) & 1
            ovf = np.concatenate(ovfs)
            a["err_window"] += int(np.sum(pred_w != obs_bits))
            a["n_flagged"] += int(ovf.sum())
            a["err_window_flagged"] += int(np.sum(
                (pred_w != obs_bits) & ovf))
            a["err_window_unflagged"] += int(np.sum(
                (pred_w != obs_bits) & ~ovf))
            a["err_oracle_flagged"] += int(np.sum(
                (pred_o != obs_bits) & ovf))
            pred_e = np.where(ovf, pred_o, pred_w)
            a["err_escalated"] += int(np.sum(pred_e != obs_bits))
            # wider escalation nets: ALSO hand whole-shot-heavy shots
            # (> T total defects) to the oracle, post-hoc
            for T in (20, 16, 12, 8):
                esc = ovf | (ro["n_defects"] > T)
                a.setdefault(f"err_esc_T{T}", 0)
                a.setdefault(f"n_esc_T{T}", 0)
                a[f"err_esc_T{T}"] += int(np.sum(
                    np.where(esc, pred_o, pred_w) != obs_bits))
                a[f"n_esc_T{T}"] += int(esc.sum())
        acc["shots"] += block
        a0 = wacc[wcs[0]]
        print(f"  d={d} block {b + 1}/{n_blocks}: oracle p_L "
              f"{acc['err_oracle'] / acc['shots']:.3e}, "
              f"W{wcs[0][0]}C{wcs[0][1]} window "
              f"{a0['err_window'] / acc['shots']:.3e}, escalated "
              f"{a0['err_escalated'] / acc['shots']:.3e}, flagged "
              f"{a0['n_flagged'] / acc['shots']:.3e}", flush=True)

    S = acc["shots"]
    row = {
        "d": d, "rounds": rounds, "p": p, "shots": S,
        "n_detectors": circuit.n_detectors,
        "mean_defects": acc["sum_ndef"] / S,
        "p_L_oracle": acc["err_oracle"] / S,
        "oracle_certified_fraction": acc["n_cert"] / S,
        "max_cluster_hist": {str(i): int(v)
                             for i, v in enumerate(cluster_hist) if v},
        "n_defects_p99": int(np.searchsorted(
            np.cumsum(ndef_hist), 0.99 * S)),
        "oracle_shots_per_sec_host": S / max(acc["t_oracle"], 1e-9),
        "windows": {},
    }
    for wc in wcs:
        a = wacc[wc]
        nf = max(a["n_flagged"], 1)
        row["windows"][f"W{wc[0]}C{wc[1]}"] = {
            "p_L_window": a["err_window"] / S,
            "p_L_escalated": a["err_escalated"] / S,
            "flagged_fraction": a["n_flagged"] / S,
            "p_L_window_given_flagged": a["err_window_flagged"] / nf,
            "p_L_oracle_given_flagged": a["err_oracle_flagged"] / nf,
            "p_L_window_unflagged_shots":
                a["err_window_unflagged"] / max(S - a["n_flagged"], 1),
            **{f"p_L_esc_T{T}": a[f"err_esc_T{T}"] / S
               for T in (20, 16, 12, 8) if f"err_esc_T{T}" in a},
            **{f"esc_frac_T{T}": a[f"n_esc_T{T}"] / S
               for T in (20, 16, 12, 8) if f"n_esc_T{T}" in a},
        }
    return row


def main() -> None:
    import jax
    args = sys.argv[1:]
    ds = (7, 9, 11)
    if "--ds" in args:
        ds = tuple(int(x) for x in args[args.index("--ds") + 1].split(","))
    shots = 1 << 20
    if "--shots" in args:
        shots = int(args[args.index("--shots") + 1])
    wcs = ((5, 2),)
    if "--wc" in args:
        wcs = tuple(tuple(int(v) for v in pair.split(","))
                    for pair in args[args.index("--wc") + 1].split(";"))
    block = min(shots, 1 << 17)
    p = 1e-3
    rows = []
    for d in ds:
        print(f"d={d} rounds={d} p={p} shots={shots} wcs={wcs}", flush=True)
        # the tunneled TPU worker crashes stochastically on fresh window
        # jits; a retry re-traces against the restarted worker
        for attempt in range(3):
            try:
                rows.append(run_point(d, d, p, shots, block, wcs=wcs))
                break
            except Exception as e:
                print(f"  attempt {attempt + 1} failed: "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)
                if attempt == 2:
                    raise
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "decoder_accuracy.json")
    prev = []
    if os.path.exists(out):
        with open(out) as f:
            prev = json.load(f).get("points", [])
    merged = {r["d"]: r for r in prev}
    merged.update({r["d"]: r for r in rows})
    from noisyquantumsimulator_tpu.utils.observability import \
        provenance_stamp
    with open(out, "w") as f:
        json.dump({"p": p, **provenance_stamp(),
                   "points": [merged[k] for k in sorted(merged)]}, f,
                  indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax
    if "--tpu" not in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    main()
