"""Sliding-window MWPM on device: exact decoding at any distance.

The bitmask-DP exact matcher (exact_matcher.py) is exponential in the
per-shot defect COUNT, which grows with d^2 * rounds — at d >= 9,
p = 1e-3 the mean count (4.8 at d=9, 8.6 at d=11) blows any fixed K
budget (a K=12-only run at d=11 measured p_L = 0.18 from 22% truncated
shots). Production decoders solve this by windowing in time (sliding /
parallel window decoding): error chains are short below threshold, so
matching decomposes over round windows with a small overlap buffer.

This module implements forward sliding-window decoding on top of the
DP's matching EXTRACTION (exact_matcher.match_device):

  window w covers rounds [w*C, w*C + W); its defects (plus defects
  carried from earlier windows) are matched EXACTLY by the K-budget DP;
  pairs lying entirely before the commit boundary (w+1)*C are committed
  to the running observable parity; pairs touching the buffer are
  deferred — the pre-boundary endpoint is carried into the next window,
  the buffer endpoint reappears there naturally. The final window
  commits everything.

Per window the defect count is O(W * d) * p — bounded in rounds, so one
K=12 DP per window decodes ANY distance. The whole multi-window loop is
one jitted call per chunk (windows unrolled; carry rides as a (S, n_det)
bitmask on device).

Accuracy: exact MWPM whenever no optimal matching edge spans more than
the W - C buffer rounds — the standard sliding-window guarantee; with
the defaults (W=5, C=2) the windowed decision agrees with the global DP
on every shot the tests compare. Windows that still exceed K defects
(clustering fattens the tail far beyond Poisson) DEFER the over-budget
defects to the next window instead of truncating them — in every window
but the last, overflow therefore degrades optimality without dropping
syndrome information; the FINAL window has no successor to defer into,
so its over-budget defects are lost there (the per-shot `ovf` flag and
overflow_fraction() record exactly these cases). Reference target:
PyMatching's role in architecture/qec/decoders.py:6-17.
"""
from __future__ import annotations

import time
import numpy as np
import jax
import jax.numpy as jnp

from .exact_matcher import ExactMatcherTPU, _chunked_decode


class WindowMatcherTPU:
    """Sliding-window exact matcher over round-labeled detectors.

    det_round: (n_detectors,) int array, the time label of each detector
    (memory circuits: detector_index // n_z, see
    surface_code.memory_z_detector_rounds). Boundary-time (final data
    measurement) detectors carry the last label.
    """

    def __init__(self, n_detectors: int, edges: np.ndarray, probs: np.ndarray,
                 obs: np.ndarray, det_round: np.ndarray,
                 window_rounds: int = 5, commit_rounds: int = 2,
                 max_defects: int = 12, chunk: int = 4096,
                 k_light: int = 0, heavy_capacity: int = 0,
                 greedy_fallback: int = 0, greedy_capacity: int = 0):
        """k_light > 0 enables per-window cost tiering: every (shot,
        window) is traced by a cheap K=k_light DP, and only shots whose
        window holds more than k_light defects are top_k-compacted (to
        `heavy_capacity` rows, default chunk/4) and re-traced by the full
        K=max_defects DP — same results wherever both budgets suffice,
        at a fraction of the cost (the K=12 trace dominates d >= 9 e2e
        time; most windows hold <= 6 defects).

        greedy_fallback > max_defects adds a third, budget-free tier:
        windows holding MORE than max_defects defects (where the exact DP
        would truncate and deferral alone costs ~4.5% logical error on
        those shots) are instead matched by the greedy kernel with its
        matching extracted (decoders._greedy_match_batch, up to
        `greedy_fallback` defects) — near-MWPM per window, and the
        commit/defer bookkeeping stays exact."""
        if not 1 <= commit_rounds < window_rounds:
            raise ValueError("need 1 <= commit_rounds < window_rounds "
                             "(the overlap buffer is their difference; "
                             "commit_rounds is the window stride)")
        det_round = np.asarray(det_round, np.int32)
        if det_round.shape != (n_detectors,):
            raise ValueError("det_round must label every detector")
        if k_light >= max_defects:
            raise ValueError("k_light must be below max_defects")
        self.matcher = ExactMatcherTPU(n_detectors, edges, probs, obs,
                                       max_defects=max_defects, chunk=chunk)
        self.max_defects = max_defects
        self.chunk = chunk
        self.n_detectors = n_detectors
        K = max_defects
        KL = k_light
        if KL:
            self.light = ExactMatcherTPU(n_detectors, edges, probs, obs,
                                         max_defects=KL, chunk=chunk)
            C_heavy = heavy_capacity or min(chunk, max(chunk // 4, 64))
            if not 1 <= C_heavy <= chunk:
                raise ValueError(f"heavy_capacity must be in [1, {chunk}]")
            self.heavy_capacity = C_heavy
        MG = greedy_fallback
        if MG:
            if MG <= max_defects:
                raise ValueError("greedy_fallback must exceed max_defects")
            C_greedy = greedy_capacity or min(chunk, max(chunk // 16, 64))
            if not 1 <= C_greedy <= chunk:
                raise ValueError(f"greedy_capacity must be in [1, {chunk}]")
            self.greedy_capacity = C_greedy
        Kg = min(MG, n_detectors) if MG else 0   # greedy's slot width
        # unified output width: never below the exact tier's K (tiny
        # circuits can clamp Kg below K, which would make padding
        # negative)
        MW = max(max_defects, Kg) if MG else max_defects
        n_rounds = int(det_round.max()) + 1
        R_END = n_rounds + 2  # commit-everything sentinel

        windows = []
        s = 0
        while True:
            lo, hi = s, s + window_rounds
            last = hi >= n_rounds
            ce = R_END if last else s + commit_rounds
            mask = ((det_round >= lo) & (det_round < hi)).astype(np.uint8)
            windows.append((mask, ce))
            if last:
                break
            s += commit_rounds
        self.n_windows = len(windows)

        g = self.matcher.graph
        ptbl = jnp.asarray(g.parity.astype(np.int32).reshape(-1))
        NW = n_detectors + 1
        rd_ext = jnp.asarray(np.append(det_round, 1 << 30).astype(np.int32))
        trace = self.matcher._trace_fn
        trace_light = self.light._trace_fn if KL else None
        if MG:
            from .decoders import _greedy_match_batch
            gdist = jnp.asarray(g.dist.astype(np.float32))
            gpar = jnp.asarray(g.parity)

            def greedy_fn(rows):
                return _greedy_match_batch(rows, gdist, gpar, MG)
        ks = jnp.arange(MW, dtype=jnp.int32)

        det_round_np = det_round

        def to_width(match, det_idx, from_k, rows):
            """Remap a tier's (match, det_idx) into the unified MW-wide
            slot layout (slot order is lowest-detector-first in every
            tier, so only the boundary marker and padding change)."""
            if from_k == MW:
                return match, det_idx
            m = jnp.where(match == from_k, jnp.int32(MW), match)
            m = jnp.concatenate(
                [m, jnp.full((rows, MW - from_k), -1, jnp.int32)], axis=1)
            d = jnp.concatenate(
                [det_idx, jnp.full((rows, MW - from_k), n_detectors,
                                   jnp.int32)], axis=1)
            return m, d

        def window_match(active, nd_act, S):
            """(match, det_idx, keff): the traced matching of `active`
            and each shot's effective defect budget this window."""
            if not KL:
                _, mD, dD = trace(active)
                match, det_idx = to_width(mD, dD, K, S)
                keff = jnp.full((S,), K, jnp.int32)
            else:
                _, mL, dL = trace_light(active)
                match, det_idx = to_width(mL, dL, KL, S)
                kcap = min(self.heavy_capacity, S)
                _, hidx = jax.lax.top_k(nd_act, kcap)
                _, mH, dH = trace(jnp.take(active, hidx, axis=0))
                mH, dH = to_width(mH, dH, K, kcap)
                is_heavy = (jnp.take(nd_act, hidx, axis=0) > KL)[:, None]
                match = match.at[hidx].set(
                    jnp.where(is_heavy, mH, jnp.take(match, hidx, axis=0)))
                det_idx = det_idx.at[hidx].set(
                    jnp.where(is_heavy, dH,
                              jnp.take(det_idx, hidx, axis=0)))
                heavy_served = jnp.zeros((S,), bool).at[hidx].set(
                    is_heavy[:, 0])
                keff = jnp.where(heavy_served, jnp.int32(K),
                                 jnp.int32(KL))
            if MG:
                gcap = min(self.greedy_capacity, S)
                _, gidx = jax.lax.top_k(nd_act, gcap)
                mG, dG = greedy_fn(jnp.take(active, gidx, axis=0))
                mG, dG = to_width(mG, dG, Kg, gcap)
                is_over = (jnp.take(nd_act, gidx, axis=0) > K)[:, None]
                match = match.at[gidx].set(
                    jnp.where(is_over, mG, jnp.take(match, gidx, axis=0)))
                det_idx = det_idx.at[gidx].set(
                    jnp.where(is_over, dG,
                              jnp.take(det_idx, gidx, axis=0)))
                greedy_served = jnp.zeros((S,), bool).at[gidx].set(
                    is_over[:, 0])
                keff = jnp.where(greedy_served, jnp.int32(Kg), keff)
            return match, det_idx, keff

        def decode_chunk(dets):
            S = dets.shape[0]
            carry = jnp.zeros_like(dets)
            par = jnp.zeros((S,), jnp.int32)
            ovf = jnp.zeros((S,), jnp.bool_)
            for mask_np, ce in windows:
                mask = jnp.asarray(mask_np)
                active = jnp.where(mask[None, :] == 1, dets, 0) | carry
                bits = active.astype(jnp.int32)
                rank = jnp.cumsum(bits, axis=1) * bits
                nd_act = jnp.sum(bits, axis=1)
                match, det_idx, keff = window_match(active, nd_act, S)
                ovf = ovf | (nd_act > keff)
                # defects beyond the shot's budget are NOT decoded this
                # window (the DP keeps the lowest indices = earliest
                # rounds). Those in buffer rounds reappear via the next
                # window's mask; those in commit rounds must be DEFERRED
                # explicitly or they would vanish — dropping a defect
                # flips the observable with ~50% odds (measured:
                # dominates p_L at d >= 9 without this carry)
                dropped = (rank > keff[:, None]) & (
                    jnp.asarray(det_round_np < ce)[None, :])
                rd = rd_ext[det_idx]                       # (S, MW)
                is_pair = (match >= 0) & (match < MW)
                dj = jnp.take_along_axis(det_idx,
                                         jnp.clip(match, 0, MW - 1), axis=1)
                rj = rd_ext[dj]
                is_bnd = match == MW
                commit_bnd = is_bnd & (rd < ce)
                first = is_pair & (ks[None, :] < match)
                commit_pair = first & (rd < ce) & (rj < ce)
                pb = ptbl[det_idx * NW + n_detectors]
                pp = ptbl[jnp.minimum(det_idx, n_detectors - 1) * NW
                          + jnp.minimum(dj, n_detectors - 1)]
                contrib = (jnp.where(commit_bnd, pb, 0)
                           + jnp.where(commit_pair, pp, 0))
                par = par ^ (jnp.sum(contrib, axis=1) & 1)
                # deferred pairs: carry the pre-boundary endpoint; the
                # buffer endpoint reappears via the next window's mask.
                # Scatter-max over det_idx/dj (not an (S, MW, n_det)
                # one-hot — that intermediate is ~100 MB per window at
                # d=11 chunk=4096 and scales with d^2 * rounds)
                defer = first & ~commit_pair
                c_i = defer & (rd < ce)
                c_j = defer & (rj < ce)
                rows = jnp.arange(S, dtype=jnp.int32)[:, None]
                keep = jnp.zeros((S, n_detectors), bool)
                keep = keep.at[rows,
                               jnp.clip(det_idx, 0, n_detectors - 1)].max(
                    c_i & (det_idx < n_detectors))
                keep = keep.at[rows, jnp.clip(dj, 0, n_detectors - 1)].max(
                    c_j & (dj < n_detectors))
                carry = (keep | dropped).astype(dets.dtype)
            return par, ovf

        self._fn = jax.jit(decode_chunk)

    def decode_device(self, dets: jnp.ndarray) -> jnp.ndarray:
        """Jit-composable decode: (S, n_det) on device -> (S,) int32."""
        return self._fn(dets)[0]

    def decode_device_with_overflow(self, dets: jnp.ndarray):
        """Jit-composable decode returning (pred (S,) int32, ovf (S,)
        bool) — ovf flags shots where any window (with the real carry
        dynamics) exceeded its defect budget."""
        return self._fn(dets)

    def decode_batch(self, detectors) -> np.ndarray:
        dets = np.asarray(detectors, dtype=np.uint8)
        t0 = time.perf_counter()
        S = dets.shape[0]
        out = np.empty(S, np.int64)
        n_ovf = 0
        for s0 in range(0, S, self.chunk):
            block = dets[s0:s0 + self.chunk]
            n = block.shape[0]
            if n < self.chunk:
                block = np.concatenate(
                    [block, np.zeros((self.chunk - n,) + block.shape[1:],
                                     block.dtype)])
            p, o = self._fn(jnp.asarray(block))
            out[s0:s0 + n] = np.asarray(p)[:n]
            n_ovf += int(np.asarray(o)[:n].sum())
        # rides along free: both outputs come from the same jitted call
        self.last_overflow_fraction = n_ovf / max(S, 1)
        self.last_decode_seconds = time.perf_counter() - t0
        return out

    def overflow_fraction(self, detectors) -> float:
        """Fraction of shots where ANY window (including carried defects)
        exceeded the K defect budget — measured on device with the real
        carry dynamics, not a host approximation."""
        dets = np.asarray(detectors, dtype=np.uint8)
        ovf_fn = lambda x: self._fn(x)[1].astype(jnp.int32)  # noqa: E731
        ovf = _chunked_decode(ovf_fn, dets, self.chunk)
        return float(ovf.mean())


class EscalatingWindowMatcher:
    """Sliding-window device decoding + native host re-decode of flagged
    shots: MWPM-class accuracy at ANY distance.

    The device sliding-window matcher (no greedy tier) decodes every shot
    and raises the per-shot `ovf` flag when any window exceeded the exact
    DP budget. Flagged shots — a small fraction below threshold (~2.4% of
    shots at d=11, p=1e-3) — are re-decoded WHOLE by the native C++ exact
    cluster decoder (native/uf_decoder.cpp decode_shot), which is true
    MWPM up to per-component budgets far beyond any window load. The
    result: exact windowed matching on the easy 97%+, exact global
    matching on the heavy tail, no greedy anywhere.

    This is the production decoder the reference reserved for PyMatching
    (architecture/qec/decoders.py:6-17): device throughput with host
    escalation only on the shots that need it.
    """

    def __init__(self, n_detectors: int, edges: np.ndarray,
                 probs: np.ndarray, obs: np.ndarray, det_round: np.ndarray,
                 window_rounds: int = 5, commit_rounds: int = 2,
                 max_defects: int = 12, chunk: int = 4096,
                 k_light: int = 6, heavy_capacity: int = 0):
        from .native import NativeMatchingDecoder
        self.window = WindowMatcherTPU(
            n_detectors, edges, probs, obs, det_round,
            window_rounds=window_rounds, commit_rounds=commit_rounds,
            max_defects=max_defects, chunk=chunk, k_light=k_light,
            heavy_capacity=heavy_capacity)
        self.native = NativeMatchingDecoder(n_detectors, edges, probs, obs)
        self.chunk = chunk
        self.max_defects = max_defects
        self.last_flagged_fraction = 0.0

    def decode_device_with_overflow(self, dets):
        """The device-side stage (jit-composable); callers escalate
        ovf-flagged shots via `decode_flagged_host`."""
        return self.window.decode_device_with_overflow(dets)

    def decode_flagged_host(self, dets_flagged: np.ndarray) -> np.ndarray:
        """Host stage: exact cluster decode of the flagged shots."""
        return self.native.decode_batch_ex(
            dets_flagged, mode=0)["pred"].astype(np.int64) & 1

    def decode_batch(self, detectors) -> np.ndarray:
        dets = np.asarray(detectors, dtype=np.uint8)
        t0 = time.perf_counter()
        S = dets.shape[0]
        preds = np.empty(S, np.int64)
        ovfs = np.empty(S, bool)
        fn = self.window._fn
        for s0 in range(0, S, self.chunk):
            block = dets[s0:s0 + self.chunk]
            n = block.shape[0]
            if n < self.chunk:
                block = np.concatenate(
                    [block, np.zeros((self.chunk - n,) + block.shape[1:],
                                     block.dtype)])
            p, o = fn(jnp.asarray(block))
            preds[s0:s0 + n] = np.asarray(p)[:n]
            ovfs[s0:s0 + n] = np.asarray(o)[:n]
        idx = np.nonzero(ovfs)[0]
        if idx.size:
            preds[idx] = self.decode_flagged_host(dets[idx])
        self.last_flagged_fraction = idx.size / max(S, 1)
        self.last_decode_seconds = time.perf_counter() - t0
        return preds

    def overflow_fraction(self, detectors) -> float:
        """Fraction of shots ESCALATED to the host decoder (these are
        decoded exactly, not truncated — kept for API parity with the
        device-only matchers)."""
        return self.window.overflow_fraction(detectors)


def window_matcher_for_circuit(circuit, det_round: np.ndarray,
                               window_rounds: int = 5,
                               commit_rounds: int = 2,
                               max_defects: int = 12,
                               chunk: int = 4096,
                               k_light: int = 0,
                               heavy_capacity: int = 0,
                               greedy_fallback: int = 0,
                               greedy_capacity: int = 0
                               ) -> WindowMatcherTPU:
    from .dem import build_dem, dem_to_edges
    dem = build_dem(circuit)
    edges, probs, obs = dem_to_edges(dem)
    return WindowMatcherTPU(circuit.n_detectors, edges, probs, obs,
                            det_round, window_rounds=window_rounds,
                            commit_rounds=commit_rounds,
                            max_defects=max_defects, chunk=chunk,
                            k_light=k_light, heavy_capacity=heavy_capacity,
                            greedy_fallback=greedy_fallback,
                            greedy_capacity=greedy_capacity)


def escalating_matcher_for_circuit(circuit, det_round: np.ndarray,
                                   window_rounds: int = 5,
                                   commit_rounds: int = 2,
                                   max_defects: int = 12,
                                   chunk: int = 4096,
                                   k_light: int = 6,
                                   heavy_capacity: int = 0
                                   ) -> EscalatingWindowMatcher:
    from .dem import build_dem, dem_to_edges
    dem = build_dem(circuit)
    edges, probs, obs = dem_to_edges(dem)
    return EscalatingWindowMatcher(
        circuit.n_detectors, edges, probs, obs, det_round,
        window_rounds=window_rounds, commit_rounds=commit_rounds,
        max_defects=max_defects, chunk=chunk, k_light=k_light,
        heavy_capacity=heavy_capacity)


__all__ = ["WindowMatcherTPU", "EscalatingWindowMatcher",
           "window_matcher_for_circuit", "escalating_matcher_for_circuit"]
