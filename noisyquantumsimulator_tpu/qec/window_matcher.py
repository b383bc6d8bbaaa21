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
defects to the next window instead of truncating them — every defect is
matched exactly once, so overflow degrades optimality, never drops
syndrome information. Reference target: PyMatching's role in
architecture/qec/decoders.py:6-17.
"""
from __future__ import annotations

import time
from typing import Optional

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
                 max_defects: int = 12, chunk: int = 4096):
        if commit_rounds >= window_rounds:
            raise ValueError("window_rounds must exceed commit_rounds "
                             "(the overlap buffer is their difference)")
        det_round = np.asarray(det_round, np.int32)
        if det_round.shape != (n_detectors,):
            raise ValueError("det_round must label every detector")
        self.matcher = ExactMatcherTPU(n_detectors, edges, probs, obs,
                                       max_defects=max_defects, chunk=chunk)
        self.max_defects = max_defects
        self.chunk = chunk
        self.n_detectors = n_detectors
        self.last_overflow_fraction = 0.0
        K = max_defects
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
        ks = jnp.arange(K, dtype=jnp.int32)

        det_round_np = det_round

        def decode_chunk(dets):
            S = dets.shape[0]
            carry = jnp.zeros_like(dets)
            par = jnp.zeros((S,), jnp.int32)
            ovf = jnp.zeros((S,), jnp.bool_)
            for mask_np, ce in windows:
                mask = jnp.asarray(mask_np)
                active = jnp.where(mask[None, :] == 1, dets, 0) | carry
                ovf = ovf | (jnp.sum(active.astype(jnp.int32), axis=1) > K)
                _, match, det_idx = trace(active)
                # defects beyond the K budget are NOT decoded this window
                # (the DP keeps the K lowest indices = earliest rounds).
                # Those in buffer rounds reappear via the next window's
                # mask; those in commit rounds must be DEFERRED explicitly
                # or they would vanish — dropping a defect flips the
                # observable with ~50% odds (measured: dominates p_L at
                # d >= 9 without this carry)
                bits = active.astype(jnp.int32)
                rank = jnp.cumsum(bits, axis=1) * bits
                dropped = (rank > K) & (
                    jnp.asarray(det_round_np < ce)[None, :])
                rd = rd_ext[det_idx]                       # (S, K)
                is_pair = (match >= 0) & (match < K)
                dj = jnp.take_along_axis(det_idx,
                                         jnp.clip(match, 0, K - 1), axis=1)
                rj = rd_ext[dj]
                is_bnd = match == K
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
                # buffer endpoint reappears via the next window's mask
                defer = first & ~commit_pair
                c_i = defer & (rd < ce)
                c_j = defer & (rj < ce)
                oh_i = (det_idx[:, :, None]
                        == jnp.arange(n_detectors, dtype=jnp.int32)[None,
                                                                    None, :])
                keep = (jnp.any(oh_i & c_i[:, :, None], axis=1)
                        | jnp.any((dj[:, :, None]
                                   == jnp.arange(n_detectors,
                                                 dtype=jnp.int32)[None, None,
                                                                  :])
                                  & c_j[:, :, None], axis=1))
                carry = (keep | dropped).astype(dets.dtype)
            return par, ovf

        self._fn = jax.jit(decode_chunk)

    def decode_device(self, dets: jnp.ndarray) -> jnp.ndarray:
        """Jit-composable decode: (S, n_det) on device -> (S,) int32."""
        return self._fn(dets)[0]

    def decode_batch(self, detectors) -> np.ndarray:
        dets = np.asarray(detectors, dtype=np.uint8)
        t0 = time.perf_counter()
        par_fn = lambda x: self._fn(x)[0]  # noqa: E731
        out = _chunked_decode(par_fn, dets, self.chunk)
        self.last_decode_seconds = time.perf_counter() - t0
        return out

    def overflow_fraction(self, detectors) -> float:
        """Fraction of shots where ANY window (including carried defects)
        exceeded the K defect budget — measured on device with the real
        carry dynamics, not a host approximation."""
        dets = np.asarray(detectors, dtype=np.uint8)
        S = dets.shape[0]
        n_over = 0
        for s0 in range(0, S, self.chunk):
            block = dets[s0:s0 + self.chunk]
            n = block.shape[0]
            if n < self.chunk:
                block = np.concatenate(
                    [block, np.zeros((self.chunk - n,) + block.shape[1:],
                                     block.dtype)])
            _, ovf = self._fn(jnp.asarray(block))
            n_over += int(np.asarray(ovf)[:n].sum())
        return n_over / max(S, 1)


def window_matcher_for_circuit(circuit, det_round: np.ndarray,
                               window_rounds: int = 5,
                               commit_rounds: int = 2,
                               max_defects: int = 12,
                               chunk: int = 4096) -> WindowMatcherTPU:
    from .dem import build_dem, dem_to_edges
    dem = build_dem(circuit)
    edges, probs, obs = dem_to_edges(dem)
    return WindowMatcherTPU(circuit.n_detectors, edges, probs, obs,
                            det_round, window_rounds=window_rounds,
                            commit_rounds=commit_rounds,
                            max_defects=max_defects, chunk=chunk)


__all__ = ["WindowMatcherTPU", "window_matcher_for_circuit"]
