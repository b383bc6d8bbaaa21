"""Exact minimum-weight perfect matching on device (bitmask DP).

The reference planned PyMatching's C++ blossom for decoding
(reference: architecture/qec/decoders.py:6-8). Round 1 provided a host
C++ exact small-defect matcher (native/uf_decoder.cpp: subset-DP for
<= 12 defects). This module is the TPU-native equivalent of that exact
DP, restructured for the MXU/VPU:

  dp[S] = min cost of matching the defect subset S, with
  dp[S] = min( dp[S \\ {i}] + w(i, boundary),
               min_{j in S, j != i} dp[S \\ {i,j}] + w(i, j) )
  for i = lowest set bit of S.

Instead of 2^K sequential subset updates, subsets are processed in K+1
*popcount levels*: every mask in level k depends only on levels k-1
(boundary move) and k-2 (pair move), so each level is one batched
gather + min over all masks of that popcount and all shots at once —
13 sequential steps total for K = 12, everything else data-parallel.
Observable parities ride along via argmin branch selection.

Exactness matches native/uf_decoder.cpp bit-for-bit for <= K defects
(tests cross-check); shots with more defects than K keep only the K
lowest-index defects (same overflow rule as the greedy decoder) — the
e2e benchmark reports the overflow fraction so this is quantified.
"""
from __future__ import annotations

import time
from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .decoders import MatchingGraph


def _build_level_tables(K: int):
    """Host precompute of the DP transition tables, one entry per level.

    Returns a list over popcount level k = 1..K of dicts with:
      bnd_pred : (L_k,)      index into level k-1 dp  (mask without bit i)
      slot_i   : (L_k,)      lowest-set-bit slot i
      pair_pred: (L_k, K-1)  index into level k-2 dp  (mask without i, j)
      slot_j   : (L_k, K-1)  partner slot j (padded with 0)
      pair_ok  : (L_k, K-1)  validity of each padded pair column
    """
    by_pop = [[] for _ in range(K + 1)]
    for m in range(1 << K):
        by_pop[bin(m).count("1")].append(m)
    pos = [{m: i for i, m in enumerate(level)} for level in by_pop]

    tables = []
    for k in range(1, K + 1):
        masks = by_pop[k]
        L = len(masks)
        bnd_pred = np.zeros(L, np.int32)
        slot_i = np.zeros(L, np.int32)
        pair_pred = np.zeros((L, K - 1), np.int32)
        slot_j = np.zeros((L, K - 1), np.int32)
        pair_ok = np.zeros((L, K - 1), bool)
        for li, m in enumerate(masks):
            i = (m & -m).bit_length() - 1
            slot_i[li] = i
            bnd_pred[li] = pos[k - 1][m ^ (1 << i)]
            col = 0
            for j in range(i + 1, K):
                if m >> j & 1:
                    pair_pred[li, col] = pos[k - 2][m ^ (1 << i) ^ (1 << j)]
                    slot_j[li, col] = j
                    pair_ok[li, col] = True
                    col += 1
        tables.append(dict(bnd_pred=bnd_pred, slot_i=slot_i,
                           pair_pred=pair_pred, slot_j=slot_j,
                           pair_ok=pair_ok, size=L))
    return tables


def _dp_decode(dets, dist, parity, tables, K: int):
    """dets (S, n_det) uint8 -> exact matching observable parity (S,)."""
    S, n_det = dets.shape
    B = n_det  # boundary index in dist/parity

    # defect slots: lowest-index defects first; absent slots sit on the
    # boundary (dist[B, B] = 0), which makes them free & parity-neutral
    bits = dets.astype(jnp.int32)
    order = jnp.argsort(-bits, axis=1, stable=True)
    idx = order[:, :K]
    valid = jnp.take_along_axis(bits, idx, axis=1) > 0
    nodes = jnp.where(valid, idx, B)                       # (S, K)

    Wm = dist[nodes[:, :, None], nodes[:, None, :]]        # (S, K, K)
    Pm = parity[nodes[:, :, None], nodes[:, None, :]]
    Wb = dist[nodes, B]                                    # (S, K)
    Pb = parity[nodes, B]
    Wm_flat = Wm.reshape(S, K * K)
    Pm_flat = Pm.reshape(S, K * K)

    # dp over popcount levels; level 0 = empty set
    dp_prev2 = None
    dp_prev1 = (jnp.zeros((S, 1), dist.dtype), jnp.zeros((S, 1), jnp.int32))
    for k in range(1, K + 1):
        t = tables[k - 1]
        bnd_pred = jnp.asarray(t["bnd_pred"])
        si = jnp.asarray(t["slot_i"])
        cost_b = dp_prev1[0][:, bnd_pred] + Wb[:, si]      # (S, L)
        par_b = dp_prev1[1][:, bnd_pred] ^ Pb[:, si]
        if k >= 2:
            pair_pred = jnp.asarray(t["pair_pred"])        # (L, K-1)
            sj = jnp.asarray(t["slot_j"])
            ok = jnp.asarray(t["pair_ok"])
            flat_ij = si[:, None] * K + sj                 # (L, K-1)
            w_ij = Wm_flat[:, flat_ij]                     # (S, L, K-1)
            p_ij = Pm_flat[:, flat_ij]
            cost_p = dp_prev2[0][:, pair_pred] + w_ij
            par_p = dp_prev2[1][:, pair_pred] ^ p_ij
            big = jnp.asarray(np.float32(1e18), dist.dtype)
            cost_p = jnp.where(ok[None], cost_p, big)
            jbest = jnp.argmin(cost_p, axis=2)             # (S, L)
            cbest = jnp.take_along_axis(cost_p, jbest[..., None],
                                        axis=2)[..., 0]
            pbest = jnp.take_along_axis(par_p, jbest[..., None],
                                        axis=2)[..., 0]
            use_b = cost_b <= cbest
            dp_k = (jnp.where(use_b, cost_b, cbest),
                    jnp.where(use_b, par_b, pbest))
        else:
            dp_k = (cost_b, par_b)
        dp_prev2, dp_prev1 = dp_prev1, dp_k

    # level K has exactly one mask: the full set
    return dp_prev1[1][:, 0]


class ExactMatcherTPU:
    """Device-exact MWPM decoder (<= K defects) over the same APSP tables
    as MatchingDecoder / the native C++ decoder — bit-identical results,
    whole shot batches in one jitted call."""

    def __init__(self, n_detectors: int, edges: np.ndarray, probs: np.ndarray,
                 obs: np.ndarray, max_defects: int = 12,
                 chunk: int = 8192):
        if max_defects > 16:
            raise ValueError("bitmask DP is exponential in max_defects; "
                             "use <= 16 (default 12)")
        self.graph = MatchingGraph.from_edges(n_detectors, edges, probs, obs)
        self.n_detectors = n_detectors
        self.max_defects = max_defects
        self.chunk = chunk
        self._dist = jnp.asarray(self.graph.dist.astype(np.float32))
        self._par = jnp.asarray(self.graph.parity.astype(np.int32))
        tables = _build_level_tables(max_defects)
        self._fn = jax.jit(partial(_dp_decode, dist=self._dist,
                                   parity=self._par, tables=tables,
                                   K=max_defects))

    def decode_batch(self, detectors) -> np.ndarray:
        """detectors (S, n_det) -> predicted logical flip (S,) int64.
        Host entry point (chunks + fetches); use `decode_device` inside
        larger jitted pipelines."""
        dets = np.asarray(detectors, dtype=np.uint8)
        S = dets.shape[0]
        t0 = time.perf_counter()
        outs = []
        for s0 in range(0, S, self.chunk):
            outs.append(np.asarray(self._fn(jnp.asarray(dets[s0:s0 + self.chunk]))))
        self.last_decode_seconds = time.perf_counter() - t0
        return np.concatenate(outs).astype(np.int64)

    def decode_device(self, dets: jnp.ndarray) -> jnp.ndarray:
        """Jit-composable decode: (S, n_det) on device -> (S,) int32."""
        return self._fn(dets)

    def overflow_fraction(self, detectors) -> float:
        """Fraction of shots whose defect count exceeds max_defects (those
        decode with only their first K defects)."""
        counts = np.asarray(detectors).sum(axis=1)
        return float(np.mean(counts > self.max_defects))


def exact_matcher_for_circuit(circuit, max_defects: int = 12,
                              chunk: int = 8192) -> ExactMatcherTPU:
    from .dem import build_dem, dem_to_edges
    dem = build_dem(circuit)
    edges, probs, obs = dem_to_edges(dem)
    return ExactMatcherTPU(circuit.n_detectors, edges, probs, obs,
                           max_defects=max_defects, chunk=chunk)


__all__ = ["ExactMatcherTPU", "exact_matcher_for_circuit"]
