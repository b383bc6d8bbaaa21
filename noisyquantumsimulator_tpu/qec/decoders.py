"""Decoders for the QEC layer.

Implements the reference's comment-only decoder spec
(reference: architecture/qec/decoders.py:5-28 — "MWPM (PyMatching),
Union-Find, interface decode(syndrome_history, code) -> correction,
tracks decode time + logical error rate").

Decoders provided:

  MatchingDecoder ("greedy-uf")  — TPU-batched: precomputes all-pairs
      shortest paths + observable-crossing parities on the weighted
      space-time detector graph, then pairs defects greedily on device.
      Whole shot batches decode in ONE jitted call (the reference's planned
      PyMatching path is one C++ call per shot).

  UnionFindDecoder — host-side weighted union-find (Delfosse-Nickerson
      style cluster growth + peeling parity), the accuracy reference.

Both consume the edge list from qec/dem.dem_to_edges, so they work for any
code expressible as a matching graph (surface code memory here).
"""
from __future__ import annotations

import time
from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


# =============================================================================
# graph preprocessing (host, once per circuit)
# =============================================================================

def _floyd_warshall_with_parity(n_nodes: int, edges: np.ndarray,
                                weights: np.ndarray, obs: np.ndarray
                                ) -> Tuple[np.ndarray, np.ndarray]:
    """All-pairs shortest paths and the observable parity along the
    shortest path. Boundary is node index n_nodes-1."""
    INF = 1e18
    D = np.full((n_nodes, n_nodes), INF)
    P = np.zeros((n_nodes, n_nodes), dtype=np.int32)
    np.fill_diagonal(D, 0.0)
    for (a, b), w, om in zip(edges, weights, obs):
        a = n_nodes - 1 if a < 0 else a
        b = n_nodes - 1 if b < 0 else b
        if w < D[a, b]:
            D[a, b] = D[b, a] = w
            P[a, b] = P[b, a] = om
    for k in range(n_nodes):
        alt = D[:, k, None] + D[None, k, :]
        better = alt < D
        if better.any():
            palt = P[:, k, None] ^ P[None, k, :]
            D = np.where(better, alt, D)
            P = np.where(better, palt, P)
    return D, P


@dataclass
class MatchingGraph:
    n_detectors: int
    dist: np.ndarray      # (n+1, n+1) incl boundary node at index n
    parity: np.ndarray    # (n+1, n+1) observable parity of shortest path

    @staticmethod
    def from_edges(n_detectors: int, edges: np.ndarray, probs: np.ndarray,
                   obs: np.ndarray) -> "MatchingGraph":
        w = np.log((1.0 - probs) / np.maximum(probs, 1e-15))
        w = np.maximum(w, 1e-3)
        D, P = _floyd_warshall_with_parity(n_detectors + 1, edges, w, obs)
        return MatchingGraph(n_detectors, D, P)


# =============================================================================
# TPU-batched greedy matching
# =============================================================================

def _greedy_decode_batch(dets, dist, parity, max_defects: int):
    """dets: (S, n_det) uint8 -> logical flip parity (S,) int32.

    Per shot: take up to K defect indices (excess defects overflow into the
    boundary, which is safe at the low defect densities where matching
    decoding is meaningful), then K greedy rounds each matching the closest
    available pair (defect-defect or defect-boundary). Thin re-scoring
    wrapper around _greedy_match_batch — ONE greedy loop to maintain; the
    equivalence is pinned by TestWindowMatcher's re-scoring test.
    """
    S, n_det = dets.shape
    K = min(max_defects, n_det)
    match, det_idx = _greedy_match_batch(dets, dist, parity, max_defects)
    ks = jnp.arange(K, dtype=jnp.int32)
    is_bnd = match == K
    first = (match >= 0) & (match < K) & (ks[None, :] < match)
    dj = jnp.take_along_axis(det_idx, jnp.clip(match, 0, K - 1), axis=1)
    pari = parity.astype(jnp.int32)
    pb = pari[det_idx, n_det]
    pp = pari[det_idx, dj]
    contrib = jnp.where(is_bnd, pb, 0) + jnp.where(first, pp, 0)
    return (jnp.sum(contrib, axis=1) & 1).astype(jnp.int32)


def _greedy_match_batch(dets, dist, parity, max_defects: int):
    """Like _greedy_decode_batch but EXTRACTS the matching.

    Returns (match (S, K) int32, det_idx (S, K) int32): per defect slot
    (lowest detector index first, same slot order as the exact DP) the
    matched slot, K for a boundary match, -1 for unused slots; det_idx
    carries each slot's detector index (n_det when unused). Greedy pairs
    taken "via boundary" decompose into two independent boundary matches
    — structurally faithful, so windowed commit/defer logic can consume
    this as a drop-in budget-free fallback tier. XORing the matched
    pairs' parities reproduces _greedy_decode_batch bit-for-bit (tested).
    """
    S, n_det = dets.shape
    K = min(max_defects, n_det)
    B = n_det

    def one(det_row):
        bits = det_row.astype(jnp.int32)
        order = jnp.argsort(-bits, stable=True)
        idx = order[:K]
        valid = bits[idx] > 0
        nodes = jnp.where(valid, idx, B)

        Dm = dist[nodes][:, nodes]
        Db = dist[nodes, B]
        via_bnd = Db[:, None] + Db[None, :]
        use_direct = Dm <= via_bnd
        Deff = jnp.where(use_direct, Dm, via_bnd)

        big = jnp.asarray(1e17, dist.dtype)
        eye = jnp.eye(K, dtype=bool)

        def body(_, carry):
            used, match = carry
            avail = (~used) & valid
            pair_ok = avail[:, None] & avail[None, :] & (~eye)
            Mp = jnp.where(pair_ok, Deff, big)
            pflat = jnp.argmin(Mp)
            i, j = pflat // K, pflat % K
            have_pair = Mp[i, j] < big
            n_avail = jnp.sum(avail.astype(jnp.int32))
            bi = jnp.argmax(avail)
            lone = (n_avail == 1)

            direct = use_direct[i, j]
            mi = jnp.where(direct, j, K).astype(jnp.int32)
            mj = jnp.where(direct, i, K).astype(jnp.int32)
            match = jnp.where(have_pair,
                              match.at[i].set(mi).at[j].set(mj),
                              jnp.where(lone,
                                        match.at[bi].set(jnp.int32(K)),
                                        match))
            used = jnp.where(have_pair,
                             used.at[i].set(True).at[j].set(True),
                             jnp.where(lone, used.at[bi].set(True), used))
            return used, match

        used0 = jnp.zeros((K,), dtype=bool)
        match0 = jnp.full((K,), -1, jnp.int32)
        _, match = jax.lax.fori_loop(0, K, body, (used0, match0))
        return match, nodes.astype(jnp.int32)

    return jax.vmap(one)(dets)


class MatchingDecoder:
    """Batched greedy matching on the space-time detector graph."""

    def __init__(self, n_detectors: int, edges: np.ndarray, probs: np.ndarray,
                 obs: np.ndarray, max_defects: int = 32):
        self.graph = MatchingGraph.from_edges(n_detectors, edges, probs, obs)
        self.max_defects = max_defects
        self._dist = jnp.asarray(self.graph.dist.astype(np.float32))
        self._par = jnp.asarray(self.graph.parity)
        self._fn = jax.jit(partial(_greedy_decode_batch,
                                   dist=self._dist, parity=self._par,
                                   max_defects=max_defects))

    def decode_batch(self, detectors) -> np.ndarray:
        """detectors (S, n_det) -> predicted logical-flip BITMASK (S,)
        (bit k = predicted flip of observable k; take `& 1` for the
        primary logical)."""
        t0 = time.perf_counter()
        out = self._fn(jnp.asarray(detectors))
        out = np.asarray(out)
        self.last_decode_seconds = time.perf_counter() - t0
        return out


# =============================================================================
# host union-find (accuracy reference)
# =============================================================================

class UnionFindDecoder:
    """Weighted union-find decoder (cluster growth + parity peeling).

    Simplified Delfosse-Nickerson: grow clusters from defects along the
    weighted graph in ascending edge-radius order; a cluster becomes
    neutral when it contains an even number of defects or touches the
    boundary; the correction parity is recovered from shortest-path
    parities within each neutral cluster (exact for tree-like clusters,
    the dominant case below threshold).
    """

    def __init__(self, n_detectors: int, edges: np.ndarray, probs: np.ndarray,
                 obs: np.ndarray):
        self.n = n_detectors
        g = MatchingGraph.from_edges(n_detectors, edges, probs, obs)
        self.dist, self.parity = g.dist, g.parity

    def decode_batch(self, detectors: np.ndarray) -> np.ndarray:
        t0 = time.perf_counter()
        S = detectors.shape[0]
        out = np.zeros(S, dtype=np.int64)
        B = self.n
        for s in range(S):
            defects = np.nonzero(detectors[s])[0].tolist()
            par = 0
            # exact greedy over full pair set (host): closest pairs first
            while defects:
                if len(defects) == 1:
                    par ^= int(self.parity[defects[0], B])
                    break
                sub = np.array(defects)
                Dm = self.dist[np.ix_(sub, sub)]
                bd = self.dist[sub, B]
                via = bd[:, None] + bd[None, :]
                Deff = np.minimum(Dm, via)
                np.fill_diagonal(Deff, np.inf)
                i, j = np.unravel_index(np.argmin(Deff), Deff.shape)
                if Dm[i, j] <= via[i, j]:
                    par ^= int(self.parity[sub[i], sub[j]])
                else:
                    par ^= int(self.parity[sub[i], B]
                               ^ self.parity[sub[j], B])
                for k in sorted((int(i), int(j)), reverse=True):
                    defects.pop(k)
            out[s] = par
        self.last_decode_seconds = time.perf_counter() - t0
        return out


def decoder_for_circuit(circuit, kind: str = "matching",
                        max_defects: int = 32):
    """Build a decoder from a Circuit via its detector error model."""
    from .dem import build_dem, dem_to_edges
    dem = build_dem(circuit)
    edges, probs, obs = dem_to_edges(dem)
    if kind in ("matching", "greedy", "mwpm"):
        return MatchingDecoder(circuit.n_detectors, edges, probs, obs,
                               max_defects=max_defects)
    if kind in ("uf", "union_find"):
        return UnionFindDecoder(circuit.n_detectors, edges, probs, obs)
    if kind in ("native", "exact", "native_mwpm"):
        from .native import NativeMatchingDecoder, native_available
        if not native_available():
            raise RuntimeError("native decoder library not built; "
                               "run `make -C native`")
        return NativeMatchingDecoder(circuit.n_detectors, edges, probs, obs)
    raise ValueError(f"Unknown decoder kind: {kind}")


__all__ = ["MatchingGraph", "MatchingDecoder", "UnionFindDecoder",
           "decoder_for_circuit"]
