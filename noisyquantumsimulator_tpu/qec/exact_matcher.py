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
    """Host precompute of the DP transitions as one-hot SELECTION MATRICES.

    The natural formulation gathers dp values at static subset indices,
    but XLA gathers serialize badly on TPU (measured ~8k shots/s e2e at
    d=7). Because every index table is static, each gather is instead a
    matmul with a constant 0/1 matrix — exact value copies on the MXU
    (one 1 per output column; bf16x3/HIGHEST passes reconstruct f32
    exactly), which is ~2 orders of magnitude faster here.

    Per level k = 1..K:
      G_bnd : (L_{k-1}, L_k)        dp gather for the boundary move
      G_pair: (L_{k-2}, L_k*(K-1))  dp gather for pair moves (k >= 2)
      S_bi  : (K, L_k)              selects Wb[:, i] per mask
      S_ij  : (K*K, L_k*(K-1))      selects Wm[:, i, j] per (mask, col)
      pair_ok: (L_k, K-1)           validity of padded pair columns
    """
    by_pop = [[] for _ in range(K + 1)]
    for m in range(1 << K):
        by_pop[bin(m).count("1")].append(m)
    pos = [{m: i for i, m in enumerate(level)} for level in by_pop]

    tables = []
    for k in range(1, K + 1):
        masks = by_pop[k]
        L = len(masks)
        L1 = len(by_pop[k - 1])
        L2 = len(by_pop[k - 2]) if k >= 2 else 0
        W = K - 1
        G_bnd = np.zeros((L1, L), np.float32)
        S_bi = np.zeros((K, L), np.float32)
        G_pair = np.zeros((L2, L * W), np.float32) if k >= 2 else None
        S_ij = np.zeros((K * K, L * W), np.float32) if k >= 2 else None
        pair_ok = np.zeros((L, W), bool)
        for li, m in enumerate(masks):
            i = (m & -m).bit_length() - 1
            G_bnd[pos[k - 1][m ^ (1 << i)], li] = 1.0
            S_bi[i, li] = 1.0
            col = 0
            for j in range(i + 1, K):
                if m >> j & 1:
                    G_pair[pos[k - 2][m ^ (1 << i) ^ (1 << j)],
                           li * W + col] = 1.0
                    S_ij[i * K + j, li * W + col] = 1.0
                    pair_ok[li, col] = True
                    col += 1
        tables.append(dict(G_bnd=G_bnd, S_bi=S_bi, G_pair=G_pair,
                           S_ij=S_ij, pair_ok=pair_ok, size=L))
    return tables


def _sel(x, M, precision=jax.lax.Precision.HIGHEST):
    """Exact static gather as a one-hot matmul: x (S, A) @ M (A, B).

    HIGHEST is required for bit-exactness: bf16x3 (HIGH) drops the
    a3*b1 cross term, so even a one-hot copy loses ~8 mantissa bits
    (measured: 1/65k parity flips vs the native f64 decoder at d=7)."""
    return jax.lax.dot_general(x, M, (((1,), (0,)), ((), ())),
                               precision=precision)


def _slot_tables(dets, dist, parity, K: int,
                 precision=jax.lax.Precision.HIGHEST):
    """Per-shot slot weight/parity tables for the bitmask DP.

    Defect slots, lowest index first. The slot one-hot is built directly
    from the cumsum RANK of each set bit (rank k -> slot k-1) — pure
    elementwise compares on the VPU, no sort. (A profiler run attributed
    3.1 ms of the 3.9 ms K=6 chunk decode to a per-row top_k here, but
    the sort-free form measured neutral end-to-end — XLA overlaps the
    sort with the DP; kept because it removes the serialization point
    without costing anything.) Absent slots get the boundary column
    (dist[B, B] = 0): free and parity-neutral. Shots with more than K
    defects keep only the K lowest-index ones (the documented overflow
    rule).

    Returns (oh_det (S,K,n_det), Wm (S,K,K), Pm, Wb (S,K), Pb).
    """
    S, n_det = dets.shape
    B = n_det  # boundary index in dist/parity
    bits = dets.astype(jnp.int32)
    rank = jnp.cumsum(bits, axis=1) * bits                 # (S, n_det)
    ks = jnp.arange(1, K + 1, dtype=jnp.int32)
    oh_det = (rank[:, None, :] == ks[None, :, None]).astype(dist.dtype)
    filled = jnp.sum(oh_det, axis=2)                       # (S, K) 0/1
    # slot-pair weight/parity tables via one-hot matmuls (exact copies on
    # the MXU; dynamic gathers from the (n+1, n+1) tables measured ~15x
    # slower than the whole matmul DP on TPU)
    oh = jnp.concatenate([oh_det, (1.0 - filled)[:, :, None]],
                         axis=2)                           # (S, K, N+1)
    T = jnp.einsum("skn,nm->skm", oh, dist, precision=precision)
    Wm = jnp.einsum("skm,slm->skl", T, oh,
                    precision=precision)                     # (S, K, K)
    Tp = jnp.einsum("skn,nm->skm", oh, parity.astype(dist.dtype),
                    precision=precision)
    Pm = jnp.einsum("skm,slm->skl", Tp, oh, precision=precision)
    Wb = _sel(oh.reshape(S * K, -1), dist[:, B][:, None],
              precision).reshape(S, K)
    Pb = _sel(oh.reshape(S * K, -1),
              parity[:, B].astype(dist.dtype)[:, None],
              precision).reshape(S, K)
    return oh_det, Wm, Pm, Wb, Pb


def _dp_decode(dets, dist, parity, tables, K: int):
    """dets (S, n_det) uint8 -> exact matching observable parity (S,)."""
    _, Wm, Pm, Wb, Pb = _slot_tables(dets, dist, parity, K)
    return _dp_from_tables(Wm, Pm, Wb, Pb, tables, K)


def _fused_level_tables(tables, K: int):
    """Stack each level's dp-gather and weight-selection one-hots into
    ONE matrix per move type: M_bnd = [G_bnd; S_bi] and
    M_pair = [G_pair; S_ij]. A single matmul then computes
    gather(dp) + select(w) — the DP's sum — directly; parities ride the
    same matrices on extra batch rows and come back as exact 0/1/2
    counts (xor = sum mod 2). This matters because the level loop is
    LATENCY-bound on TPU (K=12 means 12 sequential levels; at 6 small
    matmuls each the chunk decode was dispatch-dominated): fusing cuts
    the sequential matmul count 3x. Cached on the tables list."""
    key = "fused"
    if tables and key in tables[0]:
        return [t[key] for t in tables]
    out = []
    for k, t in enumerate(tables, start=1):
        M_bnd = np.concatenate([t["G_bnd"], t["S_bi"]], axis=0)
        M_pair = (np.concatenate([t["G_pair"], t["S_ij"]], axis=0)
                  if k >= 2 else None)
        f = dict(M_bnd=M_bnd, M_pair=M_pair, pair_ok=t["pair_ok"],
                 size=t["size"])
        t[key] = f
        out.append(f)
    return out


def _dp_from_tables(Wm, Pm, Wb, Pb, tables, K: int):
    """The bitmask-DP level loop on PRECOMPUTED per-row slot tables.

    Wm/Pm (S, K, K) pair weight/parity, Wb/Pb (S, K) boundary
    weight/parity — the exact layout _slot_tables produces. Split out so
    callers that already hold per-defect distances (the cluster
    decomposition decoder routes component members here without paying
    the (S, K, n_det) one-hot einsums again) share one DP implementation
    with _dp_decode. Returns the (S,) int32 matching observable parity.

    Level recurrence, fused (see _fused_level_tables): per level one
    (2S, L1+K) @ (L1+K, L) matmul serves the boundary move's cost AND
    parity, one (2S, L2+K^2) @ (.., L*W) the pair move's. Each output
    element sums exactly two one-hot-selected f32 values; at HIGHEST
    the matmul accumulation equals the explicit f32 add bit-for-bit.
    Parities accumulate as integer counts, reduced mod 2 at the end of
    each level (counts stay <= 2, exact in f32)."""
    S = Wm.shape[0]
    W = K - 1
    dist = Wm  # dtype carrier only
    big = jnp.asarray(np.float32(1e18), dist.dtype)
    Wm_flat = Wm.reshape(S, K * K)
    Pm_flat = Pm.reshape(S, K * K)
    fused = _fused_level_tables(tables, K)

    def first_min_parity(cost, par):
        """(min cost, parity of the FIRST minimizer) along the last axis
        — matches argmin tie-breaking without take_along_axis gathers."""
        cbest = jnp.min(cost, axis=-1)
        is_min = cost <= cbest[..., None]
        first = is_min & (jnp.cumsum(is_min.astype(jnp.int32), axis=-1) == 1)
        pbest = jnp.sum(jnp.where(first, par, 0.0), axis=-1)
        return cbest, pbest

    # dp over popcount levels; level 0 = empty set; parities ride as floats
    # NOTE on precision: parities (0/1 operands) would be exact at a
    # single DEFAULT bf16 pass, but mixed-precision dots in this loop
    # under jax.lax.map deterministically crash the tunneled v5e worker
    # (kernel fault; plain pipelines and DEFAULT table einsums under map
    # are fine — probed 2026-08). Parities therefore ride the cost
    # matmul's extra batch rows at HIGHEST — the proven-stable form.
    dp_prev2 = None
    dp_prev1 = (jnp.zeros((S, 1), dist.dtype), jnp.zeros((S, 1), dist.dtype))
    for k in range(1, K + 1):
        t = fused[k - 1]
        L = t["size"]
        xb = jnp.concatenate([
            jnp.concatenate([dp_prev1[0], Wb], axis=1),
            jnp.concatenate([dp_prev1[1], Pb], axis=1)], axis=0)  # (2S, .)
        yb = _sel(xb, jnp.asarray(t["M_bnd"]))             # (2S, L)
        cost_b = yb[:S]
        par_b = yb[S:] % 2.0
        if k >= 2:
            ok = jnp.asarray(t["pair_ok"])                 # (L, W)
            xp = jnp.concatenate([
                jnp.concatenate([dp_prev2[0], Wm_flat], axis=1),
                jnp.concatenate([dp_prev2[1], Pm_flat], axis=1)], axis=0)
            yp = _sel(xp, jnp.asarray(t["M_pair"]))        # (2S, L*W)
            cost_p = yp[:S].reshape(S, L, W)
            par_p = (yp[S:] % 2.0).reshape(S, L, W)
            cost_p = jnp.where(ok[None], cost_p, big)
            cbest, pbest = first_min_parity(cost_p, par_p)
            use_b = cost_b <= cbest
            dp_k = (jnp.where(use_b, cost_b, cbest),
                    jnp.where(use_b, par_b, pbest))
        else:
            dp_k = (cost_b, par_b)
        dp_prev2, dp_prev1 = dp_prev1, dp_k

    # level K has exactly one mask: the full set
    return dp_prev1[1][:, 0].astype(jnp.int32)


def _build_level_indices(K: int):
    """GATHER-index level tables for the big-K DP (K = 13..16).

    The one-hot matmul tables of _build_level_tables scale as
    O(4^K * K): at K = 14 the mid-level M_pair alone is ~392 MB of f32
    constants — beyond HBM sense and the tunneled v5e's remote-compile
    request limit (HTTP 413, measured round 3). Index tables scale as
    O(2^K * K) INTS: all sixteen K = 16 levels together are ~4 MB. The
    DP then runs as row gathers over LEVEL-MAJOR (L, R) dp arrays (each
    gather slice is R contiguous floats) instead of one-hot matmuls —
    slower per row than the MXU form, but the big-K tiers only ever see
    the rare heavy components (~0.1 rows/shot at d = 13, p = 1e-3), so
    rows are few.

    Per level k = 1..K (masks ascending within each popcount level,
    identical ordering to _build_level_tables):
      idx_bnd : (L,)   position of m ^ lowbit(m) in level k-1
      sel_bi  : (L,)   i = lowbit(m): row of Wb^T
      idx_pair: (L, W) position of m ^ {i, j} in level k-2 (0-padded)
      sel_ij  : (L, W) i*K + j: row of Wm^T (0-padded)
      pair_ok : (L, W) validity of padded pair columns
    """
    by_pop = [[] for _ in range(K + 1)]
    for m in range(1 << K):
        by_pop[bin(m).count("1")].append(m)
    pos = [{m: i for i, m in enumerate(level)} for level in by_pop]
    tables = []
    for k in range(1, K + 1):
        masks = by_pop[k]
        L = len(masks)
        W = K - 1
        idx_bnd = np.zeros(L, np.int32)
        sel_bi = np.zeros(L, np.int32)
        idx_pair = np.zeros((L, W), np.int32)
        sel_ij = np.zeros((L, W), np.int32)
        pair_ok = np.zeros((L, W), bool)
        for li, m in enumerate(masks):
            i = (m & -m).bit_length() - 1
            idx_bnd[li] = pos[k - 1][m ^ (1 << i)]
            sel_bi[li] = i
            col = 0
            for j in range(i + 1, K):
                if m >> j & 1:
                    idx_pair[li, col] = pos[k - 2][m ^ (1 << i) ^ (1 << j)]
                    sel_ij[li, col] = i * K + j
                    pair_ok[li, col] = True
                    col += 1
        tables.append(dict(idx_bnd=idx_bnd, sel_bi=sel_bi,
                           idx_pair=idx_pair, sel_ij=sel_ij,
                           pair_ok=pair_ok, size=L, gather=True))
    return tables


def _dp_from_tables_gather(Wm, Pm, Wb, Pb, tables, K: int):
    """The bitmask-DP level loop in GATHER form on level-major arrays.

    Same recurrence, tie-break rule, and parity bookkeeping as
    _dp_from_tables (tests pin bit-agreement on shared K), but dp lives
    as (L, R) with R = rows minor — every jnp.take row gather moves R
    contiguous floats — and the weight tables are transposed once to
    (K*K, R)/(K, R). For K >= 13 this is the only form that compiles on
    the tunneled v5e (see _build_level_indices)."""
    R = Wm.shape[0]
    big = jnp.asarray(np.float32(1e18), Wm.dtype)
    WmT = Wm.reshape(R, K * K).T                       # (K*K, R)
    PmT = Pm.reshape(R, K * K).T
    WbT = Wb.T                                         # (K, R)
    PbT = Pb.T

    dp_prev2 = None                                    # ((L2,R) c, (L2,R) p)
    dp_prev1 = (jnp.zeros((1, R), Wm.dtype), jnp.zeros((1, R), Wm.dtype))
    for k in range(1, K + 1):
        t = tables[k - 1]
        L = t["size"]
        W = K - 1
        ib = jnp.asarray(t["idx_bnd"])
        si = jnp.asarray(t["sel_bi"])
        cost_b = jnp.take(dp_prev1[0], ib, axis=0) \
            + jnp.take(WbT, si, axis=0)                # (L, R)
        par_b = (jnp.take(dp_prev1[1], ib, axis=0)
                 + jnp.take(PbT, si, axis=0)) % 2.0
        if k >= 2:
            ip = jnp.asarray(t["idx_pair"].reshape(-1))
            sij = jnp.asarray(t["sel_ij"].reshape(-1))
            ok = jnp.asarray(t["pair_ok"])             # (L, W)
            cost_p = (jnp.take(dp_prev2[0], ip, axis=0)
                      + jnp.take(WmT, sij, axis=0)).reshape(L, W, R)
            par_p = ((jnp.take(dp_prev2[1], ip, axis=0)
                      + jnp.take(PmT, sij, axis=0)) % 2.0).reshape(L, W, R)
            cost_p = jnp.where(ok[:, :, None], cost_p, big)
            cbest = jnp.min(cost_p, axis=1)            # (L, R)
            is_min = cost_p <= cbest[:, None, :]
            first = is_min & (jnp.cumsum(is_min.astype(jnp.int32), axis=1)
                              == 1)
            pbest = jnp.sum(jnp.where(first, par_p, 0.0), axis=1)
            use_b = cost_b <= cbest
            dp_k = (jnp.where(use_b, cost_b, cbest),
                    jnp.where(use_b, par_b, pbest))
        else:
            dp_k = (cost_b, par_b)
        dp_prev2, dp_prev1 = dp_prev1, dp_k

    return dp_prev1[1][0, :].astype(jnp.int32)         # level K: one mask


def _mask_tables(K: int):
    """Host lookup tables for the backtrace: masks grouped by popcount
    (ascending within each level, matching _build_level_tables) and the
    lowest-set-bit index of every K-bit mask."""
    by_pop = [[] for _ in range(K + 1)]
    for m in range(1 << K):
        by_pop[bin(m).count("1")].append(m)
    lowbit = np.zeros(1 << K, np.int32)
    for m in range(1, 1 << K):
        lowbit[m] = (m & -m).bit_length() - 1
    return by_pop, lowbit


def _dp_decode_trace(dets, dist, parity, tables, K: int):
    """Like _dp_decode but also EXTRACTS the matching via DP backtrace.

    Returns (pred (S,) int32 observable parity — bit-identical to
    _dp_decode, verified by tests; match (S, K) int32: per defect slot
    the matched slot index, K for a boundary match, -1 for unused slots;
    det_idx (S, K) int32: the detector index behind each slot, n_det for
    unused slots).

    The forward pass is the same matmul-level DP; its per-level costs are
    scattered into a flat (S, 2^K) subset-cost table, and a K-step
    backtrace replays the forward tie-break rule (boundary on <=, first
    minimizer in ascending-j order) with per-shot single-element gathers
    — recomputing each candidate as flat[m'] + w gives the exact same
    f32 sums the forward levels produced, so the traced matching is the
    one whose parity the forward pass returned.

    This is the correction EXTRACTION path (PyMatching's decode() returns
    corrections too, reference architecture/qec/decoders.py:14-17): it
    feeds windowed decoding and anything needing per-pair structure. Use
    _dp_decode when only the logical parity is needed — it is cheaper.
    """
    S, n_det = dets.shape
    big = jnp.asarray(np.float32(1e18), dist.dtype)
    oh_det, Wm, Pm, Wb, Pb = _slot_tables(dets, dist, parity, K)

    # ---- forward: same level loop, costs retained ----
    lvl_costs = [jnp.zeros((S, 1), dist.dtype)]
    dp_prev2 = None
    dp_prev1 = lvl_costs[0]
    for k in range(1, K + 1):
        t = tables[k - 1]
        L = t["size"]
        W = K - 1
        cost_b = _sel(dp_prev1, jnp.asarray(t["G_bnd"])) \
            + _sel(Wb, jnp.asarray(t["S_bi"]))
        if k >= 2:
            cost_p = (_sel(dp_prev2, jnp.asarray(t["G_pair"]))
                      + _sel(Wm.reshape(S, K * K), jnp.asarray(t["S_ij"]))
                      ).reshape(S, L, W)
            cost_p = jnp.where(jnp.asarray(t["pair_ok"])[None], cost_p, big)
            dp_k = jnp.minimum(cost_b, jnp.min(cost_p, axis=-1))
        else:
            dp_k = cost_b
        lvl_costs.append(dp_k)
        dp_prev2, dp_prev1 = dp_prev1, dp_k

    by_pop, lowbit_np = _mask_tables(K)
    flat = jnp.full((S, 1 << K), big)
    for k in range(K + 1):
        flat = flat.at[:, jnp.asarray(np.asarray(by_pop[k], np.int32))
                       ].set(lvl_costs[k])
    lowbit = jnp.asarray(lowbit_np)

    # ---- backtrace: K steps of per-shot scalar gathers ----
    nd = jnp.clip(jnp.sum(dets.astype(jnp.int32), axis=1), 0, K)
    mask0 = jnp.left_shift(1, nd) - 1                      # (S,)
    js = jnp.arange(K, dtype=jnp.int32)
    match0 = jnp.full((S, K), -1, jnp.int32)
    par0 = jnp.zeros((S,), jnp.int32)

    def body(_, state):
        mask, par, match = state
        active = mask > 0
        i = lowbit[mask]                                   # (S,)
        m1 = mask ^ jnp.left_shift(1, i)
        oh_i = js[None, :] == i[:, None]                   # (S, K)
        cost_b = (jnp.take_along_axis(flat, m1[:, None], axis=1)[:, 0]
                  + jnp.sum(jnp.where(oh_i, Wb, 0.0), axis=1))
        mj = m1[:, None] ^ jnp.left_shift(1, js)[None, :]  # (S, K)
        valid = (js[None, :] > i[:, None]) & \
            ((jnp.right_shift(mask[:, None], js[None, :]) & 1) == 1)
        Wi = jnp.sum(jnp.where(oh_i[:, :, None], Wm, 0.0), axis=1)  # (S, K)
        cost_p = jnp.take_along_axis(flat, mj, axis=1) + Wi
        cost_p = jnp.where(valid, cost_p, big)
        cbest = jnp.min(cost_p, axis=1)
        is_min = cost_p <= cbest[:, None]
        first = is_min & (jnp.cumsum(is_min.astype(jnp.int32), axis=1) == 1)
        jstar = jnp.sum(jnp.where(first, js[None, :], 0), axis=1)
        use_b = cost_b <= cbest
        oh_j = js[None, :] == jstar[:, None]
        Pi = jnp.sum(jnp.where(oh_i[:, :, None], Pm, 0.0), axis=1)
        p_pair = jnp.sum(jnp.where(oh_j, Pi, 0.0), axis=1)
        p_bnd = jnp.sum(jnp.where(oh_i, Pb, 0.0), axis=1)
        dpar = jnp.where(use_b, p_bnd, p_pair)
        par = par ^ (jnp.round(dpar).astype(jnp.int32) &
                     jnp.where(active, 1, 0))
        tgt_i = jnp.where(use_b, jnp.int32(K), jstar).astype(jnp.int32)
        match = jnp.where(active[:, None] & oh_i, tgt_i[:, None], match)
        match = jnp.where((active & ~use_b)[:, None] & oh_j,
                          i[:, None], match)
        newmask = jnp.where(use_b, m1,
                            m1 ^ jnp.left_shift(1, jstar))
        mask = jnp.where(active, newmask, mask)
        return mask, par, match

    mask, par, match = jax.lax.fori_loop(0, K, body, (mask0, par0, match0))
    # HIGHEST, not the bf16 default: detector indices above 256 are not
    # exactly representable in bf16, and a one-off index silently corrupts
    # the window bookkeeping built on det_idx at n_det > 256 (d >= 9)
    det_idx = jnp.round(
        jnp.einsum("skn,n->sk", oh_det,
                   jnp.arange(n_det, dtype=dist.dtype),
                   precision=jax.lax.Precision.HIGHEST)
        + (1.0 - jnp.sum(oh_det, axis=2)) * n_det).astype(jnp.int32)
    return par, match, det_idx


def _chunked_decode(fn, dets: np.ndarray, chunk: int) -> np.ndarray:
    """Run a jitted per-chunk decoder over all shots using ONE compiled
    shape: the trailing partial chunk is zero-padded to `chunk` (a second
    shape would trigger a full recompile — minutes on tunneled TPUs with
    the one-hot DP tables baked in as constants)."""
    S = dets.shape[0]
    outs = []
    for s0 in range(0, S, chunk):
        block = dets[s0:s0 + chunk]
        n = block.shape[0]
        if n < chunk:
            block = np.concatenate(
                [block, np.zeros((chunk - n,) + block.shape[1:],
                                 block.dtype)])
        outs.append(np.asarray(fn(jnp.asarray(block)))[:n])
    return np.concatenate(outs).astype(np.int64)


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
        self._trace_fn = jax.jit(partial(_dp_decode_trace, dist=self._dist,
                                         parity=self._par, tables=tables,
                                         K=max_defects))

    def decode_batch(self, detectors) -> np.ndarray:
        """detectors (S, n_det) -> predicted logical flip (S,) int64.
        Host entry point (chunks + fetches); use `decode_device` inside
        larger jitted pipelines."""
        dets = np.asarray(detectors, dtype=np.uint8)
        t0 = time.perf_counter()
        out = _chunked_decode(self._fn, dets, self.chunk)
        self.last_decode_seconds = time.perf_counter() - t0
        return out

    def decode_device(self, dets: jnp.ndarray) -> jnp.ndarray:
        """Jit-composable decode: (S, n_det) on device -> (S,) int32."""
        return self._fn(dets)

    def match_device(self, dets: jnp.ndarray):
        """Jit-composable matching EXTRACTION: (S, n_det) on device ->
        (pred (S,) int32, match (S, K) int32 slot pairing with K meaning
        boundary and -1 unused, det_idx (S, K) int32 detector index per
        slot, n_det for unused). pred is bit-identical to decode_device;
        the matching is the one realizing it (windowed decoding and
        correction output build on this)."""
        return self._trace_fn(dets)

    def overflow_fraction(self, detectors) -> float:
        """Fraction of shots whose defect count exceeds max_defects (those
        decode with only their first K defects)."""
        counts = np.asarray(detectors).sum(axis=1)
        return float(np.mean(counts > self.max_defects))


class HybridMatcherTPU:
    """Exact DP for shots within the defect budget, TPU-batched greedy for
    the overflow — both on device, one decision per shot.

    Motivation (examples/decoder_truncation.json): below threshold almost
    every shot fits K=12 and the DP is exactly MWPM; near/above threshold
    (d=7, p >= 8e-3) the overflow fraction approaches 1 and dropped
    defects cost ~2.7x in p_L, while greedy-32 stays within ~1.25x of the
    native decoder. Routing per shot gets the best of both everywhere."""

    def __init__(self, n_detectors: int, edges: np.ndarray, probs: np.ndarray,
                 obs: np.ndarray, max_defects: int = 12,
                 greedy_defects: int = 32, chunk: int = 8192):
        from .decoders import _greedy_decode_batch
        self.exact = ExactMatcherTPU(n_detectors, edges, probs, obs,
                                     max_defects=max_defects, chunk=chunk)
        self.max_defects = max_defects
        self.chunk = chunk
        g = self.exact.graph
        dist = jnp.asarray(g.dist.astype(np.float32))
        par = jnp.asarray(g.parity)
        K = max_defects

        def decode_chunk(dets):
            nd = jnp.sum(dets.astype(jnp.int32), axis=1)
            p_exact = self.exact._fn(dets)
            p_greedy = _greedy_decode_batch(dets, dist, par,
                                            greedy_defects).astype(jnp.int32)
            return jnp.where(nd <= K, p_exact, p_greedy)

        self._fn = jax.jit(decode_chunk)

    def decode_device(self, dets: jnp.ndarray) -> jnp.ndarray:
        return self._fn(dets)

    def decode_batch(self, detectors) -> np.ndarray:
        dets = np.asarray(detectors, dtype=np.uint8)
        t0 = time.perf_counter()
        out = _chunked_decode(self._fn, dets, self.chunk)
        self.last_decode_seconds = time.perf_counter() - t0
        return out


class TieredMatcherTPU:
    """Exact matching with per-shot cost tiering: a cheap K_light DP
    decodes every shot, and only the (rare) heavy shots are compacted and
    re-decoded by the full K_heavy DP.

    Below threshold the defect count is strongly concentrated (d=7
    p=1e-3: mean 2.3 defects, P(>6) ~ 3.7%), while the DP cost explodes
    with K (measured per 4096-shot chunk: K=6 7 ms, K=12 44 ms — the
    binomial level sizes C(K, K/2) dominate). Routing shots by defect
    count keeps every decode EXACT within the K_heavy budget at nearly
    the K_light price. Heavy shots are selected on device with top_k and
    gathered once ((capacity, n_det) rows), so the whole tier decision
    stays inside one jitted call.

    Shots beyond `heavy_capacity` (astronomically unlikely at the default
    capacity = chunk/8) or with more than K_heavy defects fall back to
    the truncated-defect rule; `overflow_fraction` quantifies both.
    """

    def __init__(self, n_detectors: int, edges: np.ndarray, probs: np.ndarray,
                 obs: np.ndarray, k_light: int = 6, k_heavy: int = 12,
                 chunk: int = 8192, heavy_capacity: int | None = None):
        if heavy_capacity is None:
            C = min(chunk, max(chunk // 8, 64))
        else:
            C = heavy_capacity
        if not 1 <= C <= chunk:
            raise ValueError(f"heavy_capacity must be in [1, chunk={chunk}]"
                             f"; got {C} (top_k cannot select more rows "
                             "than a chunk holds)")
        self.light = ExactMatcherTPU(n_detectors, edges, probs, obs,
                                     max_defects=k_light, chunk=chunk)
        self.heavy = ExactMatcherTPU(n_detectors, edges, probs, obs,
                                     max_defects=k_heavy, chunk=C)
        self.k_light = k_light
        self.max_defects = k_heavy
        self.chunk = chunk
        self.heavy_capacity = C
        light_fn, heavy_fn = self.light._fn, self.heavy._fn

        def decode_chunk(dets):
            # k is resolved per traced shape so decode_device accepts
            # batches smaller than heavy_capacity (e.g. inside other jits)
            k = min(C, dets.shape[0])
            nd = jnp.sum(dets.astype(jnp.int32), axis=1)
            p_light = light_fn(dets)
            _, hidx = jax.lax.top_k(nd, k)
            p_heavy = heavy_fn(jnp.take(dets, hidx, axis=0))
            is_heavy = jnp.take(nd, hidx, axis=0) > k_light
            upd = jnp.where(is_heavy, p_heavy,
                            jnp.take(p_light, hidx, axis=0))
            return p_light.at[hidx].set(upd)

        self._fn = jax.jit(decode_chunk)

    def decode_device(self, dets: jnp.ndarray) -> jnp.ndarray:
        """Jit-composable decode: (S, n_det) on device -> (S,) int32."""
        return self._fn(dets)

    def decode_batch(self, detectors) -> np.ndarray:
        dets = np.asarray(detectors, dtype=np.uint8)
        t0 = time.perf_counter()
        out = _chunked_decode(self._fn, dets, self.chunk)
        self.last_decode_seconds = time.perf_counter() - t0
        return out

    def overflow_fraction(self, detectors) -> float:
        """Shots decoded with a truncated defect set: more than K_heavy
        defects, or heavy shots past the per-chunk compaction capacity."""
        counts = np.asarray(detectors).sum(axis=1)
        S = counts.shape[0]
        n_trunc = int((counts > self.max_defects).sum())
        for s0 in range(0, S, self.chunk):
            c = counts[s0:s0 + self.chunk]
            # mirrors top_k selection: highest counts first, ties by
            # lower index (np stable sort of -c matches lax.top_k)
            order = np.argsort(-c, kind="stable")
            unsel = order[self.heavy_capacity:]
            # unselected heavy shots fall back to the K_light decode
            # (those > max_defects are already counted above)
            n_trunc += int(((c[unsel] > self.k_light)
                            & (c[unsel] <= self.max_defects)).sum())
        return float(n_trunc / max(S, 1))


def exact_matcher_for_circuit(circuit, max_defects: int = 12,
                              chunk: int = 8192,
                              hybrid: bool = False):
    from .dem import build_dem, dem_to_edges
    dem = build_dem(circuit)
    edges, probs, obs = dem_to_edges(dem)
    cls = HybridMatcherTPU if hybrid else ExactMatcherTPU
    return cls(circuit.n_detectors, edges, probs, obs,
               max_defects=max_defects, chunk=chunk)


def tiered_matcher_for_circuit(circuit, k_light: int = 6,
                               k_heavy: int = 12, chunk: int = 8192,
                               heavy_capacity: int | None = None):
    from .dem import build_dem, dem_to_edges
    dem = build_dem(circuit)
    edges, probs, obs = dem_to_edges(dem)
    return TieredMatcherTPU(circuit.n_detectors, edges, probs, obs,
                            k_light=k_light, k_heavy=k_heavy, chunk=chunk,
                            heavy_capacity=heavy_capacity)


__all__ = ["ExactMatcherTPU", "HybridMatcherTPU", "TieredMatcherTPU",
           "exact_matcher_for_circuit", "tiered_matcher_for_circuit"]
