"""Exact MWPM at any distance via ON-DEVICE cluster decomposition.

The sliding-window decoder (window_matcher.py) bounded per-DP defect
counts by windowing in TIME; this module bounds them by decomposing in
SPACE, the same theorem the native C++ decoder uses
(native/uf_decoder.cpp): a defect pair (i, j) with
D(i, j) >= D(i, B) + D(j, B) never appears in a minimum matching — two
boundary matches are at least as cheap — so connected components under
the strict adjacency D(i, j) < D(i, B) + D(j, B) match independently and
their minimum matchings compose to a global minimum. Below threshold,
error chains are short: components are overwhelmingly tiny (size <= 2 at
p = 1e-3 covers ~90% of defects; size > 12 is ~1e-3 of shots at d = 11),
so per-component exact DPs with SMALL budgets decode whole shots exactly
— no windows, no carry bookkeeping, no per-window K=12 sweeps.

Device pipeline (one jitted call per chunk):
  1. compact each shot's defects into MD slots — the slot one-hot comes
     straight from the cumsum-rank compare (NO scatter: a (S, n_det)
     index scatter measured 15.6 ms/chunk on v5e, ~45% of the decode),
  2. ONE bf16 one-hot pass builds everything pairwise the pipeline
     needs: the adjacency rule is precomputed HOST-SIDE IN f64 (the
     exact native tie semantics — no on-device distance compare, no
     tolerance) and fused with the path parity as a small-integer
     combo matrix 2*adj + parity (values 0..3, exactly bf16-
     representable, so even the bf16-ACCUMULATED selections are exact:
     every output sums exactly one nonzero product). Two extra hi/lo
     byte columns recover each slot's detector index from the same
     pass. Round-3's first cut selected three truncated-bf16 planes of
     the full f32 distance matrix per chunk (exact, but 3x the passes
     and an (S, MD+1, N+1) f32 intermediate each) — distances are now
     only materialized per DP ROW in step 5, which is ~4x less work,
  3. adjacency + transitive closure (log2(MD) batched bf16 0/1 matmuls,
     integer counts <= MD so bf16 accumulation is exact)
     -> per-slot component root = min reachable slot index,
  4. size-1 components: boundary parity, size-2: pair parity (for a
     2-component the direct edge IS the adjacency witness, so the pair
     beats two boundary matches by construction) — both elementwise,
  5. components of size 3+ are compacted chunk-wide (top_k over (S*MD)
     candidates) into per-component rows routed by size class to
     K = 6/8/10/12 bitmask DPs; each row's (K, K) weight/parity tables
     are built AT ROW SCALE from the member detector indices by one
     stacked one-hot pass over the truncated bf16 planes of dist
     (exact f32 reconstruction — _trunc_split3; these sub-f32 dots
     crash the tunneled v5e worker under lax.map, so chunks are driven
     from host loops — see the in-code note) and solved by the shared
     level loop (exact_matcher._dp_from_tables),
  6. per-component parities scatter-XOR back into per-shot parity.

Shots the device cannot certify-exactly decode raise the per-shot `ovf`
flag: more than MD defects, any component above k_big, or a size-class
overflowing its row capacity. Flagged shots (~1e-3 at d = 11, p = 1e-3)
are re-decoded WHOLE by the native C++ exact decoder — the same
decomposition with O(n^3) blossom for oversize components — so the
combined decoder is true MWPM at every distance.

This is the production PyMatching replacement the reference planned
(reference: architecture/qec/decoders.py:6-17, pymatching declared in
pyproject.toml:57 but never wired): batched, deterministic-shape, MXU
matmul-dominated decoding with a host tail measured in basis points.
"""
from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from .decoders import MatchingGraph
from .exact_matcher import (_build_level_indices, _build_level_tables,
                            _chunked_decode, _dp_from_tables,
                            _dp_from_tables_gather)


def _trunc_split3(M):
    """EXACT 3-way bf16 split of an f32 matrix by mantissa TRUNCATION.

    Masking the low 16 bits keeps the top 8 significant bits, so the
    three planes occupy non-overlapping bit ranges of the same sign:
    every partial sum is exactly representable and m1+m2+m3 == M
    bit-for-bit (8+8+8 = f32's 24 significant bits). Round-to-nearest
    casts do NOT have this property — a probe measured half-ulp drift
    on the reconstruction through a second selection stage.

    Returns (m1, m2, m3) as bfloat16 (each value exactly representable)."""
    def trunc(x):
        u = jax.lax.bitcast_convert_type(x, jnp.uint32)
        return jax.lax.bitcast_convert_type(
            u & np.uint32(0xFFFF0000), jnp.float32)
    m1 = trunc(M)
    r1 = M - m1
    m2 = trunc(r1)
    m3 = trunc(r1 - m2)                      # residual after m3 is 0
    return (m1.astype(jnp.bfloat16), m2.astype(jnp.bfloat16),
            m3.astype(jnp.bfloat16))


def _closure_root(adj, valid, MD: int):
    """Transitive closure by repeated boolean matmul squaring; returns
    each slot's component root = min reachable slot index (S, MD).

    Runs on bf16 0/1 operands with bf16 ACCUMULATION: every partial sum
    is an integer count <= MD <= 64, exactly representable in bf16, so
    the > 0 threshold is exact. Halving the closure traffic this way
    measured ~2x on the (S, MD, MD) squarings (they are bandwidth-bound
    — lane padding MD -> 128 makes each tensor carry ~5x its logical
    bytes)."""
    eye = jnp.eye(MD, dtype=jnp.bfloat16)
    R = jnp.maximum(adj.astype(jnp.bfloat16), eye[None])
    steps = max(1, int(np.ceil(np.log2(MD))))
    for _ in range(steps):
        R = (jax.lax.dot_general(
            R, R, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.bfloat16) > 0).astype(jnp.bfloat16)
    ks = jnp.arange(MD, dtype=jnp.int32)
    reach_idx = jnp.where((R > 0) & valid[:, None, :], ks[None, None, :], MD)
    root = jnp.min(reach_idx, axis=2)                    # (S, MD)
    return jnp.where(valid, root, MD)


class ClusterMatcherTPU:
    """Exact cluster-decomposition MWPM decoder on device.

    decode_device_with_overflow(dets) -> (parity (S,) int32, ovf (S,)
    bool). ovf-flagged shots carry a best-effort parity (their in-budget
    components are still decoded exactly) and should be escalated; the
    EscalatingClusterMatcher below does that against the native decoder.
    """

    def __init__(self, n_detectors: int, edges: np.ndarray,
                 probs: np.ndarray, obs: np.ndarray,
                 max_slots: int = 32, tiers=None, chunk: int = 4096,
                 small_rows_per_shot: float | None = None,
                 big_rows_per_shot: float | None = None,
                 cand_per_shot: int = 8):
        """tiers: ((lo, hi, K, rows_per_shot), ...) size-class DP routing;
        components of size lo..hi (hi <= K) go to a K-budget DP with a
        per-chunk row capacity of ceil(rows_per_shot * chunk). The
        defaults are sized from MEASURED per-shot component-size
        occupancy at p = 1e-3 (d=9: 0.41/0.053/0.034 per tier, d=11:
        0.59/0.134/0.147 — /tmp-profiled, see docs/TPU_ENGINES.md) with
        ~1.7x margin: DP cost scales linearly in capacity, and the old
        uniform 1.2/0.11/0.11 defaults both starved tier 2-3 at d=11 and
        paid ~2x dead rows at d<=9. Starved capacities FLAG shots, never
        truncate. The legacy small/big_rows_per_shot kwargs scale the
        K=6 / K>6 tiers. cand_per_shot bounds the per-shot DP-candidate
        compaction (shots holding more size>=3 roots flag).

        Every one-hot copy in the pipeline is EXACT — the chunk-wide
        pass selects small integers (2*adj + parity, hi/lo index bytes),
        the DP-row tables select truncated bf16 planes whose f32 sums
        reconstruct the f32 distances bit-for-bit (_trunc_split3), and
        the adjacency itself is precomputed host-side in f64 with the
        native strict tie rule — and differential tests pin the whole
        pipeline to the native f64 oracle. Do NOT compose the
        device decode under jax.lax.map on the tunneled v5e (sub-f32
        dots under map crash the worker); decode_batch's host chunk
        loop pipelines equally fast."""
        if tiers is None:
            # three size classes: each DP's level loop is LATENCY-bound
            # at realistic row counts (~12 x 2 sequential matmuls for
            # K=12 regardless of rows), so fewer, wider tiers beat a
            # finer size split (measured: 4-tier == 2-tier wall time)
            tiers = ((3, 6, 6, small_rows_per_shot or 0.8),
                     (7, 8, 8, (big_rows_per_shot or 0.5) * 0.5),
                     (9, 12, 12, (big_rows_per_shot or 0.5) * 0.5))
        for lo, hi, K, _rps in tiers:
            if not 2 < lo <= hi <= K <= 16:
                raise ValueError(f"bad tier ({lo},{hi},{K}): need "
                                 "2 < lo <= hi <= K <= 16 (the bitmask "
                                 "DP is exponential in K)")
        self.tiers = tiers = tuple(tiers)
        self.cand_per_shot = cand_per_shot
        k_big = max(t[2] for t in tiers)
        if max_slots < k_big:
            raise ValueError("max_slots must be >= the largest tier K")
        self.graph = MatchingGraph.from_edges(n_detectors, edges, probs, obs)
        self.n_detectors = n_detectors
        self.chunk = chunk
        self.max_slots = MD = max_slots
        self.k_big = k_big

        dist_np = self.graph.dist.astype(np.float32)             # (N+1,N+1)
        # unreachable pairs: finite sentinel (same convention as the
        # native decoder's C++ tables; inf-inf would NaN under algebra)
        dist_np[~np.isfinite(dist_np)] = np.float32(1e18)
        N = n_detectors
        par64 = self.graph.parity.astype(np.float64)
        # ---- host-f64 adjacency precompute: the EXACT native rule ----
        # adj[m, n] = D(m, n) < D(m, B) + D(n, B), strict, in f64 — the
        # identical comparison native/uf_decoder.cpp:643 makes, so the
        # decomposition matches the host oracle bit-for-bit (round-3's
        # first cut compared f32 distances on device and needed a 1e-5
        # relative tolerance to re-exclude rounded ties). The diagonal
        # (0 < 2 D(m,B), always true) is cleared here so no device eye
        # mask is needed; boundary row/col are strict-false on their own.
        D64 = self.graph.dist.astype(np.float64)
        D64[~np.isfinite(D64)] = 1e18
        db64 = D64[:, N]
        adj_np = D64 < (db64[:, None] + db64[None, :])
        np.fill_diagonal(adj_np, False)
        # fused combo matrix: 2*adj + path parity, values 0..3 — every
        # value exactly bf16-representable, and every one-hot selection
        # sums exactly ONE nonzero product, so bf16 ACCUMULATION is
        # exact end-to-end. Two extra byte columns (hi = idx >> 8,
        # lo = idx & 255, both <= 255 so bf16-exact) let the same pass
        # return each slot's detector index.
        combo_np = (2.0 * adj_np + par64).astype(np.float32)
        idx_np = np.arange(N + 1, dtype=np.int64)
        combo_aug = np.concatenate(
            [combo_np,
             (idx_np >> 8).astype(np.float32)[:, None],
             (idx_np & 255).astype(np.float32)[:, None]],
            axis=1)                                        # (N+1, N+3)
        combo_b = jnp.asarray(combo_aug).astype(jnp.bfloat16)
        # stacked truncated-bf16 planes of dist + the parity plane, used
        # ONLY for the per-DP-row weight tables (step 5): one (N+1,
        # 4(N+1)) matrix so each row's tables need a single stacked pass
        dist = jnp.asarray(dist_np)
        p1_, p2_, p3_ = _trunc_split3(dist)
        par_b = jnp.asarray(par64.astype(np.float32)).astype(jnp.bfloat16)
        planes_stack = jnp.concatenate([p1_, p2_, p3_, par_b], axis=1)
        # K <= 12 tiers run the one-hot matmul DP (MXU form); K >= 13
        # tiers use the gather DP — their one-hot tables would exceed the
        # tunnel's remote-compile request limit (HTTP 413) and HBM sense
        # (K=14 mid-level M_pair alone ~392 MB f32)
        tier_tabs = [(lo, hi, K,
                      (_build_level_indices(K) if K > 12
                       else _build_level_tables(K)),
                      max(64, min(int(np.ceil(rps * chunk)), chunk * MD)))
                     for lo, hi, K, rps in tiers]
        self.tier_capacities = {(lo, hi): cap
                                for lo, hi, _, _, cap in tier_tabs}

        def comp_rows_dp(sel_flat, det_idx, member, size,
                         lo, hi, K, tables, cap):
            """Gather `cap` component rows selected by flat (S*MD) index,
            build their (K, K) weight/parity tables at ROW scale from the
            stacked dist planes, and solve with the K-budget DP. Returns
            (row parity (cap,), row shot id (cap,), row valid (cap,))."""
            s_id = sel_flat // MD                          # (cap,)
            r_id = sel_flat % MD
            mem = member[s_id, r_id]                       # (cap, MD) bool
            sz = size[s_id, r_id]
            ok = (sz >= lo) & (sz <= hi)
            # compact member slots into K DP positions (rank order)
            mrank = jnp.cumsum(mem.astype(jnp.int32), axis=1) * mem
            rowsc = jnp.arange(cap, dtype=jnp.int32)[:, None]
            msl = jnp.full((cap, K + 1), -1, jnp.int32)
            msl = msl.at[rowsc, jnp.clip(mrank - 1, 0, K)].max(
                jnp.where(mem & (mrank <= K),
                          jnp.arange(MD, dtype=jnp.int32)[None, :], -1))
            # unfilled DP slots -> the boundary index MD (free, parity 0)
            msl = jnp.where(msl[:, :K] < 0, MD, msl[:, :K])   # (cap, K)
            # member DETECTOR indices (absent DP slots -> boundary N:
            # dist[B, B] = 0 free, parity 0 — _slot_tables' convention)
            mdet = jnp.where(
                msl < MD,
                jnp.take_along_axis(det_idx[s_id],
                                    jnp.clip(msl, 0, MD - 1), axis=1),
                N)                                         # (cap, K)
            ohr = (mdet[:, :, None]
                   == jnp.arange(N + 1, dtype=jnp.int32)[None, None, :]
                   ).astype(jnp.bfloat16)                  # (cap, K, N+1)
            # one stacked pass over [plane1|plane2|plane3|parity]: each
            # selected value is exactly bf16-representable, so bf16
            # accumulation is exact; the f32 sum of the three selected
            # planes reconstructs the f32 distance bit-for-bit
            Tr = jax.lax.dot_general(
                ohr, planes_stack, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.bfloat16)       # (cap,K,4(N+1))
            Tr4 = Tr.reshape(cap, K * 4, N + 1)
            M4 = jax.lax.dot_general(
                Tr4, ohr, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32
            ).reshape(cap, K, 4, K)
            Wm = M4[:, :, 0] + M4[:, :, 1] + M4[:, :, 2]   # (cap, K, K)
            Pm = M4[:, :, 3]
            Tb = Tr.reshape(cap, K, 4, N + 1)[:, :, :, N].astype(
                jnp.float32)                               # (cap, K, 4)
            Wb = Tb[:, :, 0] + Tb[:, :, 1] + Tb[:, :, 2]
            Pb = Tb[:, :, 3]
            dp = (_dp_from_tables_gather if tables[0].get("gather")
                  else _dp_from_tables)
            rp = dp(Wm, Pm, Wb, Pb, tables, K)
            return jnp.where(ok, rp, 0), s_id, ok

        e_bnd = jnp.zeros((N + 1,), jnp.bfloat16).at[N].set(1)

        def decode_chunk(dets):
            S = dets.shape[0]
            bits = dets.astype(jnp.int32)
            nd = jnp.sum(bits, axis=1)                     # (S,)
            rank = jnp.cumsum(bits, axis=1) * bits         # 1-based
            # --- 1+2. slot one-hot + the fused combo pass ---
            # the slot -> detector one-hot comes straight from the rank
            # compare (slot k holds the (k+1)-th set bit) — NO scatter:
            # a (S, n_det) -> (S, MD) index scatter measured 15.6 ms per
            # 4096-chunk on v5e, ~45% of the whole decode. Invalid slots
            # (rank never matches) and the appended boundary slot get the
            # boundary column N, exactly _slot_tables' convention.
            # ONE bf16 pass selects adjacency+parity (combo values 0..3)
            # and the hi/lo detector-index bytes; bf16 accumulation is
            # exact because each output sums exactly one nonzero product.
            # CAVEAT: sub-f32 dots deterministically crash the tunneled
            # v5e worker when the call sits under jax.lax.map (kernel
            # fault, probed 2026-08) — drive chunks from a HOST loop
            # (async dispatch pipelines them; measured equal to lax.map).
            ks1 = jnp.arange(1, MD + 1, dtype=jnp.int32)
            oh_det = (rank[:, None, :] == ks1[None, :, None])
            valid = jnp.any(oh_det, axis=2)                # (S, MD)
            ohb = jnp.concatenate(
                [jnp.pad(oh_det, ((0, 0), (0, 0), (0, 1))
                         ).astype(jnp.bfloat16)
                 + (~valid).astype(jnp.bfloat16)[:, :, None]
                 * e_bnd[None, None, :],
                 jnp.broadcast_to(e_bnd, (S, 1, N + 1))],
                axis=1)                                    # (S, MD+1, N+1)

            T = jax.lax.dot_general(
                ohb, combo_b, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.bfloat16)       # (S, MD+1, N+3)
            det_idx = (T[:, :MD, N + 1].astype(jnp.int32) * 256
                       + T[:, :MD, N + 2].astype(jnp.int32))   # (S, MD)
            C = jax.lax.dot_general(
                T[:, :, :N + 1], ohb, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)        # (S,MD+1,MD+1)
            adjC = C >= 1.5
            # path parity for ALL slot pairs incl. the boundary column
            # (exact 0/1 floats: combo - 2*adj)
            PP = C - 2.0 * jnp.where(adjC, 1.0, 0.0)
            # --- 3. components under D(i,j) < D(i,B) + D(j,B) ---
            # the adjacency was precomputed HOST-SIDE in f64 with the
            # strict native tie rule (see combo build above): boundary
            # pairs and the diagonal are false by construction, and
            # invalid slots select the boundary row — so the slice IS
            # the component adjacency, no masking, no tolerance.
            adj = adjC[:, :MD, :MD]
            root = _closure_root(adj, valid, MD)           # (S, MD)
            ks = jnp.arange(MD, dtype=jnp.int32)
            member = (root[:, :, None] == ks[None, None, :]).transpose(
                (0, 2, 1)) & valid[:, None, :]             # (S, r, k)
            size = jnp.sum(member.astype(jnp.int32), axis=2)   # (S, MD)
            # --- 4. analytic size-1 / size-2 components ---
            # `size` is nonzero ONLY on root slots (non-root member rows
            # are empty), so (size == 1) alone picks singleton roots and
            # (size == 2) pair roots. Pair parity is the masked row-sum
            # of PP over the member mask: PP's diagonal is 0 (path i->i,
            # combo diag = parity diag = 0), so the sum is exactly the
            # root->partner path parity. All in f32 — parities are exact
            # 0/1 floats out of the combo selection, and round/astype
            # chains materializing (S, MD, MD) int32 intermediates
            # measured ~9 ms of a 26 ms d=9 chunk (lane-padded 33 -> 128,
            # so every extra tensor costs 4x its logical bytes).
            p1 = jnp.sum(jnp.where(size == 1, PP[:, :MD, MD], 0.0), axis=1)
            pr2 = jnp.sum(member * PP[:, :MD, :MD], axis=2)    # (S, r)
            p2 = jnp.sum(jnp.where(size == 2, pr2, 0.0), axis=1)
            parity = jnp.round(p1 + p2).astype(jnp.int32) & 1
            # --- 5. DP rows per size-class tier ---
            # per-shot candidate compaction first: each shot holds at
            # most a handful of size>=3 roots (measured 0.5/shot at d=9,
            # 0.9/shot at d=11, p=1e-3), so tier routing top_ks run over
            # the (S, R) candidate set instead of the full (S*MD) flat
            # mask — the global top_k was measured superlinear and
            # dominated chunk cost (16 ms of an 82 ms 8192-chunk at
            # d=9). lax.top_k is stable (lowest index first), so
            # candidates beyond the first R leave their tier underserved
            # and flag the shot via the served < n_want check below.
            is_dp = size >= 3
            R = min(self.cand_per_shot, MD)
            cval, cslot = jax.lax.top_k(is_dp.astype(jnp.int32), R)
            csize = jnp.take_along_axis(size, cslot, axis=1)   # (S, R)
            # surplus top_k rows (cval == 0) land on size<=2 slots, so
            # the per-tier size-range check already excludes them
            flat_cand = (jnp.arange(S, dtype=jnp.int32)[:, None] * MD
                         + cslot).reshape(S * R)
            dp_par = jnp.zeros((S,), jnp.int32)
            starved = jnp.zeros((S,), bool)
            covered = (size <= 2)
            for lo, hi, K, tabs, cap in tier_tabs:
                in_tier = (size >= lo) & (size <= hi)
                covered = covered | in_tier
                in_tier_c = (cval > 0) & (csize >= lo) & (csize <= hi)
                _, sel_c = jax.lax.top_k(
                    in_tier_c.astype(jnp.int32).reshape(S * R),
                    min(cap, S * R))
                sel = jnp.take(flat_cand, sel_c)
                rp, sid, ok = comp_rows_dp(sel, det_idx, member, size,
                                           lo, hi, K, tabs,
                                           min(cap, S * R))
                dp_par = dp_par.at[sid].add(rp & 1)
                n_want = jnp.sum(in_tier.astype(jnp.int32), axis=1)
                served = jnp.zeros((S,), jnp.int32).at[sid].add(
                    ok.astype(jnp.int32))
                starved = starved | (served < n_want)
            parity = parity ^ (dp_par & 1)
            # --- 6. escalation flags ---
            ovf = ((nd > MD)
                   | jnp.any((size > 0) & ~covered, axis=1)
                   | starved)
            return parity, ovf

        self._fn = jax.jit(decode_chunk)

    def decode_device_with_overflow(self, dets: jnp.ndarray):
        """Jit-composable: (S, n_det) uint8 -> (parity (S,) int32,
        ovf (S,) bool)."""
        return self._fn(dets)

    def decode_device(self, dets: jnp.ndarray) -> jnp.ndarray:
        return self._fn(dets)[0]

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
        """Fraction of shots the device could not certify-exactly decode
        (these need escalation)."""
        dets = np.asarray(detectors, dtype=np.uint8)
        ovf_fn = lambda x: self._fn(x)[1].astype(jnp.int32)  # noqa: E731
        ovf = _chunked_decode(ovf_fn, dets, self.chunk)
        return float(ovf.mean())


class EscalatingClusterMatcher:
    """ClusterMatcherTPU + native host re-decode of flagged shots: true
    MWPM at any distance, host tail ~1e-3 of shots below threshold."""

    def __init__(self, n_detectors: int, edges: np.ndarray,
                 probs: np.ndarray, obs: np.ndarray, chunk: int = 4096,
                 **kw):
        from .native import NativeMatchingDecoder
        self.cluster = ClusterMatcherTPU(n_detectors, edges, probs, obs,
                                         chunk=chunk, **kw)
        self.native = NativeMatchingDecoder(n_detectors, edges, probs, obs)
        self.chunk = chunk
        self.last_flagged_fraction = 0.0

    def decode_device_with_overflow(self, dets):
        return self.cluster.decode_device_with_overflow(dets)

    def decode_flagged_host(self, dets_flagged: np.ndarray) -> np.ndarray:
        return self.native.decode_batch_ex(
            dets_flagged, mode=0)["pred"].astype(np.int64) & 1

    def decode_batch(self, detectors) -> np.ndarray:
        dets = np.asarray(detectors, dtype=np.uint8)
        t0 = time.perf_counter()
        S = dets.shape[0]
        preds = np.empty(S, np.int64)
        n_flagged = 0
        fn = self.cluster._fn
        # dispatch EVERY chunk first (async), then drain in order and run
        # the host escalation of chunk i while chunks i+1.. are still
        # executing on the device — the native re-decode rides inside the
        # device wall-clock instead of after it (the host has one core;
        # overlap is the only way escalation can be free)
        pending = []
        for s0 in range(0, S, self.chunk):
            block = dets[s0:s0 + self.chunk]
            n = block.shape[0]
            if n < self.chunk:
                block = np.concatenate(
                    [block, np.zeros((self.chunk - n,) + block.shape[1:],
                                     block.dtype)])
            pending.append((s0, n, fn(jnp.asarray(block))))
        for s0, n, (p, o) in pending:
            pr = np.asarray(p)[:n].astype(np.int64)
            ov = np.asarray(o)[:n]
            loc = np.nonzero(ov)[0]
            if loc.size:
                pr[loc] = self.decode_flagged_host(dets[s0 + loc])
                n_flagged += loc.size
            preds[s0:s0 + n] = pr
        self.last_flagged_fraction = n_flagged / max(S, 1)
        self.last_decode_seconds = time.perf_counter() - t0
        return preds

    def overflow_fraction(self, detectors) -> float:
        return self.cluster.overflow_fraction(detectors)


def default_tiers(n_detectors: int):
    """Occupancy-sized tier routing (measured per-shot size>=3 root
    counts at p = 1e-3: d=9 -> 0.41/0.053/0.034 per tier, d=11 ->
    0.59/0.134/0.147). DP cost is linear in capacity — the K=12 tier at
    a d=11-safe 0.25 rows/shot measured ~12 ms of a 26 ms d=9 chunk
    while its true d=9 demand was 0.034 — so smaller circuits get caps
    sized to THEIR tail (starved shots flag to the exact host decoder;
    accuracy is unaffected either way)."""
    if n_detectors <= 512:            # d <= 9 memory-circuit class
        return ((3, 6, 6, 0.8), (7, 8, 8, 0.12), (9, 12, 12, 0.08))
    # d=11 class: splitting the top tier K=10/K=12 (a K=10 DP is ~4x
    # cheaper per row and sizes 9-10 outnumber 11-12) measured +5% e2e.
    # Component occupancy per shot is LINEAR in n_det at fixed p (below
    # threshold, components are local), so capacities sized at the d=11
    # measurement scale by n_det/720 — without this, d=13's ~1.6x higher
    # demand starves every tier chunk-wide and flags ~20% of shots that
    # the device could have decoded exactly (measured: 35.7% total
    # escalation at d=13 vs 7.8% at d=11).
    if n_detectors <= 900:
        r = max(1.0, n_detectors / 720.0)
        return ((3, 6, 6, 0.9 * r), (7, 8, 8, 0.2 * r),
                (9, 10, 10, 0.16 * r), (11, 12, 12, 0.12 * r))
    # d >= 13 class: K <= 12 DP tiers + host escalation of the rest.
    # The round-4 default added gather-form K=14/16 tiers here; the
    # per-tier cost profile (examples/profile_d13_tiers.json, measured
    # on-chip at d=13, p=1e-3, 32k shots) showed they price EVERY chunk
    # for a 13-16-defect occupancy of ~0.16/shot and crush device
    # throughput 145k -> 29k shots/s while the escalation they save
    # (0.360 -> 0.197) is worth only 3.9e-6 s/shot at the measured
    # 41.8k-flagged-shots/s host rate. Pipelined e2e ceilings: K<=12
    # 116k (host-bound), K<=14 79k, K<=16 29k (device-bound) — the
    # K<=12 ladder wins by 1.5-4x. The gather-form K=14/16 tiers stay
    # available by explicit tiers=((..., (13,14,14,c), (15,16,16,c)))
    # for hosts with faster escalation decode.
    r = max(1.0, n_detectors / 1176.0)
    return ((3, 6, 6, 1.0 * r), (7, 8, 8, 0.25 * r),
            (9, 10, 10, 0.21 * r), (11, 12, 12, 0.19 * r))


def cluster_matcher_for_circuit(circuit, chunk: int | None = None,
                                escalating: bool = False, **kw):
    from .dem import build_dem, dem_to_edges
    dem = build_dem(circuit)
    edges, probs, obs = dem_to_edges(dem)
    if chunk is None:
        # the (S, MD+1, n_det+1) slot one-hot and the bf16 combo pass
        # scale with n_det; since the combo rewrite dropped the three
        # (S, MD+1, n_det+1) f32 plane intermediates, 4096-shot chunks
        # are stable through d=13 (n_det ~ 1176) on the tunneled v5e
        chunk = 4096
    kw.setdefault("tiers", default_tiers(circuit.n_detectors))
    # 24 slots everywhere: the MD-scaling stages dominate device decode
    # (MD=32 measured 2.8x slower per chunk at d=13 on v5e), while the
    # >24-defect tail it flags (~2% at d=13, p=1e-3) is cheap for the
    # exact host escalation that d>=13 already needs for size>12
    # components
    kw.setdefault("max_slots", 24)
    cls = EscalatingClusterMatcher if escalating else ClusterMatcherTPU
    return cls(circuit.n_detectors, edges, probs, obs, chunk=chunk, **kw)


__all__ = ["ClusterMatcherTPU", "EscalatingClusterMatcher",
           "cluster_matcher_for_circuit", "default_tiers"]
