// Native matching decoder for the QEC layer: EXACT MWPM at any distance.
// Small defect sets go through a bitmask DP; larger shots are split by
// exact cluster decomposition — a pair (i, j) with D(i,j) >= D(i,B) +
// D(j,B) can always be replaced by two boundary matches at no extra cost,
// so connected components under the strict adjacency D(i,j) < D(i,B) +
// D(j,B) match independently and the union of per-component minimum
// matchings is a global minimum matching. Components up to 12 defects get
// the exact DP; larger ones (bulk components reach 16-30 defects at
// d >= 11) get O(n^3) weighted blossom matching — still exact, measured
// 90k shots/s at d=11, p=1e-3 on one core (the old 2^k DP managed 431
// shots/s on the same tail). Greedy + 2-opt survives only as the
// >120-defect fallback; the per-shot `exact` flag records it.
//
// Host-side counterpart of qec/decoders.MatchingDecoder: consumes the same
// precomputed all-pairs shortest-path distance / observable-parity tables
// and decodes batches of syndromes with greedy minimum-weight pairing plus
// a 2-opt refinement pass (closer to exact MWPM than pure greedy).
//
// Exposed via a C ABI for ctypes (no pybind11 dependency).
//
// Build: make -C native   (produces libufdecode.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <deque>
#include <limits>
#include <vector>

namespace {

constexpr double kInf = std::numeric_limits<double>::infinity();

struct Ctx {
    int n_nodes;                 // detectors + 1 boundary (index n_nodes-1)
    std::vector<double> dist;    // (n_nodes * n_nodes)
    std::vector<int32_t> parity; // (n_nodes * n_nodes)

    inline double D(int a, int b) const { return dist[a * n_nodes + b]; }
    inline int P(int a, int b) const { return parity[a * n_nodes + b]; }
};

// Exact minimum-weight matching with boundary via bitmask DP, O(2^k k).
// Every defect either pairs with another defect (direct path cost) or
// with the boundary; this is exact MWPM on the complete defect graph.
constexpr int kExactMaxDefects = 12;    // direct-DP budget for whole shots
constexpr int kClusterMaxExact = 20;    // per-component DP budget (2^20)

int decode_exact(const Ctx& ctx, const std::vector<int>& defects,
                 std::vector<double>& dp, std::vector<int8_t>& choice,
                 double* out_cost = nullptr) {
    const int B = ctx.n_nodes - 1;
    const int k = static_cast<int>(defects.size());
    const int full = 1 << k;
    dp.assign(full, kInf);
    choice.assign(full, -2);
    dp[0] = 0.0;
    for (int S = 1; S < full; ++S) {
        int i = __builtin_ctz(S);
        int S1 = S ^ (1 << i);
        double best = ctx.D(defects[i], B) + dp[S1];
        int8_t bj = -1;
        for (int rest = S1; rest; rest &= rest - 1) {
            int j = __builtin_ctz(rest);
            double c = ctx.D(defects[i], defects[j]) + dp[S1 ^ (1 << j)];
            if (c < best) { best = c; bj = static_cast<int8_t>(j); }
        }
        dp[S] = best;
        choice[S] = bj;
    }
    if (out_cost) *out_cost += dp[full - 1];
    int par = 0;
    int S = full - 1;
    while (S) {
        int i = __builtin_ctz(S);
        int8_t bj = choice[S];
        if (bj < 0) {
            par ^= ctx.P(defects[i], B);
            S ^= 1 << i;
        } else {
            par ^= ctx.P(defects[i], defects[bj]);
            S ^= (1 << i) | (1 << bj);
        }
    }
    return par;
}

// Greedy min-weight pairing over effective costs
// (direct path vs both-to-boundary), then 2-opt improvement.
int decode_greedy(const Ctx& ctx, const std::vector<int>& defects,
                  double* out_cost = nullptr) {
    const int B = ctx.n_nodes - 1;
    const int k = static_cast<int>(defects.size());
    if (k == 0) return 0;

    // partner[i] = index into defects, or -1 for boundary
    std::vector<int> partner(k, -2);
    std::vector<char> used(k, 0);

    auto eff_cost = [&](int a, int b) {
        double direct = ctx.D(defects[a], defects[b]);
        double via = ctx.D(defects[a], B) + ctx.D(defects[b], B);
        return direct <= via ? direct : via;
    };

    int remaining = k;
    while (remaining >= 2) {
        double best = kInf;
        int bi = -1, bj = -1;
        for (int i = 0; i < k; ++i) {
            if (used[i]) continue;
            for (int j = i + 1; j < k; ++j) {
                if (used[j]) continue;
                double c = eff_cost(i, j);
                if (c < best) { best = c; bi = i; bj = j; }
            }
        }
        if (bi < 0) break;
        partner[bi] = bj;
        partner[bj] = bi;
        used[bi] = used[bj] = 1;
        remaining -= 2;
    }
    for (int i = 0; i < k; ++i)
        if (!used[i]) { partner[i] = -1; used[i] = 1; }

    // 2-opt: try re-pairing (a,b),(c,d) -> (a,c),(b,d) or (a,d),(b,c)
    bool improved = true;
    int rounds = 0;
    while (improved && rounds++ < 8) {
        improved = false;
        for (int a = 0; a < k; ++a) {
            int b = partner[a];
            if (b < a) continue;  // visit each pair once; skip boundary(-1)
            for (int c = a + 1; c < k; ++c) {
                if (c == b) continue;
                int d = partner[c];
                if (d >= 0 && d < c) continue;
                double cur = (b >= 0 ? eff_cost(a, b) : ctx.D(defects[a], B))
                           + (d >= 0 ? eff_cost(c, d) : ctx.D(defects[c], B));
                // swap 1: (a,c) + (b,d)
                double alt1 = eff_cost(a, c)
                            + ((b >= 0 && d >= 0) ? eff_cost(b, d)
                               : (b >= 0 ? ctx.D(defects[b], B)
                                         : (d >= 0 ? ctx.D(defects[d], B) : 0.0)));
                if (alt1 + 1e-12 < cur) {
                    partner[a] = c; partner[c] = a;
                    if (b >= 0 && d >= 0) { partner[b] = d; partner[d] = b; }
                    else if (b >= 0) partner[b] = -1;
                    else if (d >= 0) partner[d] = -1;
                    improved = true;
                    break;
                }
            }
        }
    }

    // accumulate observable parity
    int par = 0;
    std::vector<char> counted(k, 0);
    for (int i = 0; i < k; ++i) {
        if (counted[i]) continue;
        int j = partner[i];
        if (j < 0) {
            par ^= ctx.P(defects[i], B);
            if (out_cost) *out_cost += ctx.D(defects[i], B);
            counted[i] = 1;
        } else {
            double direct = ctx.D(defects[i], defects[j]);
            double via = ctx.D(defects[i], B) + ctx.D(defects[j], B);
            if (direct <= via) {
                par ^= ctx.P(defects[i], defects[j]);
                if (out_cost) *out_cost += direct;
            } else {
                par ^= ctx.P(defects[i], B) ^ ctx.P(defects[j], B);
                if (out_cost) *out_cost += via;
            }
            counted[i] = counted[j] = 1;
        }
    }
    return par;   // full observable bitmask (bit k = observable k)
}

// ---------------------------------------------------------------------------
// Exact MWPM in polynomial time: O(n^3) weighted blossom matching.
//
// The 2^k bitmask DP above is exponential in the component defect count;
// at d >= 11, p = 1e-3 the exact cluster decomposition routinely yields
// 16-30-defect components (bulk defects are all pairwise closer than
// their summed boundary distances), which the DP decodes at ~400 shots/s
// — far too slow for the device decoder's host-escalation path
// (window_matcher.EscalatingWindowMatcher). This is the role PyMatching's
// blossom fills in the reference design (architecture/qec/decoders.py:6).
//
// Reduction (standard, exact): complete graph over the k defects with
//   w'(i, j) = min(D(i, j), D(i, B) + D(j, B))
// plus one virtual node with w'(i, v) = D(i, B) when k is odd. A minimum
// weight PERFECT matching of this graph has the same cost as MWPM with a
// boundary: pairs taking the boundary route stand for two boundary
// matches, the virtual node for the odd defect matched to the boundary.
//
// The solver is the classic O(n^3) maximum-weight general matching with
// dual variables and blossom contraction (Galil's formulation); minimum
// perfect matching is obtained by maximizing C - w with C large enough
// that higher-cardinality matchings always dominate. Weights are doubles
// quantized to integers at 2^20 per unit, so duals stay exact; matchings
// within ~1e-6 x k of optimal cost are tie-equivalent (physically
// degenerate). Verified against the bitmask-DP oracle in
// tests/test_qec.py::TestBlossomMatching.
// ---------------------------------------------------------------------------

struct Blossom {
    typedef long long ll;
    static constexpr ll kInfW = std::numeric_limits<ll>::max() / 4;
    struct E { int u, v; ll w; };

    int n = 0, n_x = 0, N = 0;
    std::vector<E> g;                  // (N+1)^2 adjacency, 1-indexed
    std::vector<ll> lab;
    std::vector<int> match_, slack_, st, pa, S_, vis;
    std::vector<int> flower_from;      // (N+1)^2
    std::vector<std::vector<int>> flower;
    std::deque<int> q;
    int vis_t = 0;

    void reserve(int max_real_nodes) {
        int need = 2 * max_real_nodes + 2;
        if (N >= need) return;
        N = need;
        g.assign(static_cast<size_t>(N + 1) * (N + 1), E{0, 0, 0});
        lab.assign(N + 1, 0);
        match_.assign(N + 1, 0);
        slack_.assign(N + 1, 0);
        st.assign(N + 1, 0);
        pa.assign(N + 1, 0);
        S_.assign(N + 1, 0);
        vis.assign(N + 1, 0);
        flower_from.assign(static_cast<size_t>(N + 1) * (N + 1), 0);
        flower.assign(N + 1, {});
    }

    E& edge(int u, int v) { return g[static_cast<size_t>(u) * (N + 1) + v]; }
    int& ffrom(int b, int x) {
        return flower_from[static_cast<size_t>(b) * (N + 1) + x];
    }

    ll e_delta(const E& e) { return lab[e.u] + lab[e.v] - edge(e.u, e.v).w * 2; }

    void update_slack(int u, int x) {
        if (!slack_[x] || e_delta(edge(u, x)) < e_delta(edge(slack_[x], x)))
            slack_[x] = u;
    }

    void set_slack(int x) {
        slack_[x] = 0;
        for (int u = 1; u <= n; ++u)
            if (edge(u, x).w > 0 && st[u] != x && S_[st[u]] == 0)
                update_slack(u, x);
    }

    void q_push(int x) {
        if (x <= n) { q.push_back(x); return; }
        for (size_t i = 0; i < flower[x].size(); ++i) q_push(flower[x][i]);
    }

    void set_st(int x, int b) {
        st[x] = b;
        if (x > n)
            for (size_t i = 0; i < flower[x].size(); ++i)
                set_st(flower[x][i], b);
    }

    int get_pr(int b, int xr) {
        int pr = static_cast<int>(
            std::find(flower[b].begin(), flower[b].end(), xr)
            - flower[b].begin());
        if (pr % 2 == 1) {
            std::reverse(flower[b].begin() + 1, flower[b].end());
            return static_cast<int>(flower[b].size()) - pr;
        }
        return pr;
    }

    void set_match(int u, int v) {
        match_[u] = edge(u, v).v;
        if (u <= n) return;
        E& e = edge(u, v);
        int xr = ffrom(u, e.u);
        int pr = get_pr(u, xr);
        for (int i = 0; i < pr; ++i)
            set_match(flower[u][i], flower[u][i ^ 1]);
        set_match(xr, v);
        std::rotate(flower[u].begin(), flower[u].begin() + pr,
                    flower[u].end());
    }

    void augment(int u, int v) {
        for (;;) {
            int xnv = st[match_[u]];
            set_match(u, v);
            if (!xnv) return;
            set_match(xnv, st[pa[xnv]]);
            u = st[pa[xnv]];
            v = xnv;
        }
    }

    int get_lca(int u, int v) {
        for (++vis_t; u || v; std::swap(u, v)) {
            if (u == 0) continue;
            if (vis[u] == vis_t) return u;
            vis[u] = vis_t;
            u = st[match_[u]];
            if (u) u = st[pa[u]];
        }
        return 0;
    }

    void add_blossom(int u, int lca, int v) {
        int b = n + 1;
        while (b <= n_x && st[b]) ++b;
        if (b > n_x) ++n_x;
        lab[b] = 0;
        S_[b] = 0;
        match_[b] = match_[lca];
        flower[b].clear();
        flower[b].push_back(lca);
        for (int x = u, y; x != lca; x = st[pa[y]]) {
            flower[b].push_back(x);
            flower[b].push_back(y = st[match_[x]]);
            q_push(y);
        }
        std::reverse(flower[b].begin() + 1, flower[b].end());
        for (int x = v, y; x != lca; x = st[pa[y]]) {
            flower[b].push_back(x);
            flower[b].push_back(y = st[match_[x]]);
            q_push(y);
        }
        set_st(b, b);
        for (int x = 1; x <= n_x; ++x)
            edge(b, x).w = edge(x, b).w = 0;
        for (int x = 1; x <= n; ++x) ffrom(b, x) = 0;
        for (size_t i = 0; i < flower[b].size(); ++i) {
            int xs = flower[b][i];
            for (int x = 1; x <= n_x; ++x)
                if (edge(b, x).w == 0
                    || e_delta(edge(xs, x)) < e_delta(edge(b, x))) {
                    edge(b, x) = edge(xs, x);
                    edge(x, b) = edge(x, xs);
                }
            for (int x = 1; x <= n; ++x)
                if (ffrom(xs, x)) ffrom(b, x) = xs;
        }
        set_slack(b);
    }

    void expand_blossom(int b) {
        for (size_t i = 0; i < flower[b].size(); ++i)
            set_st(flower[b][i], flower[b][i]);
        int xr = ffrom(b, edge(b, pa[b]).u);
        int pr = get_pr(b, xr);
        for (int i = 0; i < pr; i += 2) {
            int xs = flower[b][i];
            int xns = flower[b][i + 1];
            pa[xs] = edge(xns, xs).u;
            S_[xs] = 1;
            S_[xns] = 0;
            slack_[xs] = 0;
            set_slack(xns);
            q_push(xns);
        }
        S_[xr] = 1;
        pa[xr] = pa[b];
        for (size_t i = pr + 1; i < flower[b].size(); ++i) {
            int xs = flower[b][i];
            S_[xs] = -1;
            set_slack(xs);
        }
        st[b] = 0;
    }

    bool on_found_edge(const E& e) {
        int u = st[e.u], v = st[e.v];
        if (S_[v] == -1) {
            pa[v] = e.u;
            S_[v] = 1;
            int nu = st[match_[v]];
            slack_[v] = slack_[nu] = 0;
            S_[nu] = 0;
            q_push(nu);
        } else if (S_[v] == 0) {
            int lca = get_lca(u, v);
            if (!lca) {
                augment(u, v);
                augment(v, u);
                return true;
            }
            add_blossom(u, lca, v);
        }
        return false;
    }

    bool matching() {
        std::fill(S_.begin() + 1, S_.begin() + n_x + 1, -1);
        std::fill(slack_.begin() + 1, slack_.begin() + n_x + 1, 0);
        q.clear();
        for (int x = 1; x <= n_x; ++x)
            if (st[x] == x && !match_[x]) {
                pa[x] = 0;
                S_[x] = 0;
                q_push(x);
            }
        if (q.empty()) return false;
        for (;;) {
            while (!q.empty()) {
                int u = q.front();
                q.pop_front();
                if (S_[st[u]] == 1) continue;
                for (int v = 1; v <= n; ++v)
                    if (edge(u, v).w > 0 && st[u] != st[v]) {
                        if (e_delta(edge(u, v)) == 0) {
                            if (on_found_edge(edge(u, v))) return true;
                        } else {
                            update_slack(u, st[v]);
                        }
                    }
            }
            ll d = kInfW;
            for (int b = n + 1; b <= n_x; ++b)
                if (st[b] == b && S_[b] == 1) d = std::min(d, lab[b] / 2);
            for (int x = 1; x <= n_x; ++x)
                if (st[x] == x && slack_[x]) {
                    if (S_[x] == -1)
                        d = std::min(d, e_delta(edge(slack_[x], x)));
                    else if (S_[x] == 0)
                        d = std::min(d, e_delta(edge(slack_[x], x)) / 2);
                }
            for (int u = 1; u <= n; ++u) {
                if (S_[st[u]] == 0) {
                    if (lab[u] <= d) return false;
                    lab[u] -= d;
                } else if (S_[st[u]] == 1) {
                    lab[u] += d;
                }
            }
            for (int b = n + 1; b <= n_x; ++b)
                if (st[b] == b) {
                    if (S_[b] == 0) lab[b] += d * 2;
                    else if (S_[b] == 1) lab[b] -= d * 2;
                }
            q.clear();
            for (int x = 1; x <= n_x; ++x)
                if (st[x] == x && slack_[x] && st[slack_[x]] != x
                    && e_delta(edge(slack_[x], x)) == 0)
                    if (on_found_edge(edge(slack_[x], x))) return true;
            for (int b = n + 1; b <= n_x; ++b)
                if (st[b] == b && S_[b] == 1 && lab[b] == 0)
                    expand_blossom(b);
        }
    }

    // Caller sets n and fills edge(u, v).w (u, v in 1..n, symmetric,
    // POSITIVE weights; 0 = no edge) and edge endpoints via init_edges().
    void init_edges() {
        for (int u = 1; u <= n; ++u)
            for (int v = 1; v <= n; ++v) {
                edge(u, v).u = u;
                edge(u, v).v = v;
            }
    }

    void solve() {
        n_x = n;
        std::fill(match_.begin() + 1, match_.begin() + n + 1, 0);
        ll w_max = 0;
        for (int u = 0; u <= n; ++u) {
            st[u] = u;
            flower[u].clear();
        }
        for (int u = 1; u <= n; ++u)
            for (int v = 1; v <= n; ++v) {
                ffrom(u, v) = (u == v ? u : 0);
                w_max = std::max(w_max, edge(u, v).w);
            }
        for (int u = 1; u <= n; ++u) lab[u] = w_max;
        while (matching()) {}
    }
};

constexpr int kBlossomMaxDefects = 120;   // per-component blossom budget
constexpr double kBlossomScale = 1048576.0;        // 2^20 per weight unit
constexpr double kBlossomWeightCap = 1e6;          // clamp inf sentinels

// Exact MWPM of one defect component via the boundary reduction +
// blossom perfect matching. Returns the observable parity bitmask.
int decode_blossom(const Ctx& ctx, const std::vector<int>& defects,
                   Blossom& bl, double* out_cost) {
    typedef long long ll;
    const int B = ctx.n_nodes - 1;
    const int k = static_cast<int>(defects.size());
    if (k == 0) return 0;
    const int n = k + (k & 1);          // +1 virtual boundary node if odd
    bl.reserve(n);
    bl.n = n;
    bl.init_edges();

    auto quant = [](double w) {
        if (!(w < kBlossomWeightCap)) w = kBlossomWeightCap;
        return static_cast<ll>(llround(w * kBlossomScale));
    };
    ll wq_max = 0;
    std::vector<ll> wq(static_cast<size_t>(n) * n, 0);
    for (int i = 0; i < k; ++i) {
        for (int j = i + 1; j < k; ++j) {
            double direct = ctx.D(defects[i], defects[j]);
            double via = ctx.D(defects[i], B) + ctx.D(defects[j], B);
            ll w = quant(direct < via ? direct : via);
            wq[static_cast<size_t>(i) * n + j] = w;
            wq_max = std::max(wq_max, w);
        }
        if (n > k) {
            ll w = quant(ctx.D(defects[i], B));
            wq[static_cast<size_t>(i) * n + k] = w;
            wq_max = std::max(wq_max, w);
        }
    }
    // maximize C - w with C > n * max(w): any higher-cardinality matching
    // then dominates, so the maximum is a minimum-weight PERFECT matching
    const ll C = (static_cast<ll>(n) + 1) * (wq_max + 1);
    for (int i = 0; i < n; ++i)
        for (int j = i + 1; j < n; ++j) {
            ll w = C - wq[static_cast<size_t>(i) * n + j];
            bl.edge(i + 1, j + 1).w = w;
            bl.edge(j + 1, i + 1).w = w;
        }
    bl.solve();

    int par = 0;
    for (int i = 0; i < k; ++i) {
        int m = bl.match_[i + 1] - 1;
        if (m < i) continue;            // counted from the lower endpoint
        if (m >= k) {                   // virtual node: boundary match
            par ^= ctx.P(defects[i], B);
            if (out_cost) *out_cost += ctx.D(defects[i], B);
            continue;
        }
        double direct = ctx.D(defects[i], defects[m]);
        double via = ctx.D(defects[i], B) + ctx.D(defects[m], B);
        if (direct <= via) {
            par ^= ctx.P(defects[i], defects[m]);
            if (out_cost) *out_cost += direct;
        } else {
            par ^= ctx.P(defects[i], B) ^ ctx.P(defects[m], B);
            if (out_cost) *out_cost += via;
        }
    }
    return par;
}

struct ShotStats {
    int32_t n_defects = 0;
    int32_t max_cluster = 0;
    uint8_t exact = 1;      // every component within its exact-DP budget
    double cost = 0.0;      // total matching weight
};

// Modes for decode_shot.
enum DecodeMode { kModeCluster = 0, kModeFullExact = 1, kModeGreedy = 2,
                  kModeBlossom = 3 };

// Full decode of one shot: direct exact DP for small defect sets, exact
// cluster decomposition beyond (per-component DP up to kExactMaxDefects,
// O(n^3) blossom matching for larger components — exact at any size up
// to kBlossomMaxDefects, greedy + 2-opt only beyond that).
int decode_shot(const Ctx& ctx, const uint8_t* det_row, int n_det,
                std::vector<double>& dp, std::vector<int8_t>& choice,
                Blossom& bl, ShotStats* stats, int mode = kModeCluster) {
    const int B = ctx.n_nodes - 1;
    std::vector<int> defects;
    defects.reserve(32);
    for (int i = 0; i < n_det; ++i)
        if (det_row[i]) defects.push_back(i);
    const int k = static_cast<int>(defects.size());
    double cost = 0.0;
    double* cp = stats ? &cost : nullptr;
    if (stats) { stats->n_defects = k; stats->max_cluster = k;
                 stats->exact = 1; }
    if (k == 0) { if (stats) stats->cost = 0.0; return 0; }

    int par = 0;
    if (mode == kModeGreedy) {
        par = decode_greedy(ctx, defects, cp);
        if (stats) { stats->exact = 0; stats->cost = cost; }
        return par;
    }
    if (mode == kModeBlossom) {            // whole-shot blossom (testing)
        if (k <= kBlossomMaxDefects) {
            par = decode_blossom(ctx, defects, bl, cp);
        } else {
            par = decode_greedy(ctx, defects, cp);
            if (stats) stats->exact = 0;
        }
        if (stats) stats->cost = cost;
        return par;
    }
    // small shots: whole-shot DP beats paying the decomposition pass;
    // beyond ~6 defects the decomposition + per-component DP/blossom is
    // faster than one 2^k DP (measured 60k -> 99k shots/s at d=11)
    if (mode == kModeFullExact || k <= 6) {
        if (k <= kClusterMaxExact + 2) {   // hard cap: 2^22 DP
            par = decode_exact(ctx, defects, dp, choice, cp);
        } else {
            par = decode_greedy(ctx, defects, cp);
            if (stats) stats->exact = 0;
        }
        if (stats) stats->cost = cost;
        return par;
    }

    // exact cluster decomposition: components under the strict adjacency
    // D(i,j) < D(i,B) + D(j,B); any cross-component pair can be replaced
    // by two boundary matches at no extra cost, so per-component minima
    // compose to a global minimum matching.
    std::vector<double> db(k);
    for (int i = 0; i < k; ++i) db[i] = ctx.D(defects[i], B);
    std::vector<int> comp(k, -1);
    std::vector<int> stack;
    std::vector<int> members;
    int n_comp = 0;
    int max_cluster = 0;
    for (int s = 0; s < k; ++s) {
        if (comp[s] >= 0) continue;
        stack.assign(1, s);
        comp[s] = n_comp;
        members.clear();
        while (!stack.empty()) {
            int i = stack.back();
            stack.pop_back();
            members.push_back(i);
            for (int j = 0; j < k; ++j) {
                if (comp[j] >= 0) continue;
                if (ctx.D(defects[i], defects[j]) < db[i] + db[j]) {
                    comp[j] = n_comp;
                    stack.push_back(j);
                }
            }
        }
        const int kc = static_cast<int>(members.size());
        if (kc > max_cluster) max_cluster = kc;
        std::vector<int> sub(kc);
        for (int m = 0; m < kc; ++m) sub[m] = defects[members[m]];
        if (kc <= kExactMaxDefects) {
            par ^= decode_exact(ctx, sub, dp, choice, cp);
        } else if (kc <= kBlossomMaxDefects) {
            // poly-time exact MWPM: the 2^k DP on 16-30-defect bulk
            // components is the old 431-shots/s bottleneck
            par ^= decode_blossom(ctx, sub, bl, cp);
        } else {
            par ^= decode_greedy(ctx, sub, cp);
            if (stats) stats->exact = 0;
        }
        ++n_comp;
    }
    if (stats) { stats->max_cluster = max_cluster; stats->cost = cost; }
    return par;
}

// Back-compat wrapper (uf_decode_batch ABI).
int decode_one(const Ctx& ctx, const uint8_t* det_row, int n_det,
               std::vector<double>& dp, std::vector<int8_t>& choice,
               Blossom& bl) {
    return decode_shot(ctx, det_row, n_det, dp, choice, bl, nullptr);
}

}  // namespace

extern "C" {

// Returns an opaque context handle.
void* uf_create(int n_nodes, const double* dist, const int32_t* parity) {
    Ctx* ctx = new Ctx();
    ctx->n_nodes = n_nodes;
    ctx->dist.assign(dist, dist + static_cast<size_t>(n_nodes) * n_nodes);
    ctx->parity.assign(parity,
                       parity + static_cast<size_t>(n_nodes) * n_nodes);
    return ctx;
}

void uf_destroy(void* handle) { delete static_cast<Ctx*>(handle); }

// dets: (shots, n_det) row-major uint8; out: (shots,) uint8 logical flips.
void uf_decode_batch(void* handle, const uint8_t* dets, int shots, int n_det,
                     uint8_t* out) {
    const Ctx& ctx = *static_cast<Ctx*>(handle);
    std::vector<double> dp;        // DP scratch reused across shots
    std::vector<int8_t> choice;
    Blossom bl;
    for (int s = 0; s < shots; ++s)
        out[s] = static_cast<uint8_t>(decode_one(
            ctx, dets + static_cast<size_t>(s) * n_det, n_det, dp, choice,
            bl));
}

// Extended decode with per-shot diagnostics; any out_* pointer may be null.
//   mode 0: exact cluster decomposition (production path)
//   mode 1: whole-shot exact DP (validation oracle; shots beyond 22
//           defects fall back to greedy and clear out_exact)
//   mode 2: greedy + 2-opt only (the pre-cluster fallback, for ablations)
//   mode 3: whole-shot O(n^3) blossom matching (for differential tests)
//   out_exact[s] = 1 iff every component was decoded exactly (DP/blossom)
//   out_cost[s]  = total matching weight (for cross-mode validation)
void uf_decode_batch_ex(void* handle, const uint8_t* dets, int shots,
                        int n_det, int mode, uint8_t* out_par,
                        int32_t* out_ndef, int32_t* out_maxcluster,
                        uint8_t* out_exact, double* out_cost) {
    const Ctx& ctx = *static_cast<Ctx*>(handle);
    std::vector<double> dp;
    std::vector<int8_t> choice;
    Blossom bl;
    ShotStats st;
    for (int s = 0; s < shots; ++s) {
        int par = decode_shot(ctx, dets + static_cast<size_t>(s) * n_det,
                              n_det, dp, choice, bl, &st, mode);
        if (out_par) out_par[s] = static_cast<uint8_t>(par);
        if (out_ndef) out_ndef[s] = st.n_defects;
        if (out_maxcluster) out_maxcluster[s] = st.max_cluster;
        if (out_exact) out_exact[s] = st.exact;
        if (out_cost) out_cost[s] = st.cost;
    }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Heralded-erasure peeling (native port of qec/erasure.ErasureDecoder):
// leaf-inward peeling of each shot's heralded subgraph, boundary edges
// applied by defect state, cycles broken arbitrarily (ML within erasure).
// Residual defects are left in `dets` for the caller's matching pass.
// ---------------------------------------------------------------------------

namespace {

struct ErCtx {
    int n_det;
    int n_sites;
    std::vector<int64_t> edges;    // (n_sites, 2), -1 = boundary/absent
    std::vector<uint8_t> obs0;     // (n_sites,)
};

}  // namespace

extern "C" {

void* er_create(int n_det, int n_sites, const int64_t* edges,
                const uint8_t* obs0) {
    ErCtx* c = new ErCtx();
    c->n_det = n_det;
    c->n_sites = n_sites;
    c->edges.assign(edges, edges + 2 * static_cast<size_t>(n_sites));
    c->obs0.assign(obs0, obs0 + n_sites);
    return c;
}

void er_destroy(void* h) { delete static_cast<ErCtx*>(h); }

// dets (S, n_det) uint8, modified in place to the residual syndrome;
// heralds (S, n_sites) uint8; obs_out (S,) uint8 erasure-correction parity.
void er_peel_batch(void* h, uint8_t* dets, const uint8_t* heralds,
                   int S, int n_det, int n_sites, uint8_t* obs_out) {
    const ErCtx& c = *static_cast<ErCtx*>(h);
    std::vector<int> sites;
    std::vector<char> alive;
    std::vector<std::vector<int>> inc(c.n_det);   // node -> local edge ids

    for (int s = 0; s < S; ++s) {
        uint8_t* D = dets + static_cast<size_t>(s) * n_det;
        const uint8_t* hh = heralds + static_cast<size_t>(s) * n_sites;
        sites.clear();
        for (int e = 0; e < n_sites; ++e)
            if (hh[e]) sites.push_back(e);
        uint8_t par = 0;
        if (!sites.empty()) {
            const int k = static_cast<int>(sites.size());
            alive.assign(k, 1);
            for (auto& v : inc) v.clear();
            for (int i = 0; i < k; ++i) {
                int64_t u = c.edges[2 * sites[i]];
                int64_t v = c.edges[2 * sites[i] + 1];
                if (u >= 0) inc[u].push_back(i);
                if (v >= 0) inc[v].push_back(i);
            }
            int remaining = k;
            auto peel_pass = [&]() {
                bool changed = true;
                while (changed) {
                    changed = false;
                    for (int i = 0; i < k; ++i) {
                        if (!alive[i]) continue;
                        int64_t u = c.edges[2 * sites[i]];
                        int64_t v = c.edges[2 * sites[i] + 1];
                        // leaf = endpoint whose live degree is 1
                        int leaf = -1, other = -1;
                        if (u >= 0) {
                            int deg = 0;
                            for (int j : inc[u]) deg += alive[j];
                            if (deg == 1) { leaf = static_cast<int>(u);
                                            other = static_cast<int>(v); }
                        }
                        if (leaf < 0 && v >= 0) {
                            int deg = 0;
                            for (int j : inc[v]) deg += alive[j];
                            if (deg == 1) { leaf = static_cast<int>(v);
                                            other = static_cast<int>(u); }
                        }
                        if (leaf < 0) continue;
                        if (D[leaf]) {
                            par ^= c.obs0[sites[i]];
                            D[leaf] ^= 1;
                            if (other >= 0) D[other] ^= 1;
                        }
                        alive[i] = 0;
                        --remaining;
                        changed = true;
                    }
                }
            };
            peel_pass();
            // leftovers: boundary edges by defect state; cycles broken
            while (remaining > 0) {
                int i = 0;
                while (i < k && !alive[i]) ++i;
                int64_t u = c.edges[2 * sites[i]];
                int64_t v = c.edges[2 * sites[i] + 1];
                if (v < 0 && u >= 0 && D[u]) {
                    par ^= c.obs0[sites[i]];
                    D[u] ^= 1;
                }
                alive[i] = 0;
                --remaining;
                peel_pass();
            }
        }
        obs_out[s] = par;
    }
}

}  // extern "C"

// ===========================================================================
// OSD-0 over GF(2) for DEM-BP fallback decoding (qec/dem_decoder.py).
// Per shot: order columns by ascending belief (most suspect first),
// Gaussian-eliminate the row-bit-packed [H | s] in that order, read the
// solution off the pivot columns. Bit-identical to qec/ldpc._osd0.
// ===========================================================================

#include <algorithm>

extern "C" {

// H: (m, n) row-major uint8; dets: (S, m); beliefs: (S, n) float32.
// out_e: (S, n) uint8 solutions.
void osd0_batch(const uint8_t* H, int m, int n,
                const uint8_t* dets, const float* beliefs, int S,
                uint8_t* out_e) {
    // OSD-0 = Gauss-Jordan with pivot COLUMNS visited in ascending-belief
    // order. The old form physically permuted H's columns into a fresh
    // bit matrix per shot (~530k scattered byte reads; measured 1.5
    // ms/shot on the gross-code DEM). Instead pack H once in natural
    // column order, memcpy per shot, and just VISIT columns in belief
    // order over an unused-row list — identical pivots, identical
    // solution (tests pin bit-equality to the Python _osd0), ~30x less
    // per-shot work.
    const int W = (n + 1 + 63) / 64;
    std::vector<uint64_t> Hp(static_cast<size_t>(m) * W, 0);
    for (int r = 0; r < m; ++r) {
        const uint8_t* hrow = H + static_cast<size_t>(r) * n;
        uint64_t* prow = Hp.data() + static_cast<size_t>(r) * W;
        for (int c = 0; c < n; ++c)
            if (hrow[c]) prow[c >> 6] |= (1ULL << (c & 63));
    }
    std::vector<int> order(n);
    std::vector<uint64_t> A(static_cast<size_t>(m) * W);
    std::vector<int> unused(m);
    std::vector<int> pivrow;
    std::vector<int> pivcol;
    pivrow.reserve(m);
    pivcol.reserve(m);

    for (int s = 0; s < S; ++s) {
        const float* bel = beliefs + static_cast<size_t>(s) * n;
        for (int c = 0; c < n; ++c) order[c] = c;
        std::sort(order.begin(), order.end(),
                  [bel](int a, int b) {
                      if (bel[a] != bel[b]) return bel[a] < bel[b];
                      return a < b;   // stable tie-break = np.argsort
                  });
        std::memcpy(A.data(), Hp.data(),
                    static_cast<size_t>(m) * W * sizeof(uint64_t));
        const uint64_t sbit = 1ULL << (n & 63);
        const int sw = n >> 6;
        for (int r = 0; r < m; ++r) {
            if (dets[static_cast<size_t>(s) * m + r])
                A[static_cast<size_t>(r) * W + sw] |= sbit;
            unused[r] = r;
        }
        int n_unused = m;
        pivrow.clear();
        pivcol.clear();
        for (int ci = 0; ci < n && n_unused > 0; ++ci) {
            const int c = order[ci];
            const int w = c >> 6;
            const uint64_t bit = 1ULL << (c & 63);
            int piv = -1, upos = -1;
            for (int u = 0; u < n_unused; ++u) {
                const int i = unused[u];
                if (A[static_cast<size_t>(i) * W + w] & bit) {
                    piv = i;
                    upos = u;
                    break;
                }
            }
            if (piv < 0) continue;
            unused[upos] = unused[--n_unused];
            const uint64_t* prow = A.data() + static_cast<size_t>(piv) * W;
            for (int i = 0; i < m; ++i) {
                if (i == piv) continue;
                uint64_t* arow = A.data() + static_cast<size_t>(i) * W;
                if (arow[w] & bit)
                    for (int k = 0; k < W; ++k) arow[k] ^= prow[k];
            }
            pivrow.push_back(piv);
            pivcol.push_back(c);
        }
        uint8_t* e = out_e + static_cast<size_t>(s) * n;
        std::fill(e, e + n, 0);
        for (size_t ri = 0; ri < pivrow.size(); ++ri)
            if (A[static_cast<size_t>(pivrow[ri]) * W + sw] & sbit)
                e[pivcol[ri]] = 1;
    }
}

}  // extern "C"
