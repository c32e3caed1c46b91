// astarpa_native — C++ runtime for the A*PA search path.
//
// The A* loop is data-dependent pointer chasing (hash maps, bucket queues,
// contour probes) — the part of the aligner that does not map to TPUs and
// the part the reference keeps hottest in native code.  This library is the
// production implementation of the same semantics as the Python runtime in
// astarpa_tpu/astar (which stays as the readable reference / oracle):
//
//   - seeds & potentials                 (pa-heuristic/src/seeds.rs)
//   - r=1 / r=2 q-gram match finding     (matches/exact.rs, inexact.rs)
//   - match pruning w/ consistency       (prune.rs:109-366)
//   - GCSH/CSH layered contours          (contour/hint_contours.rs; nested-
//     layer formulation, rebuild-on-prune like the Python runtime so both
//     implementations stay bit-identical)
//   - bucket queue                       (bucket_queue.rs)
//   - A* over Pos states and DT states   (astar.rs:35-301, astar_dt.rs)
//
// Exposed via a C ABI (astarpa.h) for ctypes/cffi and C/C++ consumers —
// the astarpa-c parity layer.

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>
#include <unordered_map>
#include <algorithm>
#include <cassert>

namespace {

using i32 = int32_t;
using i64 = int64_t;
using u32 = uint32_t;
using u64 = uint64_t;

constexpr i32 INF = INT32_MAX / 4;

struct Pos {
  i32 i = 0, j = 0;
  bool operator==(const Pos& o) const { return i == o.i && j == o.j; }
  bool operator!=(const Pos& o) const { return !(*this == o); }
};
struct PosHash {
  size_t operator()(const Pos& p) const {
    return std::hash<u64>()((u64(u32(p.i)) << 32) | u32(p.j));
  }
};
static inline bool lex_less(const Pos& a, const Pos& b) {
  return a.i != b.i ? a.i < b.i : a.j < b.j;
}

static inline i32 code(uint8_t c) { return (c >> 1) & 3; }

// ---------------------------------------------------------------- seeds

struct Seeds {
  i32 n = 0, k = 0, r = 0;
  std::vector<i32> potential;   // potential[i], size n+1
  std::vector<i32> seed_at;     // seed index covering column i, or -1
  std::vector<i32> seed_start;  // start of each seed

  void build(i32 n_, i32 k_, i32 r_) {
    n = n_; k = k_; r = r_;
    i32 num_seeds = (n >= k) ? n / k : 0;  // disjoint k-mers of a
    potential.assign(n + 1, 0);
    seed_at.assign(n + 1, -1);
    seed_start.resize(num_seeds);
    for (i32 s = 0; s < num_seeds; s++) seed_start[s] = s * k;
    for (i32 i = 0; i <= n; i++) {
      if (i < num_seeds * k) seed_at[i] = i / k;
      // potential[i] = r * (#seeds starting at >= i)
      i32 first = std::min((i + k - 1) / k, num_seeds);
      potential[i] = r * (num_seeds - first);
    }
  }
  i32 pot(Pos p) const { return potential[p.i]; }
  bool is_seed_start(Pos p) const {
    i32 s = seed_at[p.i];
    return s >= 0 && p.i == seed_start[s];
  }
  bool is_seed_end(Pos p) const {
    if (p.i == 0) return false;
    i32 s = seed_at[p.i - 1];
    return s >= 0 && p.i == seed_start[s] + k;
  }
  bool is_seed_start_or_end(Pos p) const {
    return is_seed_start(p) || is_seed_end(p);
  }
  // GCSH domain transform (`seeds.rs:140-143`).
  Pos transform(Pos p) const {
    i32 pp = potential[p.i];
    return Pos{p.i - p.j - pp, p.j - p.i - pp};
  }
  // Cost to cross the seeds strictly between from and to with no matches.
  i32 potential_distance(Pos from, Pos to) const {
    i32 end_i = to.i;
    i32 s = seed_at[to.i];
    if (s >= 0) end_i = seed_start[s];
    return potential[from.i] - potential[end_i];
  }
};

// ------------------------------------------------------------- matches

struct Match {
  Pos start, end;
  i32 cost = 0, pot = 1;
  bool pruned = false;
  i32 score() const { return pot - cost; }
};

static u64 qgram_of(const uint8_t* s, i32 k) {
  u64 q = 0;
  for (i32 t = 0; t < k; t++) q = (q << 2) | u64(code(s[t]));
  return q;
}

// All single-edit variants of a 2-bit packed q-gram (`inexact.rs:18-58`).
static void mutations(i32 k, u64 qgram, std::vector<u64>& dels,
                      std::vector<u64>& subs, std::vector<u64>& ins) {
  dels.clear(); subs.clear(); ins.clear();
  for (i32 i = 0; i < k; i++) {
    u64 mask = ~(u64(3) << (2 * i));
    for (u64 s = 0; s < 4; s++) {
      u64 q = (qgram & mask) | (s << (2 * i));
      if (q != qgram) subs.push_back(q);
    }
  }
  for (i32 i = 0; i <= k; i++) {
    u64 mask = (u64(1) << (2 * i)) - 1;
    for (u64 s = 0; s < 4; s++)
      ins.push_back((qgram & mask) | (s << (2 * i)) | ((qgram & ~mask) << 2));
  }
  for (i32 i = 0; i < k; i++) {
    u64 mask = (u64(1) << (2 * i)) - 1;
    dels.push_back((qgram & mask) | ((qgram & (~mask << 2)) >> 2));
  }
}

// Find matches; transform-filtered for GCSH (`matches.rs:17-39,205-210`).
static std::vector<Match> find_matches(const uint8_t* a, i32 n,
                                       const uint8_t* b, i32 m,
                                       const Seeds& seeds, i32 k, i32 r,
                                       bool transform_filter) {
  std::vector<Match> out;
  Pos t_target = seeds.transform(Pos{n, m});
  auto keep = [&](const Match& mt) {
    if (!transform_filter) return true;
    Pos t = seeds.transform(mt.start);
    return t.i <= t_target.i && t.j <= t_target.j;
  };
  if (r == 1) {
    std::unordered_map<u64, std::vector<i32>> table;
    for (i32 i = 0; i + k <= n; i += k) table[qgram_of(a + i, k)].push_back(i);
    if (m >= k) {
      u64 mask = (k < 32) ? ((u64(1) << (2 * k)) - 1) : ~u64(0);
      // Stream b's k-mers in reverse (`exact.rs:20-22`).
      for (i32 j = m - k; j >= 0; j--) {
        u64 q = qgram_of(b + j, k) & mask;
        auto it = table.find(q);
        if (it == table.end()) continue;
        for (i32 i : it->second) {
          Match mt{{i, j}, {i + k, j + k}, 0, 1};
          if (keep(mt)) out.push_back(mt);
        }
      }
    }
  } else {  // r == 2
    std::unordered_map<u64, std::vector<i32>> tab[3];  // k-1, k, k+1
    for (i32 d = -1; d <= 1; d++) {
      i32 kk = k + d;
      for (i32 j = 0; j + kk <= m; j++)
        tab[d + 1][qgram_of(b + j, kk)].push_back(j);
    }
    std::vector<u64> dels, subs, ins;
    i32 num_seeds = (n >= k) ? (n - k) / k + 1 : 0;
    for (i32 s = num_seeds - 1; s >= 0; s--) {
      i32 start = s * k, end = start + k;
      u64 q = qgram_of(a + start, k);
      auto push_all = [&](const std::unordered_map<u64, std::vector<i32>>& t,
                          u64 w, i32 dj, i32 cost) {
        auto it = t.find(w);
        if (it == t.end()) return;
        for (i32 j : it->second) {
          Match mt{{start, j}, {end, j + dj}, cost, 2};
          if (keep(mt)) out.push_back(mt);
        }
      };
      push_all(tab[1], q, k, 0);
      mutations(k, q, dels, subs, ins);
      for (u64 w : dels) push_all(tab[0], w, k - 1, 1);
      for (u64 w : subs) push_all(tab[1], w, k, 1);
      for (u64 w : ins) push_all(tab[2], w, k + 1, 1);
    }
  }
  // Sort + dedup keeping lowest cost (`matches.rs:300-332`).
  std::sort(out.begin(), out.end(), [](const Match& x, const Match& y) {
    if (x.start.i != y.start.i) return x.start.i < y.start.i;
    if (x.start.j != y.start.j) return x.start.j < y.start.j;
    if (x.end.i != y.end.i) return x.end.i < y.end.i;
    if (x.end.j != y.end.j) return x.end.j < y.end.j;
    return x.cost < y.cost;
  });
  std::vector<Match> dedup;
  for (auto& mt : out) {
    if (!dedup.empty() && dedup.back().start == mt.start &&
        dedup.back().end == mt.end)
      continue;
    dedup.push_back(mt);
  }
  return dedup;
}

// --------------------------------------------------------- match pruner

struct MatchPruner {
  // Matches sorted by (LexPos(start), cost); shared objects with by_end.
  std::vector<Match> by_start;
  std::unordered_map<Pos, std::pair<i32, i32>, PosHash> start_index;
  std::vector<i32> by_end;  // indices into by_start, sorted by end
  std::unordered_map<Pos, std::pair<i32, i32>, PosHash> end_index;
  bool prune_start = false, prune_end = false, check_consistency = false;
  i32 num_pruned = 0;

  void build(std::vector<Match> ms, bool ps, bool pe, bool cc) {
    prune_start = ps; prune_end = pe; check_consistency = cc;
    std::sort(ms.begin(), ms.end(), [](const Match& x, const Match& y) {
      if (x.start.i != y.start.i) return x.start.i < y.start.i;
      if (x.start.j != y.start.j) return x.start.j < y.start.j;
      return x.cost < y.cost;
    });
    by_start = std::move(ms);
    for (i32 i = 0; i < (i32)by_start.size();) {
      i32 j = i;
      while (j < (i32)by_start.size() && by_start[j].start == by_start[i].start) j++;
      start_index[by_start[i].start] = {i, j};
      i = j;
    }
    if (prune_end) {
      by_end.resize(by_start.size());
      for (i32 i = 0; i < (i32)by_end.size(); i++) by_end[i] = i;
      std::sort(by_end.begin(), by_end.end(), [&](i32 x, i32 y) {
        const Match &mx = by_start[x], &my = by_start[y];
        if (mx.end.i != my.end.i) return mx.end.i < my.end.i;
        if (mx.end.j != my.end.j) return mx.end.j < my.end.j;
        return mx.cost < my.cost;
      });
      for (i32 i = 0; i < (i32)by_end.size();) {
        i32 j = i;
        while (j < (i32)by_end.size() &&
               by_start[by_end[j]].end == by_start[by_end[i]].end)
          j++;
        end_index[by_start[by_end[i]].end] = {i, j};
        i = j;
      }
    }
  }

  i32 max_score_for(Pos start, Pos end) const {
    auto it = start_index.find(start);
    if (it == start_index.end()) return 0;
    i32 best = 0;
    for (i32 i = it->second.first; i < it->second.second; i++) {
      const Match& mt = by_start[i];
      if (!mt.pruned && mt.end == end) best = std::max(best, mt.score());
    }
    return best;
  }

  // `prune.rs:328-349`
  bool consistent(const Match& mt) const {
    if (!check_consistency || mt.cost == 0) return true;
    i32 sc = mt.score();
    Pos s = mt.start, e = mt.end;
    if (max_score_for({s.i, s.j + 1}, e) > sc) return false;
    if (max_score_for({s.i, s.j - 1}, e) > sc) return false;
    if (max_score_for(s, {e.i, e.j + 1}) > sc) return false;
    if (max_score_for(s, {e.i, e.j - 1}) > sc) return false;
    return true;
  }

  // Per-position prune (`prune.rs:213-240`); returns #pruned.
  i32 prune(const Seeds& seeds, Pos pos) {
    i32 cnt = 0;
    if (prune_start && seeds.is_seed_start(pos)) {
      auto it = start_index.find(pos);
      if (it != start_index.end())
        for (i32 i = it->second.first; i < it->second.second; i++) {
          Match& mt = by_start[i];
          if (!mt.pruned && consistent(mt)) { mt.pruned = true; cnt++; }
        }
    }
    if (prune_end && seeds.is_seed_end(pos)) {
      auto it = end_index.find(pos);
      if (it != end_index.end())
        for (i32 i = it->second.first; i < it->second.second; i++) {
          Match& mt = by_start[by_end[i]];
          if (!mt.pruned && consistent(mt)) { mt.pruned = true; cnt++; }
        }
    }
    num_pruned += cnt;
    return cnt;
  }
};

// ------------------------------------------------------------- contours

// Nested layered contours: layer v (1-based) holds a staircase of dominant
// start points with chain value >= v (same formulation as the Python
// runtime; semantics of `hint_contours.rs`).
struct Contours {
  // Each layer: points sorted by i asc with j desc (dominant staircase).
  std::vector<std::vector<Pos>> layers;

  static bool stair_contains(const std::vector<Pos>& st, Pos q) {
    // Smallest i >= q.i has the largest j among those.
    auto it = std::lower_bound(
        st.begin(), st.end(), q.i,
        [](const Pos& p, i32 qi) { return p.i < qi; });
    return it != st.end() && it->j >= q.j;
  }

  static void stair_push(std::vector<Pos>& st, Pos p) {
    auto it = std::lower_bound(
        st.begin(), st.end(), p.i,
        [](const Pos& q, i32 pi) { return q.i < pi; });
    size_t kpos = it - st.begin();
    if (kpos < st.size() && st[kpos].j >= p.j) return;  // dominated
    size_t hi = kpos;
    if (hi < st.size() && st[hi].i == p.i) hi++;
    size_t lo = kpos;
    while (lo > 0 && st[lo - 1].j <= p.j) lo--;
    st.erase(st.begin() + lo, st.begin() + hi);
    st.insert(st.begin() + lo, p);
  }

  bool contains(i32 v, Pos q) const {
    if (v <= 0) return true;
    if (v > (i32)layers.size()) return false;
    return stair_contains(layers[v - 1], q);
  }

  i32 score(Pos q) const {
    i32 lo = 0, hi = (i32)layers.size() + 1;
    while (hi - lo > 1) {
      i32 mid = (lo + hi) / 2;
      if (contains(mid, q)) lo = mid; else hi = mid;
    }
    return lo;
  }

  i32 score_with_hint(Pos q, i32& hint) const {
    i32 v = std::max(0, std::min(hint, (i32)layers.size()));
    if (contains(v, q)) {
      while (contains(v + 1, q)) v++;
    } else {
      while (v > 0 && !contains(v, q)) v--;
    }
    hint = v;
    return v;
  }

  // Rebuild from active matches, reverse-sorted by LexPos(start)
  // (`hint_contours.rs:213-254` semantics, nested-layer variant).
  void build(const MatchPruner& pruner, const Seeds& seeds, bool use_gap_cost,
             Pos t_target) {
    layers.clear();
    const auto& ms = pruner.by_start;
    i32 idx = (i32)ms.size() - 1;
    while (idx >= 0) {
      // Group of equal starts (already contiguous in by_start).
      i32 lo = idx;
      while (lo >= 0 && ms[lo].start == ms[idx].start) lo--;
      Pos tstart = use_gap_cost ? seeds.transform(ms[idx].start) : ms[idx].start;
      i32 v = 0, l = 0;
      for (i32 t = idx; t > lo; t--) {
        const Match& mt = ms[t];
        if (mt.pruned) continue;
        Pos tend = use_gap_cost ? seeds.transform(mt.end) : mt.end;
        if (!(tend.i <= t_target.i && tend.j <= t_target.j)) continue;
        i32 nv = score(tend) + mt.score();
        if (nv > v) v = nv;
        l = std::max(l, (i32)mt.score());
      }
      if (v > 0) {
        while ((i32)layers.size() < v) layers.emplace_back();
        for (i32 layer = std::max(1, v - l + 1); layer <= v; layer++)
          stair_push(layers[layer - 1], tstart);
      }
      idx = lo;
    }
  }
};

// ------------------------------------------------------------ heuristic

struct GCSHInstance {
  Seeds seeds;
  MatchPruner pruner;
  Contours contours;
  bool use_gap_cost = true;
  bool prune_enabled = true;
  Pos target, t_target;
  i64 h_calls = 0, prune_calls = 0;
  i32 num_matches = 0;
  // Deferred contour rebuilds: pruned matches are marked immediately but
  // the layer structure is rebuilt only every `rebuild_every` pruned
  // matches.  Always sound: pruning only raises h, so a stale (lower) h
  // stays admissible and the popped-state re-evaluation keeps A* exact;
  // the trade is a slightly wider explored band for O(M^2 / K) instead of
  // O(M^2) total contour work (the reference amortizes with an incremental
  // ripple instead, `hint_contours.rs:459-637`).
  i32 pending = 0, rebuild_every = 1;

  void build(const uint8_t* a, i32 n, const uint8_t* b, i32 m, i32 k, i32 r,
             i32 prune_mode, bool gap) {
    use_gap_cost = gap;
    seeds.build(n, k, r);
    target = Pos{n, m};
    t_target = gap ? seeds.transform(target) : target;
    auto ms = find_matches(a, n, b, m, seeds, k, r, gap);
    num_matches = (i32)ms.size();
    bool ps = prune_mode == 1 || prune_mode == 3;
    bool pe = prune_mode == 2 || prune_mode == 3;
    prune_enabled = prune_mode != 0;
    pruner.build(std::move(ms), ps, pe, gap);
    contours.build(pruner, seeds, use_gap_cost, t_target);
    rebuild_every = std::max<i32>(1, num_matches / 256);
  }

  Pos transform(Pos p) const { return use_gap_cost ? seeds.transform(p) : p; }

  i32 distance(Pos from, Pos to) const {
    i32 pd = seeds.potential_distance(from, to);
    if (use_gap_cost) {
      i32 gap = std::abs((to.i - from.i) - (to.j - from.j));
      return std::max(gap, pd);
    }
    return pd;
  }

  i32 h_with_hint(Pos pos, i32& hint) {
    h_calls++;
    i32 p = seeds.pot(pos);
    i32 val = contours.score_with_hint(transform(pos), hint);
    if (val == 0) return distance(pos, target);
    return p - val;
  }

  i32 root_potential() const { return seeds.potential[0]; }

  void prune(Pos pos) {
    if (!prune_enabled) return;
    prune_calls++;
    pending += pruner.prune(seeds, pos);
    if (pending >= rebuild_every) {
      contours.build(pruner, seeds, use_gap_cost, t_target);
      pending = 0;
    }
  }
};

// ----------------------------------------------------------- bucket queue

struct QueueElem { Pos pos; i32 g; };

struct BucketQueue {
  std::vector<std::vector<QueueElem>> layers;
  size_t next = 0, size = 0;

  void push(i32 f, QueueElem e) {
    if ((size_t)f >= layers.size()) layers.resize(f + 1);
    if ((size_t)f < next) next = f;
    layers[f].push_back(e);
    size++;
  }
  bool pop(i32& f, QueueElem& e) {
    if (size == 0) return false;
    while (layers[next].empty()) next++;
    f = (i32)next;
    e = layers[next].back();
    layers[next].pop_back();
    size--;
    if (size == 0) next = 0;
    return true;
  }
};

// ----------------------------------------------------------------- A*

struct Stats {
  i64 expanded = 0, explored = 0, extended = 0, reordered = 0, pruned = 0;
};

struct CigarBuilder {
  std::string s;
  char last = 0;
  i64 cnt = 0;
  void push(char op, i64 c = 1) {
    if (op == last) { cnt += c; return; }
    flush();
    last = op; cnt = c;
  }
  void flush() {
    if (cnt > 0) { s += std::to_string(cnt); s += last; }
    last = 0; cnt = 0;
  }
};

// Plain A* over Pos states (`astar.rs:35-261`).
static i32 astar_pos(const uint8_t* a, i32 n, const uint8_t* b, i32 m,
                     GCSHInstance& h, Stats& st, std::string& cigar_out) {
  struct State { i32 g = INF; i32 hint = 0; };
  std::unordered_map<Pos, State, PosHash> states;
  BucketQueue queue;
  i32 shift = h.root_potential();  // down_shift kept constant (no pq shifts)

  Pos start{0, 0}, target{n, m};
  i32 hint0 = 0;
  i32 hroot = h.h_with_hint(start, hint0);
  states[start] = {0, hint0};
  queue.push(hroot + shift, {start, 0});
  st.explored++;

  while (true) {
    i32 qf = 0; QueueElem qe{};
    bool ok = queue.pop(qf, qe);
    assert(ok && "queue empty before target");
    (void)ok;
    qf -= shift;
    Pos pos = qe.pos;
    i32 qg = qe.g;
    auto& state = states[pos];
    if (qg > state.g) continue;

    i32 ch = h.h_with_hint(pos, state.hint);
    i32 cf = state.g + ch;
    assert(cf >= qf);
    if (cf > qf) {
      st.reordered++;
      queue.push(cf + shift, {pos, qg});
      continue;
    }
    st.expanded++;
    if (pos == target) break;

    i32 g = state.g;
    i32 hint = state.hint;

    if (h.seeds.is_seed_start_or_end(pos)) h.prune(pos);

    // Outgoing edges; greedy matching shadows indels on a match
    // (`alignment_graph.rs:155-183`).
    bool is_match = pos.i < n && pos.j < m && a[pos.i] == b[pos.j];
    Pos nexts[3]; i32 costs[3]; i32 cnt = 0;
    if (is_match) {
      nexts[cnt] = {pos.i + 1, pos.j + 1}; costs[cnt++] = 0;
    } else {
      if (pos.i + 1 <= n) { nexts[cnt] = {pos.i + 1, pos.j}; costs[cnt++] = 1; }
      if (pos.j + 1 <= m) { nexts[cnt] = {pos.i, pos.j + 1}; costs[cnt++] = 1; }
      if (pos.i + 1 <= n && pos.j + 1 <= m) {
        nexts[cnt] = {pos.i + 1, pos.j + 1}; costs[cnt++] = 1;
      }
    }
    for (i32 e = 0; e < cnt; e++) {
      Pos next = nexts[e];
      i32 next_g = g + costs[e];
      // Greedy diagonal extension within the seed (`astar.rs:181-204`).
      while (next.i < n && next.j < m && a[next.i] == b[next.j] &&
             !h.seeds.is_seed_start_or_end(next)) {
        st.extended++;
        next = {next.i + 1, next.j + 1};
      }
      auto [it, inserted] = states.try_emplace(next);
      if (!inserted && it->second.g <= next_g) continue;
      i32 nh_hint = hint;
      i32 nh = h.h_with_hint(next, nh_hint);
      it->second.g = next_g;
      it->second.hint = nh_hint;
      queue.push(next_g + nh + shift, {next, next_g});
      st.explored++;
    }
  }

  // Traceback by g-differences (`astar.rs:263-301`).
  i32 dist = states[target].g;
  Pos cur = target;
  i32 costleft = dist;
  std::string rev;
  while (!(cur == start)) {
    auto gval = [&](Pos p) -> i32 {
      auto it = states.find(p);
      return it == states.end() ? INF : it->second.g;
    };
    char op = 0;
    Pos par;
    if (cur.i > 0 && cur.j > 0 && gval({cur.i - 1, cur.j - 1}) + 1 == costleft &&
        a[cur.i - 1] != b[cur.j - 1]) {
      op = 'X'; par = {cur.i - 1, cur.j - 1}; costleft -= 1;
    } else if (cur.i > 0 && gval({cur.i - 1, cur.j}) + 1 == costleft) {
      op = 'D'; par = {cur.i - 1, cur.j}; costleft -= 1;
    } else if (cur.j > 0 && gval({cur.i, cur.j - 1}) + 1 == costleft) {
      op = 'I'; par = {cur.i, cur.j - 1}; costleft -= 1;
    } else {
      op = '='; par = {cur.i - 1, cur.j - 1};
      assert(cur.i > 0 && cur.j > 0 && a[cur.i - 1] == b[cur.j - 1]);
    }
    rev += op;
    cur = par;
  }
  assert(costleft == 0);
  CigarBuilder cb;
  for (auto it = rev.rbegin(); it != rev.rend(); ++it) cb.push(*it);
  cb.flush();
  cigar_out = std::move(cb.s);
  st.pruned = h.pruner.num_pruned;
  return dist;
}

// A* over DT states (`astar_dt.rs:34-338`).
static i32 astar_dt(const uint8_t* a, i32 n, const uint8_t* b, i32 m,
                    GCSHInstance& h, Stats& st, std::string& cigar_out) {
  struct DtKey {
    i32 d, g;
    bool operator==(const DtKey& o) const { return d == o.d && g == o.g; }
  };
  struct DtHash {
    size_t operator()(const DtKey& k) const {
      return std::hash<u64>()((u64(u32(k.d)) << 32) | u32(k.g));
    }
  };
  struct State { i32 fr = -1; i32 hint = 0; };
  std::unordered_map<DtKey, State, DtHash> states;
  BucketQueue queue;
  i32 shift = h.root_potential();

  Pos start{0, 0}, target{n, m};
  i32 hint0 = 0;
  i32 hroot = h.h_with_hint(start, hint0);
  states[{0, 0}] = {0, hint0};
  queue.push(hroot + shift, {start, 0});
  st.explored++;
  i32 dist = -1;

  while (true) {
    i32 qf = 0; QueueElem qe{};
    bool ok = queue.pop(qf, qe);
    assert(ok && "queue empty before target");
    (void)ok;
    qf -= shift;
    Pos pos = qe.pos;
    i32 qg = qe.g;
    DtKey key{pos.i - pos.j, qg};
    i32 qfr = pos.i + pos.j;
    auto& state = states[key];
    if (qfr < state.fr) continue;
    assert(qfr == state.fr);

    i32 ch = h.h_with_hint(pos, state.hint);
    i32 cf = qg + ch;
    assert(cf >= qf);
    if (cf > qf) {
      st.reordered++;
      queue.push(cf + shift, {pos, qg});
      continue;
    }
    st.expanded++;
    if (pos == target) { dist = qg; break; }

    i32 hint = state.hint;
    if (h.seeds.is_seed_start_or_end(pos)) h.prune(pos);

    bool is_match = pos.i < n && pos.j < m && a[pos.i] == b[pos.j];
    Pos nexts[3]; i32 costs[3]; i32 cnt = 0;
    if (is_match) {
      nexts[cnt] = {pos.i + 1, pos.j + 1}; costs[cnt++] = 0;
    } else {
      if (pos.i + 1 <= n) { nexts[cnt] = {pos.i + 1, pos.j}; costs[cnt++] = 1; }
      if (pos.j + 1 <= m) { nexts[cnt] = {pos.i, pos.j + 1}; costs[cnt++] = 1; }
      if (pos.i + 1 <= n && pos.j + 1 <= m) {
        nexts[cnt] = {pos.i + 1, pos.j + 1}; costs[cnt++] = 1;
      }
    }
    for (i32 e = 0; e < cnt; e++) {
      Pos next = nexts[e];
      i32 next_g = qg + costs[e];
      DtKey nkey{next.i - next.j, next_g};
      auto [it, inserted] = states.try_emplace(nkey);
      if (!inserted && it->second.fr >= next.i + next.j) continue;
      while (next.i < n && next.j < m && a[next.i] == b[next.j] &&
             !h.seeds.is_seed_start_or_end(next)) {
        st.extended++;
        next = {next.i + 1, next.j + 1};
      }
      i32 nh_hint = hint;
      i32 nh = h.h_with_hint(next, nh_hint);
      it->second.fr = next.i + next.j;
      it->second.hint = nh_hint;
      queue.push(next_g + nh + shift, {next, next_g});
      st.explored++;
    }
  }

  // Ukkonen-style DT traceback (`astar_dt.rs:266-338`).
  auto fr_of = [&](DtKey k) -> i32 {
    auto it = states.find(k);
    return it == states.end() ? -1 : it->second.fr;
  };
  std::string rev;
  Pos cur = target;
  DtKey cd{n - m, dist};
  i32 costchk = 0;
  while (!(cd.d == 0 && cd.g == 0)) {
    // Farthest-reaching parent among Right(D), Down(I), Sub(X)
    // with edge to_f preferences as in `astar_dt.rs:267-281`.
    struct Cand { DtKey k; char op; i32 tof; };
    Cand cands[3] = {
        {{cd.d - 1, cd.g - 1}, 'D', 1},
        {{cd.d + 1, cd.g - 1}, 'I', 0},
        {{cd.d, cd.g - 1}, 'X', 1},
    };
    i32 best = -1; char bop = 0; DtKey bk{0, 0}; i32 btof = 0;
    for (auto& c : cands) {
      if (c.k.g < 0) continue;
      i32 fr = fr_of(c.k);
      if (fr < 0) continue;
      if (fr + c.tof >= best + btof) { best = fr; bop = c.op; bk = c.k; btof = c.tof; }
    }
    assert(bop != 0);
    Pos next_pos{(best + bk.d) / 2, (best - bk.d) / 2};
    // Matches until the edge lands exactly on next_pos.
    auto back = [&](Pos p, char op) -> Pos {
      if (op == 'X') return {p.i - 1, p.j - 1};
      if (op == 'D') return {p.i - 1, p.j};
      return {p.i, p.j - 1};
    };
    while (true) {
      Pos bp = back(cur, bop);
      if (bp.i >= next_pos.i && bp.j >= next_pos.j &&
          (bp.i > next_pos.i || bp.j > next_pos.j)) {
        rev += '=';
        cur = {cur.i - 1, cur.j - 1};
      } else break;
    }
    cur = back(cur, bop);
    rev += bop;
    costchk++;
    cd = bk;
  }
  while (!(cur == start)) {
    rev += '=';
    cur = {cur.i - 1, cur.j - 1};
  }
  assert(costchk == dist);
  CigarBuilder cb;
  for (auto it = rev.rbegin(); it != rev.rend(); ++it) cb.push(*it);
  cb.flush();
  cigar_out = std::move(cb.s);
  st.pruned = h.pruner.num_pruned;
  return dist;
}

}  // namespace

// ----------------------------------------------------------------- C ABI

extern "C" {

// Align with GCSH (use_gap_cost=1) or CSH (0); prune: 0 none, 1 start,
// 2 end, 3 both; dt: diagonal-transition state space.  Returns the exact
// edit distance; *cigar_out is malloc'd (free with astarpa_free).
// stats_out (optional, len>=5): expanded, explored, extended, reordered,
// pruned.
int astarpa_align(const uint8_t* a, int n, const uint8_t* b, int m, int r,
                  int k, int prune, int dt, int use_gap_cost,
                  char** cigar_out, int64_t* stats_out) {
  GCSHInstance h;
  h.build(a, n, b, m, k, r, prune, use_gap_cost != 0);
  Stats st;
  std::string cig;
  int dist = dt ? astar_dt(a, n, b, m, h, st, cig)
                : astar_pos(a, n, b, m, h, st, cig);
  if (cigar_out) {
    *cigar_out = (char*)malloc(cig.size() + 1);
    memcpy(*cigar_out, cig.c_str(), cig.size() + 1);
  }
  if (stats_out) {
    stats_out[0] = st.expanded;
    stats_out[1] = st.explored;
    stats_out[2] = st.extended;
    stats_out[3] = st.reordered;
    stats_out[4] = st.pruned;
  }
  return dist;
}

// Default parameters of the reference's `astarpa()` (r=2, k=15,
// prune-start, DT).
int astarpa(const uint8_t* a, int n, const uint8_t* b, int m,
            char** cigar_out) {
  return astarpa_align(a, n, b, m, 2, 15, 1, 1, 1, cigar_out, nullptr);
}

// `astarpa_gcsh` parity (astarpa-c/src/lib.rs:69-95).
int astarpa_gcsh(const uint8_t* a, int n, const uint8_t* b, int m, int r,
                 int k, int prune_end, char** cigar_out) {
  return astarpa_align(a, n, b, m, r, k, prune_end ? 3 : 1, 1, 1, cigar_out,
                       nullptr);
}

void astarpa_free(char* p) { free(p); }

// Traceback through stored banded-DP window planes (one pair).
//
// Inputs are the per-column window bit-planes produced by the banded batch
// kernel (`astarpa_tpu/ops/banded.py::banded_fill`): vp/vm[(i-1)*SW + w]
// holds word w of the window after DP column i; lo[i-1] is the window's top
// word index for column i (after its shift).  Walks Match > Del > Ins > Sub
// parents from (n, m) using the banded DP's own boundary assumptions (h=+1
// entering the window top, +1/row below the window bottom), which makes any
// parent chain a valid alignment of exactly the banded cost.
//
// Returns the cost and writes a malloc'd CIGAR, or -1 on inconsistency.
int trace_banded(const uint8_t* a, int n, const uint8_t* b, int m,
                 const uint32_t* vp_cols, const uint32_t* vm_cols,
                 const int32_t* lo, int SW, char** cigar_out) {
  const i32 WW = 32;
  std::vector<u32> init_vp(SW, 0xFFFFFFFFu), init_vm(SW, 0);

  auto planes = [&](i32 i, const u32** vp, const u32** vm) {
    // Column i in 1..n; i == 0 is the initial all-ones state.
    if (i == 0) {
      *vp = init_vp.data();
      *vm = init_vm.data();
    } else {
      *vp = vp_cols + (size_t)(i - 1) * SW;
      *vm = vm_cols + (size_t)(i - 1) * SW;
    }
  };
  auto top_words = [&](i32 i) -> i32 { return i == 0 ? 0 : lo[i - 1]; };

  // top_val[i] = banded D at (i, top_words(i)*32).
  std::vector<i32> top_val(n + 1, 0);
  for (i32 i = 1; i <= n; i++) {
    i32 tv = top_val[i - 1];
    if (top_words(i) > top_words(i - 1)) {
      const u32 *pvp, *pvm;
      planes(i - 1, &pvp, &pvm);
      tv += __builtin_popcount(pvp[0]) - __builtin_popcount(pvm[0]);
    }
    tv += 1;  // active column
    top_val[i] = tv;
  }

  auto dval = [&](i32 i, i32 j) -> i32 {
    // Banded D'(i, j); requires j >= top_words(i)*32.
    i32 top = top_words(i) * WW;
    i32 rel = j - top;
    assert(rel >= 0);
    const u32 *pvp, *pvm;
    planes(i, &pvp, &pvm);
    i32 v = 0;
    i32 full = std::min(rel, SW * WW);
    for (i32 w = 0; w * WW < full; w++) {
      i32 bits = std::min(WW, full - w * WW);
      u32 mask = bits >= WW ? 0xFFFFFFFFu : ((u32(1) << bits) - 1);
      v += __builtin_popcount(pvp[w] & mask) - __builtin_popcount(pvm[w] & mask);
    }
    if (rel > SW * WW) v += rel - SW * WW;  // below-window +1/row extension
    return top_val[i] + v;
  };

  i32 i = n, j = m;
  if (j < top_words(n) * WW) return -1;  // window does not cover the corner
  i32 g = dval(n, m);
  i32 total = g;
  std::string rev;
  while (i > 0 || j > 0) {
    if (i == 0) {
      rev.append(j, 'I');
      j = 0;
      break;
    }
    if (j == 0) {
      rev.append(i, 'D');
      i = 0;
      break;
    }
    i32 top = top_words(i) * WW;
    if (j <= top) {
      // h = +1 boundary at the window top: a deletion.
      rev += 'D';
      i--;
      g--;
      continue;
    }
    bool eq = a[i - 1] == b[j - 1];
    i32 d_diag = (j - 1 >= top_words(i - 1) * WW) ? dval(i - 1, j - 1) : INF;
    i32 d_up = (j >= top_words(i - 1) * WW) ? dval(i - 1, j) : INF;
    i32 d_left = dval(i, j - 1);
    if (eq && d_diag == g) {
      rev += '=';
      i--; j--;
    } else if (d_up + 1 == g) {
      rev += 'D';
      i--; g--;
    } else if (d_left + 1 == g) {
      rev += 'I';
      j--; g--;
    } else if (d_diag + 1 == g) {
      rev += 'X';
      i--; j--; g--;
    } else {
      return -1;  // inconsistent planes
    }
  }
  if (g != 0 && i != 0) return -1;
  if (cigar_out) {
    CigarBuilder cb;
    for (auto it = rev.rbegin(); it != rev.rend(); ++it) cb.push(*it);
    cb.flush();
    *cigar_out = (char*)malloc(cb.s.size() + 1);
    memcpy(*cigar_out, cb.s.c_str(), cb.s.size() + 1);
  }
  return total;
}

}  // extern "C"
