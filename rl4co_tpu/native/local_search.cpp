// Batched local search kernels (C++).
//
// TPU-era replacements for the reference's native components (SURVEY.md §2.9):
// - batched TSP 2-opt: replaces the numba-njit kernel
//   `rl4co/envs/routing/tsp/local_search.py:46-81` (same best-improvement
//   2-opt-with-segment-reversal semantics, parallel over the batch).
// - CVRP route local search: replaces the HGS-CVRP (SWAP*) `.so` dependency
//   (`rl4co/envs/routing/cvrp/local_search.py`) with an in-tree
//   capacity-respecting neighborhood search (intra-route 2-opt +
//   inter-route relocate + inter-route swap), iterated to local optimality.
//
// Exposed with a plain C ABI for ctypes (no pybind11 in this image).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

inline float dist(const float* locs, int a, int b) {
  const float dx = locs[2 * a] - locs[2 * b];
  const float dy = locs[2 * a + 1] - locs[2 * b + 1];
  return std::sqrt(dx * dx + dy * dy);
}

// One best-improvement 2-opt pass over an open index range of the tour.
// Mirrors `two_opt_once` (tsp/local_search.py:46-70): reversing tour[p..q]
// replaces edges (p-1,p) and (q,q+1).
float two_opt_once(const float* locs, int32_t* tour, int n) {
  int best_p = 0, best_q = 0;
  float best_delta = 0.f;
  for (int i = 1; i < n - 1; ++i) {
    const int node_prev = tour[i - 1];
    const int node_i = tour[i];
    for (int j = i + 1; j < n; ++j) {
      const int node_j = tour[j];
      const int node_next = tour[(j + 1) % n];
      if (node_prev == node_j || node_next == node_i) continue;
      const float change = dist(locs, node_prev, node_j) +
                           dist(locs, node_i, node_next) -
                           dist(locs, node_prev, node_i) -
                           dist(locs, node_j, node_next);
      if (change < best_delta) {
        best_p = i;
        best_q = j;
        best_delta = change;
      }
    }
  }
  if (best_delta < -1e-6f) {
    std::reverse(tour + best_p, tour + best_q + 1);
    return best_delta;
  }
  return 0.f;
}

void two_opt_instance(const float* locs, int32_t* tour, int n, int max_iter) {
  float change = -1.f;
  int it = 0;
  while (change < -1e-6f && it < max_iter) {
    change = two_opt_once(locs, tour, n);
    ++it;
  }
}

void parallel_for(int count, int num_threads, const std::function<void(int)>& fn);

// ---------------- neighbor-list 2-opt + Or-opt ----------------
//
// The plain kernel above scans O(N^2) candidate pairs per *applied move*
// (best-improvement), which is O(N^3)-ish to converge — fine at N<=200,
// the bottleneck of the TSP-1000 polish. This variant is the standard
// large-instance design: k-nearest-neighbor candidate lists, first
// improvement, don't-look bits, plus Or-opt (segment relocation, lengths
// 1-3, both orientations). O(N*k) per pass.

struct NeighborLS {
  int n, k;
  const float* locs;
  std::vector<int32_t> knn;       // [n, k] neighbor ids, sorted by distance
  std::vector<int> pos;           // pos[node] = index in tour
  std::vector<uint8_t> dont_look;

  NeighborLS(const float* locs_, int n_, int k_) : n(n_), k(std::min(k_, n_ - 1)), locs(locs_) {
    knn.resize(static_cast<size_t>(n) * k);
    std::vector<std::pair<float, int>> cand(n - 1);
    for (int a = 0; a < n; ++a) {
      int c = 0;
      for (int b = 0; b < n; ++b)
        if (b != a) cand[c++] = {dist(locs, a, b), b};
      std::partial_sort(cand.begin(), cand.begin() + k, cand.end());
      for (int j = 0; j < k; ++j) knn[static_cast<size_t>(a) * k + j] = cand[j].second;
    }
    pos.resize(n);
    dont_look.assign(n, 0);
  }

  inline int succ(const int32_t* tour, int node) const {
    return tour[(pos[node] + 1) % n];
  }
  inline int pred(const int32_t* tour, int node) const {
    return tour[(pos[node] + n - 1) % n];
  }

  void reverse_segment(int32_t* tour, int i, int j) {
    // reverse tour[i..j] circularly, choosing the shorter side
    int len = (j - i + n) % n + 1;
    if (len > n / 2) {  // reverse the complement instead (same 2-opt result)
      int ni = (j + 1) % n, nj = (i - 1 + n) % n;
      i = ni; j = nj; len = n - len;
    }
    for (int s = 0; s < len / 2; ++s) {
      int a = (i + s) % n, b = (j - s + n) % n;
      std::swap(tour[a], tour[b]);
      pos[tour[a]] = a;
      pos[tour[b]] = b;
    }
    if (len & 1) pos[tour[(i + len / 2) % n]] = (i + len / 2) % n;
  }

  void wake(int node) { dont_look[node] = 0; }

  // try all 2-opt moves on the two edges incident to `a` against its
  // neighbor list; returns true if one was applied
  bool try_two_opt(int32_t* tour, int a) {
    for (int dir = 0; dir < 2; ++dir) {
      const int a2 = dir == 0 ? succ(tour, a) : pred(tour, a);
      const float d_a = dist(locs, a, a2);
      for (int j = 0; j < k; ++j) {
        const int b = knn[static_cast<size_t>(a) * k + j];
        const float d_ab = dist(locs, a, b);
        if (d_ab >= d_a) break;  // sorted neighbors: no closer candidate left
        const int b2 = dir == 0 ? succ(tour, b) : pred(tour, b);
        if (b2 == a || b == a2) continue;
        const float delta =
            d_ab + dist(locs, a2, b2) - d_a - dist(locs, b, b2);
        if (delta < -1e-6f) {
          // remove edges (a,a2),(b,b2); add (a,b),(a2,b2)
          if (dir == 0)
            reverse_segment(tour, (pos[a] + 1) % n, pos[b]);
          else
            reverse_segment(tour, pos[b], (pos[a] - 1 + n) % n);
          wake(a); wake(a2); wake(b); wake(b2);
          return true;
        }
      }
    }
    return false;
  }

  // Or-opt: relocate the segment of length L starting at `a` between a
  // neighbor b and succ(b) (or reversed); first improvement
  bool try_or_opt(int32_t* tour, int a) {
    for (int L = 1; L <= 3 && L < n - 2; ++L) {
      const int p0 = pos[a];
      const int p_end = (p0 + L - 1) % n;
      const int s_last = tour[p_end];
      const int prev = tour[(p0 + n - 1) % n];
      const int next = tour[(p_end + 1) % n];
      if (next == prev) continue;
      const float removal = dist(locs, prev, a) + dist(locs, s_last, next) -
                            dist(locs, prev, next);
      if (removal <= 1e-6f) continue;  // removing the segment must gain
      for (int j = 0; j < k; ++j) {
        const int b = knn[static_cast<size_t>(a) * k + j];
        // b must lie outside the segment and not be `prev` (no-op position)
        const int rel = (pos[b] - p0 + n) % n;
        if (rel < L || b == prev) continue;
        const int b2 = succ(tour, b);
        if ((pos[b2] - p0 + n) % n < L) continue;
        const float d_bb2 = dist(locs, b, b2);
        // forward: b -> a ... s_last -> b2 ; reversed: b -> s_last ... a -> b2
        const float ins_f =
            dist(locs, b, a) + dist(locs, s_last, b2) - d_bb2;
        const float ins_r =
            dist(locs, b, s_last) + dist(locs, a, b2) - d_bb2;
        const bool rev = ins_r < ins_f;
        const float ins = rev ? ins_r : ins_f;
        if (ins - removal < -1e-6f) {
          apply_or_opt(tour, p0, L, pos[b], rev);
          wake(prev); wake(next); wake(a); wake(s_last); wake(b); wake(b2);
          return true;
        }
      }
    }
    return false;
  }

  void apply_or_opt(int32_t* tour, int p0, int L, int pb, bool rev) {
    // extract segment, then re-insert after position pb (all circular)
    std::vector<int32_t> seg(L);
    for (int s = 0; s < L; ++s) seg[s] = tour[(p0 + s) % n];
    if (rev) std::reverse(seg.begin(), seg.end());
    std::vector<int32_t> rest(n - L);
    int idx = 0;
    for (int s = 0; s < n - L; ++s) {
      const int p = (p0 + L + s) % n;
      rest[idx++] = tour[p];
    }
    // position of b within rest: walk rest until b found (b = tour[pb])
    const int32_t b_node = tour[pb];
    int bi = 0;
    while (rest[bi] != b_node) ++bi;
    // rebuild: rest[0..bi], seg, rest[bi+1..]
    int t = 0;
    for (int s = 0; s <= bi; ++s) tour[t++] = rest[s];
    for (int s = 0; s < L; ++s) tour[t++] = seg[s];
    for (int s = bi + 1; s < n - L; ++s) tour[t++] = rest[s];
    for (int s = 0; s < n; ++s) pos[tour[s]] = s;
  }

  void run(int32_t* tour, int max_passes) {
    for (int s = 0; s < n; ++s) pos[tour[s]] = s;
    std::fill(dont_look.begin(), dont_look.end(), 0);
    for (int pass = 0; pass < max_passes; ++pass) {
      bool any = false;
      for (int node = 0; node < n; ++node) {
        if (dont_look[node]) continue;
        bool moved = try_two_opt(tour, node);
        if (!moved) moved = try_or_opt(tour, node);
        if (moved)
          any = true;
        else
          dont_look[node] = 1;
      }
      if (!any) break;
    }
  }
};

// ---------------- CVRP ----------------

struct Routes {
  // routes as flat sequence with depot separators handled by caller
  std::vector<std::vector<int>> r;
};

float route_len(const float* locs, const std::vector<int>& route) {
  if (route.empty()) return 0.f;
  float len = dist(locs, 0, route.front());
  for (size_t i = 0; i + 1 < route.size(); ++i)
    len += dist(locs, route[i], route[i + 1]);
  len += dist(locs, route.back(), 0);
  return len;
}

// intra-route 2-opt on one route (depot fixed at both ends)
bool intra_two_opt(const float* locs, std::vector<int>& route) {
  const int m = static_cast<int>(route.size());
  if (m < 3) return false;
  bool improved = false;
  for (int i = 0; i < m - 1; ++i) {
    for (int j = i + 1; j < m; ++j) {
      const int a = (i == 0) ? 0 : route[i - 1];
      const int b = route[i];
      const int c = route[j];
      const int d = (j == m - 1) ? 0 : route[j + 1];
      const float change = dist(locs, a, c) + dist(locs, b, d) -
                           dist(locs, a, b) - dist(locs, c, d);
      if (change < -1e-6f) {
        std::reverse(route.begin() + i, route.begin() + j + 1);
        improved = true;
      }
    }
  }
  return improved;
}

// inter-route relocate + swap (SWAP*-inspired moves, capacity-feasible)
bool inter_moves(const float* locs, const float* demand, float capacity,
                 std::vector<std::vector<int>>& routes,
                 std::vector<float>& loads) {
  bool improved = false;
  const int nr = static_cast<int>(routes.size());
  for (int r1 = 0; r1 < nr; ++r1) {
    for (int r2 = 0; r2 < nr; ++r2) {
      if (r1 == r2) continue;
      // relocate: move customer from r1 into best position of r2
      for (size_t i = 0; i < routes[r1].size(); ++i) {
        const int cust = routes[r1][i];
        const float d = demand[cust];
        if (loads[r2] + d > capacity + 1e-6f) continue;
        const int prev = (i == 0) ? 0 : routes[r1][i - 1];
        const int next = (i + 1 == routes[r1].size()) ? 0 : routes[r1][i + 1];
        const float removal_gain = dist(locs, prev, cust) + dist(locs, cust, next) -
                                   dist(locs, prev, next);
        float best_ins = 1e30f;
        int best_pos = -1;
        const int m2 = static_cast<int>(routes[r2].size());
        for (int pos = 0; pos <= m2; ++pos) {
          const int a = (pos == 0) ? 0 : routes[r2][pos - 1];
          const int b = (pos == m2) ? 0 : routes[r2][pos];
          const float ins = dist(locs, a, cust) + dist(locs, cust, b) -
                            dist(locs, a, b);
          if (ins < best_ins) {
            best_ins = ins;
            best_pos = pos;
          }
        }
        if (best_ins - removal_gain < -1e-6f) {
          routes[r1].erase(routes[r1].begin() + i);
          routes[r2].insert(routes[r2].begin() + best_pos, cust);
          loads[r1] -= d;
          loads[r2] += d;
          improved = true;
          if (i >= routes[r1].size()) break;
        }
      }
    }
  }
  // swap: exchange one customer between two routes (in place), when both
  // directions are capacity-feasible and the combined delta improves
  for (int r1 = 0; r1 < nr; ++r1) {
    for (int r2 = r1 + 1; r2 < nr; ++r2) {
      for (size_t i = 0; i < routes[r1].size(); ++i) {
        const int c1 = routes[r1][i];
        const float d1 = demand[c1];
        const int p1 = (i == 0) ? 0 : routes[r1][i - 1];
        const int n1 = (i + 1 == routes[r1].size()) ? 0 : routes[r1][i + 1];
        for (size_t j = 0; j < routes[r2].size(); ++j) {
          const int c2 = routes[r2][j];
          const float d2 = demand[c2];
          if (loads[r1] - d1 + d2 > capacity + 1e-6f ||
              loads[r2] - d2 + d1 > capacity + 1e-6f)
            continue;
          const int p2 = (j == 0) ? 0 : routes[r2][j - 1];
          const int n2 = (j + 1 == routes[r2].size()) ? 0 : routes[r2][j + 1];
          const float delta =
              dist(locs, p1, c2) + dist(locs, c2, n1) - dist(locs, p1, c1) -
              dist(locs, c1, n1) + dist(locs, p2, c1) + dist(locs, c1, n2) -
              dist(locs, p2, c2) - dist(locs, c2, n2);
          if (delta < -1e-6f) {
            routes[r1][i] = c2;
            routes[r2][j] = c1;
            loads[r1] += d2 - d1;
            loads[r2] += d1 - d2;
            improved = true;
            break;  // c1/p1/n1 are stale — move to the next i
          }
        }
      }
    }
  }
  return improved;
}

void cvrp_ls_instance(const float* locs, const float* demand, float capacity,
                      int32_t* actions, int seq_len, int max_iter) {
  // parse flat action sequence (0 = depot) into routes
  std::vector<std::vector<int>> routes;
  std::vector<int> cur;
  for (int t = 0; t < seq_len; ++t) {
    const int a = actions[t];
    if (a == 0) {
      if (!cur.empty()) routes.push_back(cur);
      cur.clear();
    } else {
      cur.push_back(a);
    }
  }
  if (!cur.empty()) routes.push_back(cur);

  std::vector<float> loads(routes.size(), 0.f);
  for (size_t r = 0; r < routes.size(); ++r)
    for (int c : routes[r]) loads[r] += demand[c];

  bool improved = true;
  int it = 0;
  while (improved && it < max_iter) {
    improved = false;
    for (auto& route : routes) improved |= intra_two_opt(locs, route);
    improved |= inter_moves(locs, demand, capacity, routes, loads);
    ++it;
  }

  // write back: routes separated by depot, padded with trailing zeros
  int t = 0;
  for (const auto& route : routes) {
    if (route.empty()) continue;
    for (int c : route) {
      if (t < seq_len) actions[t++] = c;
    }
    if (t < seq_len) actions[t++] = 0;
  }
  while (t < seq_len) actions[t++] = 0;
}

void parallel_for(int count, int num_threads, const std::function<void(int)>& fn) {
  if (num_threads <= 1) {
    for (int i = 0; i < count; ++i) fn(i);
    return;
  }
  std::vector<std::thread> threads;
  std::atomic<int> next(0);
  for (int w = 0; w < num_threads; ++w) {
    threads.emplace_back([&]() {
      int i;
      while ((i = next.fetch_add(1)) < count) fn(i);
    });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// locs: [B, N, 2] float32; tours: [B, N] int32 visiting order (in-place)
void batched_two_opt(const float* locs, int32_t* tours, int batch, int n,
                     int max_iterations, int num_threads) {
  parallel_for(batch, num_threads, [&](int b) {
    two_opt_instance(locs + 2 * static_cast<size_t>(b) * n,
                     tours + static_cast<size_t>(b) * n, n, max_iterations);
  });
}

// Neighbor-list 2-opt + Or-opt (first improvement, don't-look bits):
// the large-N kernel. locs: [B, N, 2]; tours: [B, N] in-place;
// k = candidate-list size (e.g. 12); max_passes bounds full sweeps.
void batched_two_opt_nl(const float* locs, int32_t* tours, int batch, int n,
                        int k, int max_passes, int num_threads) {
  parallel_for(batch, num_threads, [&](int b) {
    NeighborLS ls(locs + 2 * static_cast<size_t>(b) * n, n, k);
    ls.run(tours + static_cast<size_t>(b) * n, max_passes);
  });
}

// locs: [B, N+1, 2] (depot row 0); demand: [B, N+1] (depot 0), normalized;
// actions: [B, T] flat giant tours with depot separators (in-place)
void batched_cvrp_local_search(const float* locs, const float* demand,
                               float capacity, int32_t* actions, int batch,
                               int n_nodes, int seq_len, int max_iterations,
                               int num_threads) {
  parallel_for(batch, num_threads, [&](int b) {
    cvrp_ls_instance(locs + 2 * static_cast<size_t>(b) * n_nodes,
                     demand + static_cast<size_t>(b) * n_nodes, capacity,
                     actions + static_cast<size_t>(b) * seq_len, seq_len,
                     max_iterations);
  });
}

}  // extern "C"
