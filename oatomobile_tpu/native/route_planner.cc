// Batched BFS route planner over the lane-waypoint graph.
//
// Host-side native runtime component: replaces the per-episode Python BFS
// (oatomobile_tpu/maps/routing.py) for large scene batches — the reference
// delegated all routing to CARLA's C++/Python A* (GlobalRoutePlanner,
// /root/reference/oatomobile/utils/carla.py:703-744), re-run every 5 steps
// per vehicle; here the whole batch of episode routes is planned in one
// native call at reset time.
//
// Graph format: CSR over W nodes (indptr[W+1], indices[E]); edges are
// ~uniform length so BFS hop count ~ metric shortest path.
//
// Build: g++ -O3 -shared -fPIC -o libroute_planner.so route_planner.cc

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Plans `num_queries` routes.  For query q: BFS from origins[q] to
// dests[q]; writes up to `capacity` waypoint ids into
// routes_out[q*capacity ...], padding the tail with the final reached
// waypoint (saturating semantics expected by the device-side follower),
// and the true length into lengths_out[q].  Unreachable destinations
// produce a length-1 route at the origin.
void plan_routes(const int32_t* indptr, const int32_t* indices,
                 int32_t num_nodes, const int32_t* origins,
                 const int32_t* dests, int32_t num_queries, int32_t capacity,
                 int32_t* routes_out, int32_t* lengths_out) {
  std::vector<int32_t> parent(num_nodes);
  std::vector<int32_t> stamp(num_nodes, -1);
  std::vector<int32_t> queue(num_nodes);
  std::vector<int32_t> path;
  path.reserve(capacity);

  for (int32_t q = 0; q < num_queries; ++q) {
    const int32_t origin = origins[q];
    const int32_t dest = dests[q];
    int32_t* route = routes_out + static_cast<int64_t>(q) * capacity;
    path.clear();

    if (origin == dest) {
      path.push_back(origin);
    } else {
      // BFS with per-query stamps (no O(W) clearing per query).
      int32_t head = 0, tail = 0;
      queue[tail++] = origin;
      stamp[origin] = q;
      parent[origin] = origin;
      bool found = false;
      while (head < tail && !found) {
        const int32_t u = queue[head++];
        for (int32_t e = indptr[u]; e < indptr[u + 1]; ++e) {
          const int32_t v = indices[e];
          if (stamp[v] == q) continue;
          stamp[v] = q;
          parent[v] = u;
          if (v == dest) {
            found = true;
            break;
          }
          queue[tail++] = v;
        }
      }
      if (found) {
        // Reconstruct (reversed), then flip.
        int32_t v = dest;
        while (v != origin) {
          path.push_back(v);
          v = parent[v];
        }
        path.push_back(origin);
        for (size_t i = 0, j = path.size() - 1; i < j; ++i, --j) {
          const int32_t tmp = path[i];
          path[i] = path[j];
          path[j] = tmp;
        }
      } else {
        path.push_back(origin);
      }
    }

    int32_t length = static_cast<int32_t>(path.size());
    if (length > capacity) length = capacity;
    lengths_out[q] = length;
    std::memcpy(route, path.data(), sizeof(int32_t) * length);
    const int32_t pad = route[length - 1];
    for (int32_t i = length; i < capacity; ++i) route[i] = pad;
  }
}

// All-pairs-from-sources next-hop table: for each source s, BFS the
// reverse graph from dests and record, per node, the first hop towards
// the destination.  Utility for future on-device dynamic re-routing.
void next_hops_to_dest(const int32_t* indptr, const int32_t* indices,
                       int32_t num_nodes, int32_t dest,
                       int32_t* next_hop_out) {
  // next_hop_out[u] = successor of u on a shortest path to dest (or u).
  // Computed by BFS from `dest` over the REVERSE graph; requires reverse
  // CSR, which callers build by transposing — here we do a forward
  // relaxation instead: repeated sweeps (graph diameter bounded by the
  // longest lane loop).  Simple and called rarely.
  std::vector<int32_t> dist(num_nodes, INT32_MAX);
  dist[dest] = 0;
  for (int32_t u = 0; u < num_nodes; ++u) next_hop_out[u] = u;
  bool changed = true;
  while (changed) {
    changed = false;
    for (int32_t u = 0; u < num_nodes; ++u) {
      for (int32_t e = indptr[u]; e < indptr[u + 1]; ++e) {
        const int32_t v = indices[e];
        if (dist[v] != INT32_MAX && dist[v] + 1 < dist[u]) {
          dist[u] = dist[v] + 1;
          next_hop_out[u] = v;
          changed = true;
        }
      }
    }
  }
}

}  // extern "C"
