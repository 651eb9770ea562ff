// graphcore: native graph kernels for the TPU-native SfM framework.
//
// Counterpart of the reference's native graph layer:
//   - UnionFind / connected components (ref src/graph/union_find.{h,cpp},
//     graph.inl:513 LargestConnectedComponent)
//   - Kruskal MST (ref graph.inl:340)
//   - triangle (triplet) enumeration feeding the rotation-cycle filter
//     (ref base/triplet_extractor.h + view_graph.cpp:115)
//   - Clauset-Newman-Moore greedy modularity communities (replaces the
//     vendored igraph fast-greedy used by community_detection_cluster.cpp:56)
//
// The Python layer (dagsfm_tpu/graph, dagsfm_tpu/clustering) calls these
// through ctypes and falls back to pure-Python implementations when the
// shared library is absent. Exposed as a plain C ABI; all buffers are
// caller-allocated except where noted.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <map>
#include <numeric>
#include <queue>
#include <set>
#include <unordered_map>
#include <unordered_set>
#include <vector>

extern "C" {

struct UF {
  std::vector<int64_t> parent;
  std::vector<int32_t> rank_;
  explicit UF(int64_t n) : parent(n), rank_(n, 0) {
    std::iota(parent.begin(), parent.end(), 0);
  }
  int64_t find(int64_t x) {
    int64_t root = x;
    while (parent[root] != root) root = parent[root];
    while (parent[x] != root) {
      int64_t nxt = parent[x];
      parent[x] = root;
      x = nxt;
    }
    return root;
  }
  void unite(int64_t a, int64_t b) {
    int64_t ra = find(a), rb = find(b);
    if (ra == rb) return;
    if (rank_[ra] < rank_[rb]) std::swap(ra, rb);
    parent[rb] = ra;
    if (rank_[ra] == rank_[rb]) rank_[ra]++;
  }
};

// Connected-component labels (0..n_components-1, densely renumbered).
// Returns the number of components.
int64_t gc_connected_components(int64_t num_nodes, int64_t num_edges,
                                const int64_t* edges, int64_t* labels_out) {
  UF uf(num_nodes);
  for (int64_t e = 0; e < num_edges; ++e)
    uf.unite(edges[2 * e], edges[2 * e + 1]);
  std::unordered_map<int64_t, int64_t> remap;
  remap.reserve(num_nodes);
  for (int64_t v = 0; v < num_nodes; ++v) {
    int64_t r = uf.find(v);
    auto it = remap.find(r);
    if (it == remap.end()) {
      int64_t id = (int64_t)remap.size();
      remap.emplace(r, id);
      labels_out[v] = id;
    } else {
      labels_out[v] = it->second;
    }
  }
  return (int64_t)remap.size();
}

// Largest connected component: writes 1/0 into mask_out, returns its size.
int64_t gc_largest_cc(int64_t num_nodes, int64_t num_edges,
                      const int64_t* edges, uint8_t* mask_out) {
  std::vector<int64_t> labels(num_nodes);
  int64_t nc = gc_connected_components(num_nodes, num_edges, edges,
                                       labels.data());
  std::vector<int64_t> count(nc, 0);
  for (int64_t v = 0; v < num_nodes; ++v) count[labels[v]]++;
  int64_t best = std::max_element(count.begin(), count.end()) - count.begin();
  int64_t size = 0;
  for (int64_t v = 0; v < num_nodes; ++v) {
    mask_out[v] = labels[v] == best ? 1 : 0;
    size += mask_out[v];
  }
  return size;
}

// Kruskal spanning tree. maximize != 0 -> maximum spanning tree.
// Writes selected edge indices into out_edge_idx; returns count.
int64_t gc_kruskal(int64_t num_nodes, int64_t num_edges, const int64_t* edges,
                   const double* weights, int32_t maximize,
                   int64_t* out_edge_idx) {
  std::vector<int64_t> order(num_edges);
  std::iota(order.begin(), order.end(), 0);
  if (maximize)
    std::stable_sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
      return weights[a] > weights[b];
    });
  else
    std::stable_sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
      return weights[a] < weights[b];
    });
  UF uf(num_nodes);
  int64_t k = 0;
  for (int64_t e : order) {
    int64_t i = edges[2 * e], j = edges[2 * e + 1];
    if (uf.find(i) != uf.find(j)) {
      uf.unite(i, j);
      out_edge_idx[k++] = e;
    }
  }
  return k;
}

// Triangle enumeration. Nodes must be < num_nodes. Writes (i, j, k) rows
// (each triangle once, i<j<k by *edge order* neighbor sets) into out until
// max_out triangles; returns number written (or total found if smaller).
int64_t gc_triangles(int64_t num_nodes, int64_t num_edges,
                     const int64_t* edges, int64_t* out, int64_t max_out) {
  std::vector<std::vector<int64_t>> adj(num_nodes);
  for (int64_t e = 0; e < num_edges; ++e) {
    int64_t i = edges[2 * e], j = edges[2 * e + 1];
    if (i == j) continue;
    adj[i].push_back(j);
    adj[j].push_back(i);
  }
  for (auto& v : adj) {
    std::sort(v.begin(), v.end());
    v.erase(std::unique(v.begin(), v.end()), v.end());
  }
  int64_t count = 0;
  for (int64_t e = 0; e < num_edges; ++e) {
    int64_t i = edges[2 * e], j = edges[2 * e + 1];
    if (i == j) continue;
    const auto& ai = adj[i];
    const auto& aj = adj[j];
    // intersect neighbor lists, take k > max(i, j) to count each once per
    // edge pair orientation (k > j guarantees i<j<k ordering when i<j)
    int64_t lo = std::max(i, j);
    size_t a = 0, b = 0;
    while (a < ai.size() && b < aj.size()) {
      if (ai[a] < aj[b]) ++a;
      else if (ai[a] > aj[b]) ++b;
      else {
        int64_t k = ai[a];
        if (k > lo) {
          if (count < max_out) {
            out[3 * count] = std::min(i, j);
            out[3 * count + 1] = std::max(i, j);
            out[3 * count + 2] = k;
          }
          ++count;
        }
        ++a;
        ++b;
      }
    }
  }
  return std::min(count, max_out);
}

// Clauset-Newman-Moore greedy modularity. Writes dense community labels;
// returns the number of communities.
int64_t gc_cnm_communities(int64_t num_nodes, int64_t num_edges,
                           const int64_t* edges, const double* weights,
                           int64_t* labels_out) {
  double m2 = 0;
  for (int64_t e = 0; e < num_edges; ++e) m2 += 2.0 * weights[e];
  if (m2 <= 0 || num_nodes == 0) {
    for (int64_t v = 0; v < num_nodes; ++v) labels_out[v] = 0;
    return num_nodes ? 1 : 0;
  }
  std::vector<int64_t> comm(num_nodes);
  std::iota(comm.begin(), comm.end(), 0);
  std::vector<double> a(num_nodes, 0.0);
  std::vector<std::unordered_map<int64_t, double>> ew(num_nodes);
  for (int64_t e = 0; e < num_edges; ++e) {
    int64_t i = edges[2 * e], j = edges[2 * e + 1];
    if (i == j) continue;
    double w = weights[e];
    a[i] += w;
    a[j] += w;
    ew[i][j] += w;
    ew[j][i] += w;
  }
  auto dq = [&](int64_t ci, int64_t cj) {
    auto it = ew[ci].find(cj);
    double eij = it == ew[ci].end() ? 0.0 : it->second;
    return 2.0 * (eij / m2 - (a[ci] / m2) * (a[cj] / m2));
  };
  using Entry = std::pair<double, std::pair<int64_t, int64_t>>;
  std::priority_queue<Entry> heap;
  for (int64_t i = 0; i < num_nodes; ++i)
    for (auto& kv : ew[i])
      if (i < kv.first) heap.push({dq(i, kv.first), {i, kv.first}});
  std::vector<uint8_t> alive(num_nodes, 1);
  // union-find over communities to track merged membership lazily
  UF uf(num_nodes);
  while (!heap.empty()) {
    auto top = heap.top();
    heap.pop();
    double gain = top.first;
    if (gain <= 0) break;
    int64_t ci = top.second.first, cj = top.second.second;
    if (!alive[ci] || !alive[cj]) continue;
    double cur = dq(ci, cj);
    if (std::abs(gain - cur) > 1e-12) {
      if (cur > 0) heap.push({cur, {ci, cj}});
      continue;
    }
    // merge cj into ci
    alive[cj] = 0;
    uf.unite(cj, ci);
    // make ci the representative in uf: unite may pick either; fix below
    for (auto& kv : ew[cj]) {
      int64_t ck = kv.first;
      if (ck == ci) continue;
      ew[ci][ck] += kv.second;
      ew[ck][ci] += kv.second;
      ew[ck].erase(cj);
    }
    ew[ci].erase(cj);
    ew[cj].clear();
    a[ci] += a[cj];
    a[cj] = 0;
    for (auto& kv : ew[ci]) {
      int64_t ck = kv.first;
      if (alive[ck]) {
        double g = dq(std::min(ci, ck), std::max(ci, ck));
        if (g > 0) heap.push({g, {std::min(ci, ck), std::max(ci, ck)}});
      }
    }
  }
  // resolve representative communities: root -> alive node of its set
  std::unordered_map<int64_t, int64_t> root_label;
  int64_t next = 0;
  for (int64_t v = 0; v < num_nodes; ++v) {
    int64_t r = uf.find(v);
    auto it = root_label.find(r);
    if (it == root_label.end()) {
      root_label.emplace(r, next);
      labels_out[v] = next++;
    } else {
      labels_out[v] = it->second;
    }
  }
  return next;
}


// ---------------------------------------------------------------------------
// Multilevel normalized cut (Graclus-style weighted kernel k-means).
//
// Counterpart of the vendored Graclus/Metis cut used by NCutCluster
// (ref src/clustering/ncut_cluster.cpp:39-54 -> base/graph_cut.cc:40-191,
// lib/Graclus ~25k LoC). Same three phases: (1) coarsen by heavy-edge
// matching, (2) balanced region-growing base partition, (3) uncoarsen with
// weighted-kernel-k-means boundary refinement minimizing the normalized
// cut objective  sum_c links(c, V\c) / deg(c).
// Returns the number of non-empty parts; labels_out gets 0..k-1.
// ---------------------------------------------------------------------------
int64_t gc_ncut(int64_t num_nodes, int64_t num_edges, const int64_t* edges,
                const double* weights, int64_t num_parts, uint64_t seed,
                int64_t* labels_out) {
  if (num_parts <= 1 || num_nodes <= num_parts) {
    for (int64_t v = 0; v < num_nodes; ++v)
      labels_out[v] = (num_parts <= 1) ? 0 : (v % num_parts);
    return num_parts <= 1 ? 1 : std::min(num_nodes, num_parts);
  }
  struct Level {
    std::vector<std::unordered_map<int64_t, double>> adj;  // merged multigraph
    std::vector<int64_t> node_w;   // #original nodes folded in
    std::vector<int64_t> parent;   // map into next-coarser level
  };
  std::vector<Level> levels(1);
  Level& L0 = levels[0];
  L0.adj.assign(num_nodes, {});
  L0.node_w.assign(num_nodes, 1);
  for (int64_t e = 0; e < num_edges; ++e) {
    int64_t a = edges[2 * e], b = edges[2 * e + 1];
    if (a == b) continue;
    double w = weights ? weights[e] : 1.0;
    L0.adj[a][b] += w;
    L0.adj[b][a] += w;
  }

  // --- phase 1: coarsen by heavy-edge matching
  uint64_t rng = seed * 6364136223846793005ULL + 1442695040888963407ULL;
  auto next_rand = [&rng]() {
    rng ^= rng << 13; rng ^= rng >> 7; rng ^= rng << 17;
    return rng;
  };
  int64_t target = std::max<int64_t>(20 * num_parts, 64);
  while ((int64_t)levels.back().adj.size() > target) {
    Level& cur = levels.back();
    int64_t n = cur.adj.size();
    std::vector<int64_t> order(n);
    std::iota(order.begin(), order.end(), 0);
    for (int64_t i = n - 1; i > 0; --i)
      std::swap(order[i], order[next_rand() % (i + 1)]);
    std::vector<int64_t> match(n, -1);
    int64_t merged = 0;
    for (int64_t v : order) {
      if (match[v] >= 0) continue;
      int64_t best = -1;
      double best_w = -1.0;
      for (auto& [u, w] : cur.adj[v])
        if (match[u] < 0 && w > best_w) { best_w = w; best = u; }
      if (best >= 0) { match[v] = best; match[best] = v; ++merged; }
      else match[v] = v;
    }
    if (merged == 0) break;
    cur.parent.assign(n, -1);
    int64_t m = 0;
    for (int64_t v = 0; v < n; ++v) {
      if (cur.parent[v] >= 0) continue;
      cur.parent[v] = m;
      if (match[v] != v) cur.parent[match[v]] = m;
      ++m;
    }
    Level nxt;
    nxt.adj.assign(m, {});
    nxt.node_w.assign(m, 0);
    for (int64_t v = 0; v < n; ++v) {
      int64_t pv = cur.parent[v];
      nxt.node_w[pv] += cur.node_w[v];
      for (auto& [u, w] : cur.adj[v]) {
        int64_t pu = cur.parent[u];
        if (pu != pv) nxt.adj[pv][pu] += w;  // halves double-count below
      }
    }
    // every edge visited twice (v->u and u->v): weights already symmetric
    levels.push_back(std::move(nxt));
  }

  // --- phase 2: balanced region growing on the coarsest graph
  Level& top = levels.back();
  int64_t n_top = top.adj.size();
  std::vector<int64_t> label(n_top, -1);
  std::vector<double> part_load(num_parts, 0.0);
  double total_w = 0;
  for (int64_t v = 0; v < n_top; ++v) total_w += top.node_w[v];
  double cap = total_w / num_parts;
  // seeds: spread by picking the heaviest unassigned node each time
  typedef std::pair<double, int64_t> QE;  // (-priority, node)
  for (int64_t c = 0; c < num_parts; ++c) {
    int64_t seed_v = -1;
    for (int64_t v = 0; v < n_top; ++v)
      if (label[v] < 0 && (seed_v < 0 ||
                           top.node_w[v] > top.node_w[seed_v]))
        seed_v = v;
    if (seed_v < 0) break;
    std::priority_queue<QE> q;
    q.push({0.0, seed_v});
    while (!q.empty() && part_load[c] < cap) {
      auto [pw, v] = q.top(); q.pop();
      if (label[v] >= 0) continue;
      label[v] = c;
      part_load[c] += top.node_w[v];
      for (auto& [u, w] : top.adj[v])
        if (label[u] < 0) q.push({w, u});
    }
  }
  for (int64_t v = 0; v < n_top; ++v)
    if (label[v] < 0) {
      // attach leftovers to lightest part
      int64_t c = std::min_element(part_load.begin(), part_load.end())
                  - part_load.begin();
      label[v] = c;
      part_load[c] += top.node_w[v];
    }

  // --- phase 3: uncoarsen + kernel-k-means refinement at every level
  for (int64_t li = (int64_t)levels.size() - 1; li >= 0; --li) {
    Level& cur = levels[li];
    int64_t n = cur.adj.size();
    std::vector<int64_t> lab;
    if (li == (int64_t)levels.size() - 1) {
      lab = label;
    } else {
      lab.resize(n);
      for (int64_t v = 0; v < n; ++v) lab[v] = label[cur.parent[v]];
    }
    // degrees + cluster stats
    std::vector<double> deg(n, 0.0);
    for (int64_t v = 0; v < n; ++v)
      for (auto& [u, w] : cur.adj[v]) deg[v] += w;
    std::vector<double> W(num_parts, 1e-12);   // sum of degrees
    for (int64_t v = 0; v < n; ++v) W[lab[v]] += deg[v];
    // refinement sweeps: move boundary nodes by NCut gain
    for (int sweep = 0; sweep < 5; ++sweep) {
      int64_t moves = 0;
      for (int64_t v = 0; v < n; ++v) {
        if (deg[v] <= 0) continue;
        std::unordered_map<int64_t, double> links;
        for (auto& [u, w] : cur.adj[v]) links[lab[u]] += w;
        int64_t cv = lab[v];
        double best_gain = 1e-12;
        int64_t best_c = cv;
        double base = links[cv] / std::max(W[cv] - deg[v], 1e-12);
        for (auto& [c, lw] : links) {
          if (c == cv) continue;
          double gain = lw / (W[c] + deg[v]) - base;
          if (gain > best_gain) { best_gain = gain; best_c = c; }
        }
        if (best_c != cv) {
          W[cv] -= deg[v];
          W[best_c] += deg[v];
          lab[v] = best_c;
          ++moves;
        }
      }
      if (moves == 0) break;
    }
    label = std::move(lab);
  }

  // densify labels
  std::vector<int64_t> remap(num_parts, -1);
  int64_t k = 0;
  for (int64_t v = 0; v < num_nodes; ++v) {
    if (remap[label[v]] < 0) remap[label[v]] = k++;
    labels_out[v] = remap[label[v]];
  }
  return k;
}

}  // extern "C"
