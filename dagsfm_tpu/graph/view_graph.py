"""View graph: image nodes + two-view geometry edges (host bookkeeping).

TPU-native counterpart of /root/reference/src/graph/{graph,image_graph,
view_graph}.{h,cpp}: largest-connected-component extraction
(graph.inl:513 / image_graph.cpp:8), Kruskal MST (graph.inl:340) and
triplet rotation-cycle filtering (view_graph.cpp:115). Graph-shaped logic
stays on host; the cycle check itself is one batched device call over all
triplets.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class TwoViewEdge:
    """Edge payload (ref: sfm/twoview_info.h:82-105)."""
    image_id1: int
    image_id2: int
    rotation: np.ndarray        # R_12 with R_2 = R_12 @ R_1 (3,3)
    position: np.ndarray        # t direction (3,)
    num_inliers: int
    visibility_score: float = 0.0


class UnionFind:
    """DSU (ref: graph/union_find.h)."""

    def __init__(self, n: int):
        self.parent = list(range(n))
        self.rank = [0] * n

    def find(self, x: int) -> int:
        root = x
        while self.parent[root] != root:
            root = self.parent[root]
        while self.parent[x] != root:
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if self.rank[ra] < self.rank[rb]:
            ra, rb = rb, ra
        self.parent[rb] = ra
        if self.rank[ra] == self.rank[rb]:
            self.rank[ra] += 1


class ViewGraph:
    def __init__(self):
        self.edges: dict[tuple, TwoViewEdge] = {}
        self.nodes: set = set()

    def add_edge(self, edge: TwoViewEdge) -> None:
        i, j = edge.image_id1, edge.image_id2
        assert i != j
        if i > j:
            # store canonically with i < j; invert the relative geometry
            edge = TwoViewEdge(j, i, edge.rotation.T,
                               -edge.rotation @ edge.position,
                               edge.num_inliers, edge.visibility_score)
            i, j = j, i
        self.edges[(i, j)] = edge
        self.nodes.add(i)
        self.nodes.add(j)

    def neighbors(self, i: int):
        for (a, b) in self.edges:
            if a == i:
                yield b
            elif b == i:
                yield a

    def num_edges(self) -> int:
        return len(self.edges)

    # ------------------------------------------------------------ components
    def largest_connected_component(self) -> set:
        """Node set of the largest CC (ref: image_graph.cpp:8)."""
        ids = sorted(self.nodes)
        index = {v: k for k, v in enumerate(ids)}
        uf = UnionFind(len(ids))
        for (i, j) in self.edges:
            uf.union(index[i], index[j])
        groups: dict[int, list] = {}
        for v in ids:
            groups.setdefault(uf.find(index[v]), []).append(v)
        if not groups:
            return set()
        return set(max(groups.values(), key=len))

    def subgraph(self, keep: set) -> "ViewGraph":
        out = ViewGraph()
        out.nodes = set(keep)
        for (i, j), e in self.edges.items():
            if i in keep and j in keep:
                out.edges[(i, j)] = e
        return out

    # ------------------------------------------------------------------- MST
    def maximum_spanning_tree(self, weight=lambda e: e.num_inliers):
        """Kruskal max-weight spanning tree; returns edge key list."""
        ids = sorted(self.nodes)
        index = {v: k for k, v in enumerate(ids)}
        uf = UnionFind(len(ids))
        out = []
        for key, e in sorted(self.edges.items(),
                             key=lambda kv: -weight(kv[1])):
            i, j = key
            if uf.find(index[i]) != uf.find(index[j]):
                uf.union(index[i], index[j])
                out.append(key)
        return out

    # -------------------------------------------------------------- triplets
    def triplets(self):
        """All edge triangles (i, j, k), i<j<k with all three edges."""
        adj: dict[int, set] = {}
        for (i, j) in self.edges:
            adj.setdefault(i, set()).add(j)
            adj.setdefault(j, set()).add(i)
        out = []
        for (i, j) in self.edges:
            common = adj[i] & adj[j]
            for k in common:
                if k > j:
                    out.append((i, j, k))
        return out

    def filter_cycles_by_rotation(self, max_angle_deg: float = 5.0) -> int:
        """Drop edges whose triplet rotation cycles never close.

        Ref: ViewGraph::FilterViewGraphCyclesByRotation (view_graph.cpp:115,
        called with 5 deg at distributed_mapper_controller.cpp:153): an edge
        survives if it belongs to >= 1 triplet whose composed rotation
        R_ki @ R_jk @ R_ij is within max_angle of identity; edges in no
        triplet are dropped too. The cycle deviations for ALL triplets are
        computed in one batched device call.
        """
        tris = self.triplets()
        if not tris:
            n = len(self.edges)
            self.edges = {}
            return n

        import jax.numpy as jnp
        R12 = np.stack([self._rel(i, j) for (i, j, k) in tris])
        R23 = np.stack([self._rel(j, k) for (i, j, k) in tris])
        R31 = np.stack([self._rel(k, i) for (i, j, k) in tris])
        cyc = jnp.asarray(R31) @ jnp.asarray(R23) @ jnp.asarray(R12)
        tr = jnp.trace(cyc, axis1=-2, axis2=-1)
        ang = np.degrees(np.arccos(np.clip((np.asarray(tr) - 1) / 2, -1, 1)))
        good_tri = ang < max_angle_deg

        keep: set = set()
        for t, (i, j, k) in enumerate(tris):
            if good_tri[t]:
                keep.update({tuple(sorted((i, j))), tuple(sorted((j, k))),
                             tuple(sorted((i, k)))})
        before = len(self.edges)
        self.edges = {k: v for k, v in self.edges.items() if k in keep}
        return before - len(self.edges)

    def _rel(self, i: int, j: int) -> np.ndarray:
        """R_ij with R_j = R_ij @ R_i, from the stored canonical edge."""
        if i < j:
            return self.edges[(i, j)].rotation
        return self.edges[(j, i)].rotation.T
