"""Cluster merging: Sim(3)-align per-cluster reconstructions into one.

TPU-native counterpart of /root/reference/src/controllers/sfm_aligner.
{h,cpp}: build a reconstruction graph whose edge weight is the max of the
two directional RANSAC-Sim(3) mean alignment errors over common 3D points
(ComputeEdgeWeight :260, FindCommon3DPoints :96, FindSimilarityTransform
:50), extract the largest CC, take the minimum-error MST (:173-198),
choose the anchor by iterative leaf peeling (:329-385), compose Sim(3)
paths to the anchor (:387-417), and fold every reconstruction into the
anchor via Reconstruction.merge (:419-447). Separator images (registered
in >1 cluster) are recorded for retriangulation + final-BA RMSE reporting
(:272-274).

The RANSAC-Umeyama per edge is the batched device kernel from
ops/umeyama; everything else is host graph logic.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from dagsfm_tpu.graph.view_graph import UnionFind
from dagsfm_tpu.ops.umeyama import ransac_umeyama
from dagsfm_tpu.scene.reconstruction import Reconstruction


@dataclasses.dataclass
class AlignerOptions:
    min_common_points: int = 10
    ransac_threshold: float = 0.1    # relative to scene scale
    ransac_iters: int = 256
    max_edge_error: float = 1e9      # keep all edges, MST picks best
    seed: int = 0


@dataclasses.dataclass
class Sim3:
    scale: float
    R: np.ndarray
    t: np.ndarray

    def apply(self, x: np.ndarray) -> np.ndarray:
        return self.scale * x @ self.R.T + self.t

    def compose(self, other: "Sim3") -> "Sim3":
        """self ∘ other: apply other first, then self."""
        return Sim3(self.scale * other.scale,
                    self.R @ other.R,
                    self.scale * self.R @ other.t + self.t)

    @staticmethod
    def identity() -> "Sim3":
        return Sim3(1.0, np.eye(3), np.zeros(3))

    def inverse(self) -> "Sim3":
        Rinv = self.R.T
        s = 1.0 / self.scale
        return Sim3(s, Rinv, -s * Rinv @ self.t)


def find_common_points(rec_a: Reconstruction, rec_b: Reconstruction):
    """3D point pairs observed at the same (image name, keypoint) in both.

    Ref: SfMAligner::FindCommon3DPoints (sfm_aligner.cpp:96-123).
    Returns (Xa (N,3), Xb (N,3)).
    """
    common = rec_a.find_common_reg_image_ids(rec_b)
    xa, xb = [], []
    seen = set()
    for (ia, ib) in common:
        im_a = rec_a.images[ia]
        im_b = rec_b.images[ib]
        K = min(len(im_a.point3D_ids), len(im_b.point3D_ids))
        for k in range(K):
            pa = int(im_a.point3D_ids[k])
            pb = int(im_b.point3D_ids[k])
            if pa < 0 or pb < 0:
                continue
            if (pa, pb) in seen:
                continue
            seen.add((pa, pb))
            xa.append(rec_a.points3D[pa].xyz)
            xb.append(rec_b.points3D[pb].xyz)
    if not xa:
        return np.zeros((0, 3)), np.zeros((0, 3))
    return np.stack(xa), np.stack(xb)


def find_similarity(xa: np.ndarray, xb: np.ndarray,
                    opts: AlignerOptions, key) -> tuple:
    """RANSAC Sim(3) xb ≈ s R xa + t. Returns (Sim3, mean_inlier_error).

    Ref: FindSimilarityTransform (sfm_aligner.cpp:50-94) = RansacSimilarity
    + FindRTS + Refine_RTS; here one batched ransac_umeyama call.
    """
    n = len(xa)
    pad = 64
    while pad < n:
        pad *= 2
    scale = np.abs(xb - xb.mean(0)).mean() + 1e-9
    xap = np.zeros((pad, 3))
    xbp = np.zeros((pad, 3))
    xap[:n] = xa
    xbp[:n] = xb
    mask = np.zeros(pad, bool)
    mask[:n] = True
    s, R, t, inl, n_inl = ransac_umeyama(
        jnp.asarray(xap), jnp.asarray(xbp), jnp.asarray(mask), key,
        num_iters=opts.ransac_iters,
        threshold=opts.ransac_threshold * scale)
    s = float(s)
    R = np.asarray(R)
    t = np.asarray(t)
    pred = s * xa @ R.T + t
    err = np.linalg.norm(pred - xb, axis=1)
    inl_np = np.asarray(inl)[:n]
    if inl_np.sum() < 3:
        return Sim3(s, R, t), np.inf
    return Sim3(s, R, t), float(err[inl_np].mean())


class SfMAligner:
    def __init__(self, reconstructions: list,
                 options: AlignerOptions | None = None):
        self.recs = reconstructions
        self.opts = options or AlignerOptions()
        self.sim3 = {}           # (a, b) -> Sim3 mapping a-coords -> b-coords
        self.edge_err = {}
        self.separators: set = set()   # image names in >1 cluster
        self.anchor = None
        self.paths = {}
        self._key = jax.random.PRNGKey(self.opts.seed)

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    # -------------------------------------------------------------- graph
    def construct_graph(self):
        n = len(self.recs)
        for a in range(n):
            for b in range(a + 1, n):
                xa, xb = find_common_points(self.recs[a], self.recs[b])
                if len(xa) < self.opts.min_common_points:
                    continue
                s_ab, e_ab = find_similarity(xa, xb, self.opts,
                                             self._next_key())
                s_ba, e_ba = find_similarity(xb, xa, self.opts,
                                             self._next_key())
                w = max(e_ab, e_ba)   # ref :293-298
                if w > self.opts.max_edge_error:
                    continue
                self.sim3[(a, b)] = s_ab
                self.sim3[(b, a)] = s_ba
                self.edge_err[(a, b)] = w
                # separators: shared registered image names
                names_a = {self.recs[a].images[i].name
                           for i in self.recs[a].reg_image_ids}
                names_b = {self.recs[b].images[i].name
                           for i in self.recs[b].reg_image_ids}
                self.separators |= names_a & names_b

    def _largest_cc(self):
        n = len(self.recs)
        uf = UnionFind(n)
        for (a, b) in self.edge_err:
            uf.union(a, b)
        groups: dict[int, list] = {}
        for v in range(n):
            groups.setdefault(uf.find(v), []).append(v)
        return max(groups.values(), key=len) if groups else []

    def _mst(self, keep: set):
        uf = UnionFind(len(self.recs))
        out = []
        for (a, b), w in sorted(self.edge_err.items(), key=lambda kv: kv[1]):
            if a not in keep or b not in keep:
                continue
            if uf.find(a) != uf.find(b):
                uf.union(a, b)
                out.append((a, b))
        return out

    @staticmethod
    def _find_anchor(mst_edges, keep):
        """Iterative leaf peeling (ref :329-385)."""
        adj: dict[int, set] = {v: set() for v in keep}
        for (a, b) in mst_edges:
            adj[a].add(b)
            adj[b].add(a)
        alive = set(keep)
        while len(alive) > 1:
            leaves = [v for v in alive if len(adj[v] & alive) <= 1]
            if len(leaves) == len(alive):
                # last two nodes: pick the higher-degree one in the full MST
                return max(alive, key=lambda v: len(adj[v]))
            for v in leaves:
                alive.discard(v)
        return next(iter(alive))

    # -------------------------------------------------------------- align
    def align(self) -> Reconstruction:
        """Run the full merge. Returns the merged anchor reconstruction."""
        if len(self.recs) == 1:
            self.anchor = 0
            return self.recs[0]
        self.construct_graph()
        keep = self._largest_cc()
        if not keep:
            self.anchor = 0
            return self.recs[0]
        mst = self._mst(set(keep))
        self.anchor = self._find_anchor(mst, set(keep))

        # BFS from anchor composing Sim3 child->anchor (ref ComputePath :387)
        adj: dict[int, list] = {v: [] for v in keep}
        for (a, b) in mst:
            adj[a].append(b)
            adj[b].append(a)
        self.paths = {self.anchor: Sim3.identity()}
        stack = [self.anchor]
        while stack:
            v = stack.pop()
            for u in adj[v]:
                if u in self.paths:
                    continue
                # sim3[(u, v)] maps u-coords into v-coords
                self.paths[u] = self.paths[v].compose(self.sim3[(u, v)])
                stack.append(u)

        merged = self.recs[self.anchor]
        for v in keep:
            if v == self.anchor:
                continue
            sim = self.paths[v]
            merged.merge(self.recs[v], sim.scale, sim.R, sim.t)
        return merged

    def separator_image_ids(self, merged: Reconstruction) -> list:
        return [i for i, im in merged.images.items()
                if im.name in self.separators and im.registered]
