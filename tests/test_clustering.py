"""Clustering tests: synthetic random graphs with planted structure.

Mirrors reference clustering/image_clustering_test.cpp fixtures (random
weighted graphs, size-bound and completeness assertions).
"""
import numpy as np
import pytest

from dagsfm_tpu.clustering.community import community_detection, modularity
from dagsfm_tpu.clustering.image_clustering import (ClusteringOptions,
                                                    ImageClustering)
from dagsfm_tpu.clustering.spectral import spectral_cluster


def planted_partition(num_blocks=4, block_size=25, p_in=0.5, p_out=0.02,
                      seed=0):
    """Random graph with planted communities."""
    rng = np.random.default_rng(seed)
    n = num_blocks * block_size
    gt = np.repeat(np.arange(num_blocks), block_size)
    edges, weights = [], []
    for i in range(n):
        for j in range(i + 1, n):
            p = p_in if gt[i] == gt[j] else p_out
            if rng.random() < p:
                edges.append((i, j))
                weights.append(rng.integers(20, 100))
    return np.array(edges, np.int32), np.array(weights, float), gt, n


def agreement(labels, gt):
    """Fraction of pairs classified consistently with ground truth."""
    labels = np.asarray(labels)
    same_l = labels[:, None] == labels[None, :]
    same_g = gt[:, None] == gt[None, :]
    return (same_l == same_g).mean()


class TestSpectral:
    def test_planted_partition(self):
        edges, w, gt, n = planted_partition()
        labels = spectral_cluster(edges, w, n, 4)
        assert agreement(labels, gt) > 0.95

    def test_two_cliques(self):
        # two 10-cliques joined by one weak edge
        edges, weights = [], []
        for base in (0, 10):
            for i in range(10):
                for j in range(i + 1, 10):
                    edges.append((base + i, base + j))
                    weights.append(100.0)
        edges.append((0, 10))
        weights.append(1.0)
        labels = spectral_cluster(np.array(edges, np.int32),
                                  np.array(weights), 20, 2)
        assert len(set(labels[:10])) == 1
        assert len(set(labels[10:])) == 1
        assert labels[0] != labels[10]


class TestCommunity:
    def test_planted_partition(self):
        edges, w, gt, n = planted_partition(seed=1)
        labels = community_detection(edges, w, n)
        assert agreement(labels, gt) > 0.9
        q = modularity(edges, w, labels)
        assert q > 0.5

    def test_single_community(self):
        edges = np.array([(0, 1), (1, 2), (0, 2)], np.int32)
        w = np.ones(3)
        labels = community_detection(edges, w, 3)
        assert len(set(labels.tolist())) == 1


class TestImageClustering:
    def _graph(self, seed=0, n=250):
        edges, w, gt, n = planted_partition(num_blocks=5, block_size=n // 5,
                                            seed=seed)
        e = {(int(i), int(j)): float(wt) for (i, j), wt in zip(edges, w)}
        return list(range(n)), e

    def test_cut_size_bounds(self):
        nodes, edges = self._graph()
        opts = ClusteringOptions(num_images_ub=60, cluster_type="SPECTRAL")
        ic = ImageClustering(nodes, edges, opts)
        clusters = ic.cut()
        assert len(clusters) == int(np.ceil(len(nodes) / 60))
        total = sum(len(c.image_ids) for c in clusters)
        assert total == len(nodes)  # partition before expansion
        assert ic.summary["num_lost_edges"] > 0

    def test_expand_adds_overlap(self):
        nodes, edges = self._graph(seed=2)
        opts = ClusteringOptions(num_images_ub=60, image_overlap=20,
                                 completeness_ratio=0.5, relax_ratio=1.3)
        ic = ImageClustering(nodes, edges, opts)
        ic.cut()
        lost_before = len(ic.lost_edges)
        clusters = ic.expand()
        total = sum(len(c.image_ids) for c in clusters)
        assert total > len(nodes)  # overlap added
        for c in clusters:
            assert len(c.image_ids) <= int(60 * 1.3)
        assert ic.summary["num_recovered_edges"] > 0

    def test_expand_all_edges_covers_everything(self):
        nodes, edges = self._graph(seed=3)
        ic = ImageClustering(nodes, edges,
                             ClusteringOptions(num_images_ub=60))
        ic.cut()
        clusters = ic.expand_all_edges()
        covered = set()
        for c in clusters:
            covered.update(c.edges.keys())
        assert covered == set(edges.keys())

    def test_hybrid_recuts_large_communities(self):
        nodes, edges = self._graph(seed=4, n=300)
        opts = ClusteringOptions(num_images_ub=40, cluster_type="HYBRID")
        ic = ImageClustering(nodes, edges, opts)
        clusters = ic.cut()
        sizes = [len(c.image_ids) for c in clusters]
        # hybrid should not produce clusters wildly above the bound
        assert max(sizes) <= 40 * 2

    def test_adaptive_type_switch(self):
        nodes, edges = self._graph(seed=5)
        ic = ImageClustering(nodes, edges, ClusteringOptions())
        t = ic.adaptive_cluster_type()
        assert t in ("SPECTRAL", "HYBRID")
