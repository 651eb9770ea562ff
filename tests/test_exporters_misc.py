"""Tests: NVM/Bundler exporters, PMVS/CMP-MVS workspaces, nonlinear
rotation estimator + align_rotations, transitive/file pair generators,
GPS transforms, hierarchical SceneClustering."""
import numpy as np
import jax.numpy as jnp
import pytest

from dagsfm_tpu.scene import synthetic, exporters
from dagsfm_tpu.ops import rotations as rops


@pytest.fixture(scope="module")
def small_rec():
    spec = synthetic.SyntheticSceneSpec(num_cameras=6, num_points=40,
                                        pixel_noise=0.0, seed=3)
    return synthetic.to_reconstruction(synthetic.generate(spec))


# --------------------------------------------------------------- exporters

def test_nvm_roundtrip(small_rec, tmp_path):
    p = str(tmp_path / "model.nvm")
    exporters.write_nvm(small_rec, p)
    back = exporters.read_nvm(p)
    assert back.num_reg_images() == small_rec.num_reg_images()
    assert back.num_points3D() == small_rec.num_points3D()
    # camera centers preserved
    for iid in small_rec.reg_image_ids:
        im_a = small_rec.images[iid]
        # match by name
        im_b = next(im for im in back.images.values()
                    if im.name == im_a.name)
        Ra = np.asarray(rops.quat_to_rotmat_np(im_a.qvec))
        Rb = np.asarray(rops.quat_to_rotmat_np(im_b.qvec))
        ca = -Ra.T @ im_a.tvec
        cb = -Rb.T @ im_b.tvec
        np.testing.assert_allclose(ca, cb, atol=1e-6)
    # point positions preserved (sorted ids align: same insertion order)
    xyz_a = np.array([p.xyz for _, p in sorted(small_rec.points3D.items())])
    xyz_b = np.array([p.xyz for _, p in sorted(back.points3D.items())])
    np.testing.assert_allclose(xyz_a, xyz_b, atol=1e-6)


def test_bundler_export(small_rec, tmp_path):
    p = str(tmp_path / "bundle.out")
    lst = str(tmp_path / "list.txt")
    exporters.write_bundler(small_rec, p, lst)
    lines = open(p).read().splitlines()
    assert lines[0].startswith("# Bundle file")
    n_cams, n_pts = (int(t) for t in lines[1].split())
    assert n_cams == small_rec.num_reg_images()
    assert n_pts == small_rec.num_points3D()
    assert len(open(lst).read().splitlines()) == n_cams
    # each camera block: 1 intrinsics + 3 R + 1 t = 5 lines
    assert len(lines) == 2 + 5 * n_cams + 3 * n_pts


def test_pmvs_cmpmvs_workspace(small_rec, tmp_path):
    exporters.write_pmvs_workspace(small_rec, str(tmp_path / "pmvs"))
    n = small_rec.num_reg_images()
    assert (tmp_path / "pmvs" / "txt" / "00000000.txt").exists()
    assert (tmp_path / "pmvs" / "vis.dat").exists()
    assert (tmp_path / "pmvs" / "option-all").exists()
    ptxt = (tmp_path / "pmvs" / "txt" / "00000000.txt").read_text()
    assert ptxt.startswith("CONTOUR")
    exporters.write_cmpmvs_workspace(small_rec, str(tmp_path / "cmp"))
    assert (tmp_path / "cmp" / "00001_P.txt").exists()


# ------------------------------------------- nonlinear RA + align_rotations

def _random_rotations(rng, n, scale=1.0):
    out = []
    for _ in range(n):
        aa = rng.normal(0, scale, 3)
        out.append(np.asarray(rops.angleaxis_to_rotmat(jnp.asarray(aa))))
    return np.stack(out)


def test_nonlinear_rotation_estimator():
    from dagsfm_tpu.estimation import rotation_averaging as ra
    rng = np.random.default_rng(0)
    n = 12
    R_gt = _random_rotations(rng, n, 0.5)
    edges, rel = [], []
    for i in range(n):
        for j in range(i + 1, min(i + 4, n)):
            noise = np.asarray(rops.angleaxis_to_rotmat(
                jnp.asarray(rng.normal(0, 0.01, 3))))
            edges.append((i, j))
            rel.append(noise @ R_gt[j] @ R_gt[i].T)
    R_est = ra.estimate_rotations_nonlinear(
        n, np.asarray(edges, np.int32), np.stack(rel))
    aligned = ra.align_rotations(R_est, R_gt)
    errs = [np.degrees(np.arccos(np.clip(
        (np.trace(aligned[k].T @ R_gt[k]) - 1) / 2, -1, 1)))
        for k in range(n)]
    assert np.mean(errs) < 1.5


def test_align_rotations_exact_gauge():
    from dagsfm_tpu.estimation import rotation_averaging as ra
    rng = np.random.default_rng(1)
    R_ref = _random_rotations(rng, 8)
    S = _random_rotations(rng, 1)[0]
    R_est = np.einsum("kij,jl->kil", R_ref, S.T)  # gauge-shifted
    aligned = ra.align_rotations(R_est, R_ref)
    np.testing.assert_allclose(aligned, R_ref, atol=1e-8)


# --------------------------------------------------------- pair generators

def test_transitive_pairs():
    from dagsfm_tpu.features import retrieval as rt
    matched = [(0, 1, 0.0), (1, 2, 0.0), (2, 3, 0.0)]
    new = rt.transitive_pairs(matched, num_iterations=1)
    keys = {(i, j) for i, j, _ in new}
    assert (0, 2) in keys and (1, 3) in keys
    assert (0, 1) not in keys
    # second iteration closes (0, 3)
    new2 = rt.transitive_pairs(matched, num_iterations=2)
    assert (0, 3) in {(i, j) for i, j, _ in new2}


def test_pairs_from_file(tmp_path):
    from dagsfm_tpu.features import retrieval as rt
    f = tmp_path / "pairs.txt"
    f.write_text("a.jpg b.jpg\n# comment\nb.jpg c.jpg\nmissing.jpg a.jpg\n")
    out = rt.pairs_from_file(str(f), {"a.jpg": 0, "b.jpg": 1, "c.jpg": 2})
    assert out == [(0, 1, 0.0), (1, 2, 0.0)]


# ------------------------------------------------------------------- GPS

def test_gps_roundtrip_and_enu():
    from dagsfm_tpu.utils import gps
    lla = np.array([[52.52, 13.405, 35.0],        # Berlin
                    [52.5205, 13.4055, 40.0],
                    [48.8566, 2.3522, 60.0]])     # Paris
    xyz = gps.ell_to_xyz(lla)
    back = gps.xyz_to_ell(xyz)
    np.testing.assert_allclose(back, lla, atol=1e-6)
    enu = gps.ell_to_enu(lla[:2])
    np.testing.assert_allclose(enu[0, :2], [0, 0], atol=1e-9)
    # ~55m north, ~34m east, ~5m up
    assert 20 < enu[1, 0] < 50          # east
    assert 40 < enu[1, 1] < 70          # north
    assert 4 < enu[1, 2] < 6


# ------------------------------------------------------- scene clustering

def test_scene_clustering_tree():
    from dagsfm_tpu.clustering.scene_clustering import (
        SceneClustering, SceneClusteringOptions)
    rng = np.random.default_rng(2)
    # two dense blobs weakly connected
    pairs, weights = [], []
    for blob, off in ((0, 0), (1, 20)):
        for i in range(20):
            for j in range(i + 1, 20):
                if rng.random() < 0.4:
                    pairs.append((off + i, off + j))
                    weights.append(10.0)
    pairs.append((5, 25)); weights.append(1.0)
    sc = SceneClustering(SceneClusteringOptions(leaf_max_num_images=25,
                                                image_overlap=3))
    sc.partition(pairs, weights)
    leaves = sc.leaf_clusters()
    assert len(leaves) >= 2
    sizes = [len(l.image_ids) for l in leaves]
    assert all(s <= 25 + 3 for s in sizes)
    covered = set().union(*(set(l.image_ids) for l in leaves))
    assert covered == {i for p in pairs for i in p}
    # overlap: some image appears in >1 leaf
    assert sum(sizes) > len(covered)
