"""MVS tests: synthetic textured plane rendered from known cameras ->
plane-sweep/PatchMatch depth accuracy, consistency fusion, depth-map .bin
round-trip, Delaunay meshing. (Ref mvs/depth_map_test.cc, fusion — the
reference has no closed-loop depth accuracy test; we add one per SURVEY §4.)
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dagsfm_tpu.mvs import patch_match as pm, fusion, meshing
from dagsfm_tpu.mvs import io as mvs_io


H, W = 48, 64
FOCAL = 60.0
K = np.array([[FOCAL, 0, W / 2.0], [0, FOCAL, H / 2.0], [0, 0, 1.0]])
PLANE_Z = 5.0  # fronto-parallel plane in world frame (= cam0 frame)


def _texture(u, v):
    return (np.sin(3.0 * u) * np.cos(2.0 * v)
            + 0.5 * np.sin(7.1 * u + 1.3) * np.sin(5.3 * v + 0.7)
            + 0.25 * np.sin(13.7 * u * v / 5.0))


def _render(R, t):
    """Render the textured plane z=PLANE_Z (world) from camera (R, t)."""
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    pix = np.stack([xs, ys, np.ones_like(xs)]).reshape(3, -1).astype(float)
    rays_c = np.linalg.inv(K) @ pix
    rays_w = R.T @ rays_c                      # directions in world
    origin = -R.T @ t
    lam = (PLANE_Z - origin[2]) / rays_w[2]
    P = origin[:, None] + rays_w * lam         # world intersections
    img = _texture(P[0], P[1]).reshape(H, W)
    depth = (R @ P + t[:, None])[2].reshape(H, W)  # cam-frame z
    return img.astype(np.float32), depth.astype(np.float32)


def _cameras():
    """Ref cam at origin + 2 laterally shifted sources (world-to-cam)."""
    Rs = [np.eye(3)] * 3
    ts = [np.zeros(3), np.array([-0.4, 0.0, 0.0]),
          np.array([0.0, -0.3, 0.0])]
    return Rs, ts


@pytest.fixture(scope="module")
def rendered():
    Rs, ts = _cameras()
    imgs, depths = zip(*[_render(R, t) for R, t in zip(Rs, ts)])
    return Rs, ts, list(imgs), list(depths)


def _rel(r, s, Rs, ts):
    R_rel = Rs[s] @ Rs[r].T
    t_rel = ts[s] - R_rel @ ts[r]
    return R_rel, t_rel


def test_plane_sweep_recovers_depth(rendered):
    Rs, ts, imgs, depths = rendered
    R_rel = np.stack([_rel(0, s, Rs, ts)[0] for s in (1, 2)])
    t_rel = np.stack([_rel(0, s, Rs, ts)[1] for s in (1, 2)])
    opts = pm.PatchMatchOptions(num_depths=48, window_radius=2)
    depth, cost = pm.plane_sweep(
        jnp.asarray(imgs[0]), jnp.asarray(np.stack([imgs[1], imgs[2]])),
        jnp.asarray(K), jnp.asarray(np.stack([K, K])),
        jnp.asarray(R_rel), jnp.asarray(t_rel), 3.0, 8.0, opts)
    d = np.asarray(depth)
    interior = np.zeros((H, W), bool)
    interior[6:-6, 6:-6] = True
    err = np.abs(d - depths[0]) / depths[0]
    assert np.median(err[interior]) < 0.02


def test_patchmatch_refine_improves(rendered):
    Rs, ts, imgs, depths = rendered
    R_rel = np.stack([_rel(0, s, Rs, ts)[0] for s in (1, 2)])
    t_rel = np.stack([_rel(0, s, Rs, ts)[1] for s in (1, 2)])
    opts = pm.PatchMatchOptions(num_depths=16, window_radius=2,
                                num_iterations=4)
    args = (jnp.asarray(imgs[0]),
            jnp.asarray(np.stack([imgs[1], imgs[2]])),
            jnp.asarray(K), jnp.asarray(np.stack([K, K])),
            jnp.asarray(R_rel), jnp.asarray(t_rel))
    depth0, _ = pm.plane_sweep(*args, 3.0, 8.0, opts)
    depth1, _ = pm.refine(jax.random.PRNGKey(0), *args, depth0, 3.0, 8.0,
                          opts)
    interior = np.zeros((H, W), bool)
    interior[6:-6, 6:-6] = True
    e0 = np.abs(np.asarray(depth0) - depths[0])[interior]
    e1 = np.abs(np.asarray(depth1) - depths[0])[interior]
    assert np.median(e1) <= np.median(e0) * 1.01
    assert np.median(e1 / depths[0][interior]) < 0.02


def test_normals_fronto_parallel(rendered):
    Rs, ts, imgs, depths = rendered
    n = np.asarray(pm.normals_from_depth(jnp.asarray(depths[0]),
                                         jnp.asarray(K)))
    # plane normal in cam frame is -z (toward camera)
    interior = n[8:-8, 8:-8]
    assert np.abs(interior[..., 2] + 1.0).mean() < 0.05


def test_fusion_consistency(rendered):
    Rs, ts, imgs, depths = rendered
    # ground-truth depths are mutually consistent
    out = fusion.fuse(depths, [None] * 3, imgs,
                      [K] * 3, Rs, ts,
                      fusion.FusionOptions(min_num_consistent=2))
    assert len(out["xyz"]) > 0.5 * H * W
    assert np.abs(out["xyz"][:, 2] - PLANE_Z).max() < 0.05

    # corrupting one view's depth kills its contribution
    bad = [depths[0], depths[1] * 1.5, depths[2]]
    out2 = fusion.fuse(bad, [None] * 3, imgs, [K] * 3, Rs, ts,
                       fusion.FusionOptions(min_num_consistent=2))
    assert len(out2["xyz"]) < len(out["xyz"])


def test_depth_map_bin_roundtrip(tmp_path, rendered):
    _, _, _, depths = rendered
    p = str(tmp_path / "d.bin")
    mvs_io.write_map_bin(p, depths[0])
    back = mvs_io.read_map_bin(p)
    np.testing.assert_allclose(back, depths[0], rtol=1e-6)
    # 3-channel (normal map shaped)
    nm = np.random.default_rng(0).normal(size=(H, W, 3)).astype(np.float32)
    p2 = str(tmp_path / "n.bin")
    mvs_io.write_map_bin(p2, nm)
    np.testing.assert_allclose(mvs_io.read_map_bin(p2), nm, rtol=1e-6)


def test_ply_outputs(tmp_path):
    rng = np.random.default_rng(1)
    xyz = rng.normal(size=(50, 3))
    mvs_io.write_ply_points(str(tmp_path / "pts.ply"), xyz,
                            color=rng.uniform(0, 1, 50))
    assert (tmp_path / "pts.ply").stat().st_size > 50 * 15


def test_delaunay_mesh_grid():
    g = np.linspace(0, 1, 8)
    xx, yy = np.meshgrid(g, g)
    rng = np.random.default_rng(2)
    xyz = np.column_stack([xx.ravel(), yy.ravel(),
                           0.02 * rng.standard_normal(64)])
    verts, tris = meshing.delaunay_mesh(xyz)
    assert len(tris) > 20
    assert tris.max() < len(verts)


def test_mesh_ply(tmp_path):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0.0]])
    tris = np.array([[0, 1, 2], [1, 3, 2]])
    meshing.write_ply_mesh(str(tmp_path / "m.ply"), verts, tris)
    data = (tmp_path / "m.ply").read_bytes()
    assert b"element face 2" in data


def test_dense_controller_end_to_end(tmp_path, rendered):
    """Sparse model + images -> controller -> fused cloud on the plane
    (ref PatchMatchController + StereoFusion driven via workspace)."""
    from dagsfm_tpu.mvs import controller as ctl
    from dagsfm_tpu.scene import cameras as cm
    from dagsfm_tpu.scene.reconstruction import Reconstruction, ImageRecord
    from dagsfm_tpu.ops import rotations as rops

    Rs, ts, imgs, depths = rendered
    rec = Reconstruction()
    rec.add_camera(cm.make_simple_camera(0, W, H, focal=FOCAL,
                                         model="SIMPLE_PINHOLE"))
    rng = np.random.default_rng(0)
    # sparse points on the plane observed by all views
    Pw = np.column_stack([rng.uniform(-2, 2, 30), rng.uniform(-1.5, 1.5, 30),
                          np.full(30, PLANE_Z)])
    obs = {}
    for iid, (R, t) in enumerate(zip(Rs, ts)):
        Pc = Pw @ R.T + t
        xy = (Pc[:, :2] / Pc[:, 2:]) * FOCAL + np.array([W / 2, H / 2])
        q = np.asarray(rops.rotmat_to_quat(jnp.asarray(R, jnp.float64)))
        rec.add_image(ImageRecord(
            image_id=iid, name=f"im{iid}.png", camera_id=0, qvec=q,
            tvec=np.asarray(t, float), xys=xy,
            point3D_ids=np.full(30, -1, np.int64)))
        rec.register_image(iid)
        obs[iid] = xy
    for k in range(30):
        rec.add_point3D(Pw[k], [(i, k) for i in range(3)])

    srcs = ctl.select_source_images(rec, 0, 4)
    assert set(srcs) == {1, 2}
    dmin, dmax = ctl.depth_range(rec, 0, 0.25)
    assert dmin < PLANE_Z < dmax

    opts = ctl.DenseOptions(
        patch_match=pm.PatchMatchOptions(num_depths=24, num_iterations=2))
    fused = ctl.dense_reconstruct(
        rec, {i: imgs[i] for i in range(3)}, workspace=str(tmp_path),
        opts=opts)
    assert len(fused["xyz"]) > 500
    med_z = np.median(fused["xyz"][:, 2])
    assert abs(med_z - PLANE_Z) < 0.1
    assert (tmp_path / "stereo" / "depth_maps" / "im0.png.geometric.bin"
            ).exists()
    assert (tmp_path / "fused.ply").exists()


def test_poisson_mesh_sphere():
    """Spectral Poisson reconstruction of a noisy oriented sphere cloud:
    vertices on the unit sphere, surface area ~= 4*pi (ref PoissonRecon
    role, mvs/meshing.h:106)."""
    from dagsfm_tpu.mvs.poisson import PoissonOptions, poisson_mesh

    rng = np.random.default_rng(0)
    n = 8000
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    xyz = v + rng.normal(0, 0.005, (n, 3))
    verts, tris = poisson_mesh(xyz, v, PoissonOptions(grid=64))
    assert len(verts) > 1000 and len(tris) > 2000
    r = np.linalg.norm(verts - xyz.mean(0), axis=1)
    assert abs(r.mean() - 1.0) < 0.02, r.mean()
    assert r.std() < 0.02, r.std()
    a, b, c = verts[tris[:, 0]], verts[tris[:, 1]], verts[tris[:, 2]]
    area = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1).sum()
    assert abs(area - 4 * np.pi) < 0.8, area


def test_poisson_mesher_cli(tmp_path):
    """poisson_mesher CLI: fused.ply (with normals) -> mesh PLY (ref
    colmap.cc RunPoissonMesher CLI surface)."""
    from dagsfm_tpu.mvs import io as mvs_io
    from dagsfm_tpu.pipeline import cli

    rng = np.random.default_rng(1)
    n = 4000
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    ply_in = str(tmp_path / "fused.ply")
    mvs_io.write_ply_points(ply_in, v, normal=v)
    xyz2, n2 = mvs_io.read_ply_points(ply_in)
    np.testing.assert_allclose(xyz2, v, atol=1e-6)
    np.testing.assert_allclose(n2, v, atol=1e-6)
    out = str(tmp_path / "mesh.ply")
    cli.main(["poisson_mesher", "--input_path", ply_in,
              "--output_path", out, "--grid", "48"])
    assert (tmp_path / "mesh.ply").stat().st_size > 10000
