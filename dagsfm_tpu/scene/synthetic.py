"""Deterministic synthetic scene generator — the test backbone.

The reference has no end-to-end golden-scene tests (SURVEY.md §4); its unit
tests build ad-hoc synthetic geometry per test file (e.g.
/root/reference/src/rotation_estimation/robust_rotation_estimator_test.cpp:58).
Here we centralize that: known cameras/poses/points -> projected tracks with
controllable noise/outliers, usable by every layer's tests and by bench.py.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from dagsfm_tpu.ops import rotations as rops
from dagsfm_tpu.scene import cameras as cm
from dagsfm_tpu.scene.reconstruction import ImageRecord, Reconstruction


@dataclasses.dataclass
class SyntheticSceneSpec:
    num_cameras: int = 20
    num_points: int = 500
    image_width: int = 1024
    image_height: int = 768
    focal: float = 1000.0
    # cameras on a ring of this radius looking at the origin cloud
    ring_radius: float = 10.0
    ring_height_jitter: float = 1.0
    point_cloud_extent: float = 4.0
    pixel_noise: float = 0.0
    outlier_fraction: float = 0.0
    min_track_length: int = 2
    # 0 = unlimited; otherwise each point is seen by a random subset of at
    # most this many cameras (keeps large ring scenes realistically
    # sparse — real scenes don't have every camera seeing every point)
    max_track_length: int = 0
    seed: int = 0
    camera_model: str = "SIMPLE_PINHOLE"


@dataclasses.dataclass
class SyntheticScene:
    """Ground truth + observations for a generated scene."""
    spec: SyntheticSceneSpec
    # ground truth
    R: np.ndarray          # (I, 3, 3) world->cam
    t: np.ndarray          # (I, 3)
    points: np.ndarray     # (P, 3)
    camera: cm.Camera
    # observations
    visible: np.ndarray    # (I, P) bool
    pixels: np.ndarray     # (I, P, 2) projected pixels (valid where visible)
    is_outlier: np.ndarray  # (I, P) bool, subset of visible

    def look_dirs(self) -> np.ndarray:
        return self.R[:, 2, :]  # cam z-axis in world frame

    def centers(self) -> np.ndarray:
        return np.einsum("nij,nj->ni", self.R.transpose(0, 2, 1), -self.t)


def _look_at(center: np.ndarray, target: np.ndarray, up=(0.0, 0.0, 1.0)):
    """World->cam rotation for a camera at `center` looking at `target`."""
    z = target - center
    z = z / np.linalg.norm(z)
    up = np.asarray(up, np.float64)
    x = np.cross(z, up)
    nx = np.linalg.norm(x)
    if nx < 1e-9:
        x = np.array([1.0, 0.0, 0.0])
    else:
        x = x / nx
    y = np.cross(z, x)
    R = np.stack([x, y, z], axis=0)  # rows = cam axes in world coords
    t = -R @ center
    return R, t


def generate(spec: SyntheticSceneSpec) -> SyntheticScene:
    rng = np.random.default_rng(spec.seed)
    P = spec.num_points
    I = spec.num_cameras

    points = rng.uniform(-spec.point_cloud_extent, spec.point_cloud_extent,
                         size=(P, 3))

    Rs, ts = [], []
    for i in range(I):
        ang = 2.0 * np.pi * i / I
        center = np.array([
            spec.ring_radius * np.cos(ang),
            spec.ring_radius * np.sin(ang),
            rng.uniform(-spec.ring_height_jitter, spec.ring_height_jitter),
        ])
        target = rng.uniform(-0.5, 0.5, size=3)
        R, t = _look_at(center, target)
        Rs.append(R)
        ts.append(t)
    R = np.stack(Rs)
    t = np.stack(ts)

    camera = cm.make_simple_camera(1, spec.image_width, spec.image_height,
                                   focal=spec.focal, model=spec.camera_model)

    # project all points into all cameras (numpy; exact pinhole)
    Xc = np.einsum("nij,pj->npi", R, points) + t[:, None, :]   # (I, P, 3)
    z = Xc[..., 2]
    in_front = z > 0.2
    z_safe = np.where(np.abs(z) < 1e-9, 1e-9, z)
    uv = Xc[..., :2] / z_safe[..., None]
    fx, _, cx, cy = camera.params[0], camera.params[0], camera.params[1], camera.params[2]
    pix = uv * fx + np.array([cx, cy])
    in_image = ((pix[..., 0] >= 0) & (pix[..., 0] < spec.image_width)
                & (pix[..., 1] >= 0) & (pix[..., 1] < spec.image_height))
    visible = in_front & in_image

    if spec.max_track_length > 0:
        # keep a random subset of <= max_track_length views per point
        score = rng.random(visible.shape)
        score[~visible] = np.inf
        order = np.argsort(score, axis=0)
        rank = np.empty_like(order)
        np.put_along_axis(
            rank, order,
            np.broadcast_to(np.arange(I)[:, None], visible.shape), axis=0)
        visible = visible & (rank < spec.max_track_length)

    if spec.pixel_noise > 0:
        pix = pix + rng.normal(0.0, spec.pixel_noise, size=pix.shape)

    is_outlier = np.zeros_like(visible)
    if spec.outlier_fraction > 0:
        flip = rng.random(visible.shape) < spec.outlier_fraction
        is_outlier = visible & flip
        rand_pix = np.stack([
            rng.uniform(0, spec.image_width, visible.shape),
            rng.uniform(0, spec.image_height, visible.shape),
        ], axis=-1)
        pix = np.where(is_outlier[..., None], rand_pix, pix)

    # enforce min track length
    track_len = visible.sum(axis=0)
    ok = track_len >= spec.min_track_length
    visible = visible & ok[None, :]
    is_outlier = is_outlier & ok[None, :]

    return SyntheticScene(spec=spec, R=R, t=t, points=points, camera=camera,
                          visible=visible, pixels=pix, is_outlier=is_outlier)


def to_reconstruction(scene: SyntheticScene,
                      with_points: bool = True) -> Reconstruction:
    """Build a ground-truth Reconstruction (all images registered)."""
    rec = Reconstruction()
    rec.add_camera(scene.camera)
    I, P = scene.visible.shape
    import jax.numpy as jnp

    # per-image keypoint arrays: the visible points, in point order
    kp_index = np.full((I, P), -1, np.int64)
    for i in range(I):
        vis = np.nonzero(scene.visible[i])[0]
        xys = scene.pixels[i, vis]
        kp_index[i, vis] = np.arange(len(vis))
        q = np.asarray(rops.rotmat_to_quat(jnp.asarray(scene.R[i])))
        rec.add_image(ImageRecord(
            image_id=i + 1, name=f"image{i + 1:05d}.jpg", camera_id=1,
            qvec=q, tvec=scene.t[i].copy(), xys=xys,
            point3D_ids=np.full(len(vis), -1, np.int64), registered=True))

    if with_points:
        # vectorized track assembly (the I-inner loop is a wall at
        # 1000-camera scenes)
        ii, pp = np.nonzero(scene.visible)
        kps = kp_index[ii, pp]
        order = np.argsort(pp, kind="stable")
        ii_s, pp_s, kp_s = ii[order], pp[order], kps[order]
        starts = np.searchsorted(pp_s, np.arange(P + 1))
        for p in range(P):
            a, b = starts[p], starts[p + 1]
            if b - a >= 2:
                track = list(zip((ii_s[a:b] + 1).tolist(),
                                 kp_s[a:b].tolist()))
                rec.add_point3D(scene.points[p], track)
    return rec


def render_images(scene: SyntheticScene, sphere_radius: float | None = None,
                  num_waves: int = 96, feature_px: float = 6.0,
                  background: float = 0.15, seed: int = 0,
                  camera=None) -> dict:
    """Ray-traced grayscale images of a procedurally-textured sphere
    placed at the scene origin, viewed by the scene's cameras.

    Closes the pixels->model loop the reference never tests (SURVEY §4):
    the texture is a band-limited sum of random 3D cosine waves sampled
    at the ray-sphere intersection, so every pixel is exactly
    multi-view-consistent and SIFT sees smooth real-image-like texture.
    Returns {image_id (1-based): (H, W) float32}. Ground truth for
    accuracy checks is the CAMERA poses (pose_errors), not scene.points.
    """
    rng = np.random.default_rng(seed)
    I = scene.R.shape[0]
    H = scene.spec.image_height
    W = scene.spec.image_width
    fx = scene.camera.params[0]
    cx, cy = scene.camera.params[1], scene.camera.params[2]
    if sphere_radius is None:
        sphere_radius = scene.spec.point_cloud_extent

    # band-limited 3D texture: wavelengths spanning ~feature_px pixels
    # at the near-surface depth
    depth_near = max(scene.spec.ring_radius - sphere_radius, 1.0)
    lam_mid = feature_px * depth_near / fx       # world wavelength
    kmag = 2 * np.pi / np.exp(rng.uniform(
        np.log(lam_mid * 0.5), np.log(lam_mid * 4.0), num_waves))
    kdir = rng.normal(size=(num_waves, 3))
    kdir /= np.linalg.norm(kdir, axis=1, keepdims=True)
    kvec = kdir * kmag[:, None]                  # (M, 3)
    phase = rng.uniform(0, 2 * np.pi, num_waves)
    amp = rng.uniform(0.5, 1.0, num_waves) / np.sqrt(num_waves)

    if camera is not None:
        # render through an arbitrary camera model (e.g. SIMPLE_RADIAL
        # with k1 != 0): each pixel's ray direction is its UNDISTORTED
        # normalized coordinate via the model's iterative inverse — the
        # resulting image IS the distorted view of the scene (used by
        # the distorted-camera end-to-end test)
        import jax.numpy as jnp

        from dagsfm_tpu.scene import cameras as cmod
        uu, vv = np.meshgrid(np.arange(W, dtype=np.float64),
                             np.arange(H, dtype=np.float64))
        pix = np.stack([uu.ravel(), vv.ravel()], axis=-1)
        params = np.zeros(cmod.MAX_CAMERA_PARAMS)
        params[: len(camera.params)] = camera.params
        xy = np.asarray(cmod.cam_from_img(
            camera.model_id, jnp.asarray(params), jnp.asarray(pix)))
        dirs_cam = np.concatenate(
            [xy, np.ones((len(xy), 1))], axis=-1).reshape(H, W, 3)
    else:
        xs = (np.arange(W) - cx) / fx
        ys = (np.arange(H) - cy) / fx
        dirs_cam = np.stack([np.broadcast_to(xs[None, :], (H, W)),
                             np.broadcast_to(ys[:, None], (H, W)),
                             np.ones((H, W))], -1)   # (H, W, 3)

    images = {}
    C_all = scene.centers()
    for i in range(I):
        d = dirs_cam @ scene.R[i]                # cam->world rotation
        C = C_all[i]
        # |C + t d|^2 = r^2
        dd = np.sum(d * d, axis=-1)
        b = 2.0 * (d @ C)
        c0 = C @ C - sphere_radius ** 2
        disc = b * b - 4 * dd * c0
        hit = disc > 0
        tt = (-b - np.sqrt(np.maximum(disc, 0.0))) / (2 * dd)
        hit &= tt > 0
        p = C[None, None] + tt[..., None] * d    # (H, W, 3)
        tex = np.cos(p @ kvec.T + phase) @ amp   # (H, W)
        tex = 0.5 + 0.5 * tex / np.max(np.abs(tex))
        # soft shading by surface normal (adds low-frequency structure)
        nrm = p / sphere_radius
        view = -d / np.sqrt(dd)[..., None]
        shade = 0.6 + 0.4 * np.clip(np.sum(nrm * view, -1), 0, 1)
        img = np.where(hit, tex * shade, background)
        images[i + 1] = img.astype(np.float32)
    return images


def to_scene_arrays(scene: SyntheticScene, dtype=np.float64):
    """Direct SyntheticScene -> SceneArrays conversion (no Reconstruction
    round-trip) — bench-scale scenes (1000 cams / 500k+ obs) build in
    milliseconds instead of the per-point Python track assembly."""
    from dagsfm_tpu.scene import cameras as cmod
    from dagsfm_tpu.scene.reconstruction import SceneArrays
    import jax.numpy as jnp

    I, P = scene.visible.shape
    track_len = scene.visible.sum(axis=0)
    pt_keep = track_len >= max(2, scene.spec.min_track_length)
    ii, pp = np.nonzero(scene.visible & pt_keep[None, :])
    qvec = np.asarray(rops.rotmat_to_quat(jnp.asarray(scene.R)))

    cam_params = np.zeros((1, cmod.MAX_CAMERA_PARAMS), dtype)
    p = np.asarray(scene.camera.params)
    cam_params[0, : len(p)] = p

    return SceneArrays(
        cam_model_id=np.array([scene.camera.model_id], np.int32),
        cam_params=cam_params,
        image_qvec=qvec.astype(dtype),
        image_tvec=scene.t.astype(dtype),
        image_camidx=np.zeros(I, np.int32),
        image_mask=np.ones(I, bool),
        points_xyz=scene.points.astype(dtype),
        points_mask=pt_keep,
        obs_image=ii.astype(np.int32),
        obs_point=pp.astype(np.int32),
        obs_xy=scene.pixels[ii, pp].astype(dtype),
        obs_mask=np.ones(len(ii), bool),
    )


def pose_errors(rec: Reconstruction, scene: SyntheticScene,
                align: bool = True) -> dict:
    """Rotation (deg) & center (ATE) errors of rec vs ground truth.

    If `align`, first fits a Sim(3) (Umeyama) from estimated camera centers
    to ground-truth centers — reconstructions are gauge-free.
    """
    import jax.numpy as jnp
    ids, est_C, gt_C, est_R = [], [], [], []
    for i, img in sorted(rec.images.items()):
        if not img.registered:
            continue
        k = i - 1
        Rcw = np.asarray(rops.quat_to_rotmat(jnp.asarray(img.qvec)))
        est_R.append(Rcw)
        est_C.append(-Rcw.T @ img.tvec)
        gt_C.append(scene.centers()[k])
        ids.append(k)
    est_C, gt_C = np.stack(est_C), np.stack(gt_C)
    est_R = np.stack(est_R)

    s, Rsim, tsim = 1.0, np.eye(3), np.zeros(3)
    if align and len(ids) >= 3:
        from dagsfm_tpu.ops.umeyama import umeyama_np
        s, Rsim, tsim = umeyama_np(est_C, gt_C)
    C_aligned = s * est_C @ Rsim.T + tsim
    ate = np.sqrt(np.mean(np.sum((C_aligned - gt_C) ** 2, axis=-1)))

    rot_errs = []
    for n, k in enumerate(ids):
        R_aligned = est_R[n] @ Rsim.T
        Rrel = R_aligned.T @ scene.R[k]
        cos = np.clip((np.trace(Rrel) - 1) / 2, -1, 1)
        rot_errs.append(np.degrees(np.arccos(cos)))
    return {
        "ate": float(ate),
        "rot_err_deg_mean": float(np.mean(rot_errs)),
        "rot_err_deg_max": float(np.max(rot_errs)),
        "num_reg": len(ids),
    }


def to_matching_problem(scene: SyntheticScene, match_outlier_fraction=0.0,
                        seed: int = 0):
    """Build (cameras, images, correspondence graph) as if features had been
    matched — the input contract of the incremental mapper.

    Keypoint k of image i = the k-th visible point (scene.pixels order);
    pairwise matches link keypoints observing the same 3D point, with
    optional wrong-match injection.
    """
    from dagsfm_tpu.sfm.correspondence_graph import CorrespondenceGraph

    rng = np.random.default_rng(seed)
    I, P = scene.visible.shape
    kp_index = np.full((I, P), -1, np.int64)
    images = {}
    cameras = {1: scene.camera}
    for i in range(I):
        vis = np.nonzero(scene.visible[i])[0]
        kp_index[i, vis] = np.arange(len(vis))
        images[i + 1] = ImageRecord(
            image_id=i + 1, name=f"image{i + 1:05d}.jpg", camera_id=1,
            qvec=np.array([1.0, 0, 0, 0]), tvec=np.zeros(3),
            xys=scene.pixels[i, vis].copy(),
            point3D_ids=np.full(len(vis), -1, np.int64))

    graph = CorrespondenceGraph()
    for i in range(I):
        graph.add_image(i + 1, int(scene.visible[i].sum()))
    for i in range(I):
        for j in range(i + 1, I):
            common = np.nonzero(scene.visible[i] & scene.visible[j])[0]
            if len(common) < 8:
                continue
            m = np.stack([kp_index[i, common], kp_index[j, common]],
                         axis=1).astype(np.uint32)
            if match_outlier_fraction > 0:
                bad = rng.random(len(m)) < match_outlier_fraction
                n2 = int(scene.visible[j].sum())
                m[bad, 1] = rng.integers(0, n2, bad.sum())
            graph.add_matches(i + 1, j + 1, m)
    return cameras, images, graph
