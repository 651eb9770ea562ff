"""Camera rigs: multi-camera assemblies with fixed relative poses.

Counterpart of /root/reference/src/base/camera_rig.{h,cc}: a rig is a set
of cameras with cam-from-rig poses plus "snapshots" — groups of images
(one per rig camera) captured at the same instant. Used by the
generalized pose solvers (ops/generalized_pose.py) and RigBundleAdjuster
(sfm/rig_bundle_adjustment.py).

Pose convention (COLMAP): x_cam = R_cam_from_rig @ x_rig + t_cam_from_rig;
x_rig = R_rig_from_world @ x_world + t_rig_from_world.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..ops import rotations as rops


def _compose(q_ab, t_ab, q_bc, t_bc):
    """T_ac = T_ab ∘ T_bc: x_a = R_ab (R_bc x_c + t_bc) + t_ab."""
    R_ab = np.asarray(rops.quat_to_rotmat_np(q_ab))
    R_bc = np.asarray(rops.quat_to_rotmat_np(q_bc))
    R_ac = R_ab @ R_bc
    t_ac = R_ab @ np.asarray(t_bc, float) + np.asarray(t_ab, float)
    return np.asarray(rops.rotmat_to_quat_np(R_ac)), t_ac


def _invert(q, t):
    R = np.asarray(rops.quat_to_rotmat_np(q))
    return (np.asarray(rops.rotmat_to_quat_np(R.T)),
            -R.T @ np.asarray(t, float))


@dataclasses.dataclass
class CameraRig:
    """Mirrors ref base/camera_rig.h: AddCamera/AddSnapshot/SetRefCameraId,
    ComputeRigFromWorld, relative pose accessors."""

    cam_from_rig_q: dict = dataclasses.field(default_factory=dict)
    cam_from_rig_t: dict = dataclasses.field(default_factory=dict)
    snapshots: list = dataclasses.field(default_factory=list)
    ref_camera_id: int | None = None

    def add_camera(self, camera_id: int, qvec, tvec) -> None:
        self.cam_from_rig_q[camera_id] = np.asarray(qvec, float)
        self.cam_from_rig_t[camera_id] = np.asarray(tvec, float)

    def add_snapshot(self, image_ids: list) -> None:
        self.snapshots.append(list(image_ids))

    def set_ref_camera_id(self, camera_id: int) -> None:
        assert camera_id in self.cam_from_rig_q
        self.ref_camera_id = camera_id

    @property
    def num_cameras(self) -> int:
        return len(self.cam_from_rig_q)

    @property
    def num_snapshots(self) -> int:
        return len(self.snapshots)

    def check(self, rec) -> None:
        """Ref CameraRig::Check: every snapshot's images use rig cameras,
        each rig camera at most once per snapshot."""
        for snap in self.snapshots:
            seen = set()
            for iid in snap:
                cid = rec.images[iid].camera_id
                assert cid in self.cam_from_rig_q, \
                    f"camera {cid} not in rig"
                assert cid not in seen, f"camera {cid} twice in snapshot"
                seen.add(cid)

    def normalize_to_ref(self) -> None:
        """Re-express cam-from-rig poses so the reference camera is
        identity (the rig frame = ref camera frame)."""
        assert self.ref_camera_id is not None
        q0 = self.cam_from_rig_q[self.ref_camera_id].copy()
        t0 = self.cam_from_rig_t[self.ref_camera_id].copy()
        q0i, t0i = _invert(q0, t0)
        for cid in self.cam_from_rig_q:
            self.cam_from_rig_q[cid], self.cam_from_rig_t[cid] = _compose(
                self.cam_from_rig_q[cid], self.cam_from_rig_t[cid],
                q0i, t0i)

    def compute_rig_from_world(self, snapshot_idx: int, rec):
        """Average rig-from-world pose of one snapshot from its images'
        registered poses (ref ComputeRigFromWorld: averages the per-camera
        estimates). Returns (qvec, tvec)."""
        qs, cs = [], []
        for iid in self.snapshots[snapshot_idx]:
            im = rec.images[iid]
            cid = im.camera_id
            q_cr, t_cr = (self.cam_from_rig_q[cid],
                          self.cam_from_rig_t[cid])
            q_rc, t_rc = _invert(q_cr, t_cr)
            q_rw, t_rw = _compose(q_rc, t_rc, im.qvec, im.tvec)
            qs.append(q_rw)
            cs.append(t_rw)
        # quaternion averaging: eigenvector of Σ q qᵀ (sign-aligned)
        Q = np.stack([q if q[0] >= 0 else -q for q in qs])
        M = Q.T @ Q
        w, V = np.linalg.eigh(M)
        q_avg = V[:, -1]
        q_avg = q_avg / np.linalg.norm(q_avg)
        if q_avg[0] < 0:
            q_avg = -q_avg
        t_avg = np.mean(np.stack(cs), axis=0)
        return q_avg, t_avg

    def image_pose(self, camera_id: int, q_rig_world, t_rig_world):
        """cam-from-world = cam-from-rig ∘ rig-from-world."""
        return _compose(self.cam_from_rig_q[camera_id],
                        self.cam_from_rig_t[camera_id],
                        q_rig_world, t_rig_world)

    def compute_relative_poses(self, rec) -> None:
        """Estimate cam-from-rig mounts from registered image poses (ref
        CameraRig::ComputeRelativePoses, base/camera_rig.cc): the rig
        frame is the ref camera's frame; each mount is the quaternion/
        translation average of cam_from_world ∘ world_from_ref over all
        snapshots containing both cameras."""
        assert self.ref_camera_id is not None
        acc_q = {cid: [] for cid in self.cam_from_rig_q}
        acc_t = {cid: [] for cid in self.cam_from_rig_q}
        for snap in self.snapshots:
            ref_im = None
            for iid in snap:
                if rec.images[iid].camera_id == self.ref_camera_id:
                    ref_im = rec.images[iid]
            if ref_im is None:
                continue
            q_wr, t_wr = _invert(ref_im.qvec, ref_im.tvec)
            for iid in snap:
                im = rec.images[iid]
                q, t = _compose(im.qvec, im.tvec, q_wr, t_wr)
                acc_q[im.camera_id].append(q)
                acc_t[im.camera_id].append(t)
        for cid in self.cam_from_rig_q:
            if not acc_q[cid]:
                continue
            Q = np.stack([q if q[0] >= 0 else -q for q in acc_q[cid]])
            w, V = np.linalg.eigh(Q.T @ Q)
            q_avg = V[:, -1]
            if q_avg[0] < 0:
                q_avg = -q_avg
            self.cam_from_rig_q[cid] = q_avg / np.linalg.norm(q_avg)
            self.cam_from_rig_t[cid] = np.mean(np.stack(acc_t[cid]), axis=0)


def read_rig_config(path: str, rec) -> list:
    """Load camera rigs from a JSON config (ref ReadCameraRigConfig,
    exe/colmap.cc:1659-1712): a list of
    {"cameras": [{"camera_id", "image_prefix"}...], "ref_camera_id"};
    snapshots are grouped by the image-name suffix after the prefix and
    kept only if the reference camera is present."""
    import json

    with open(path) as f:
        cfg = json.load(f)
    rigs = []
    for rig_cfg in cfg:
        rig = CameraRig()
        prefixes = []
        for cam in rig_cfg["cameras"]:
            prefixes.append(cam["image_prefix"])
            rig.add_camera(cam["camera_id"],
                           np.array([1.0, 0, 0, 0]), np.zeros(3))
        rig.set_ref_camera_id(rig_cfg["ref_camera_id"])
        snapshots: dict = {}
        for iid in rec.reg_image_ids:
            name = rec.images[iid].name
            for prefix in prefixes:
                if prefix in name:
                    suffix = name.split(prefix, 1)[1]
                    snapshots.setdefault(suffix, []).append(iid)
        for suffix in sorted(snapshots):
            snap = snapshots[suffix]
            if any(rec.images[iid].camera_id == rig.ref_camera_id
                   for iid in snap):
                rig.add_snapshot(snap)
        rig.check(rec)
        rig.compute_relative_poses(rec)
        rigs.append(rig)
    return rigs


def make_rig_ba_problem(rec, rigs: list, cameras: dict = None):
    """Build a RigBAProblem from a reconstruction + rigs (the glue the
    ref rig_bundle_adjuster CLI does via BundleAdjustmentConfig,
    exe/colmap.cc:1713-1758).  Images not covered by any rig snapshot are
    treated as single-image snapshots with an identity mount.

    Returns (problem, meta) where meta carries the index maps needed to
    write results back (snapshot list, rig-camera list, point ids).
    """
    import jax.numpy as jnp

    from ..sfm.rig_bundle_adjustment import RigBAProblem

    cameras = cameras or rec.cameras
    # rig-camera slots: (rig_idx, camera_id); slot 0.. for free cameras
    mount_key = {}
    mount_q, mount_t = [], []
    snaps = []          # list of (image_ids, rig_idx or None)
    covered = set()
    for ridx, rig in enumerate(rigs):
        for cid in sorted(rig.cam_from_rig_q):
            mount_key[(ridx, cid)] = len(mount_q)
            mount_q.append(rig.cam_from_rig_q[cid])
            mount_t.append(rig.cam_from_rig_t[cid])
        for sidx, snap in enumerate(rig.snapshots):
            q, t = rig.compute_rig_from_world(sidx, rec)
            snaps.append((list(snap), ridx, q, t))
            covered.update(snap)
    free_mount = {}
    for iid in rec.reg_image_ids:
        if iid in covered:
            continue
        cid = rec.images[iid].camera_id
        if ("free", cid) not in free_mount:
            free_mount[("free", cid)] = len(mount_q)
            mount_q.append(np.array([1.0, 0, 0, 0]))
            mount_t.append(np.zeros(3))
        im = rec.images[iid]
        snaps.append(([iid], None, np.asarray(im.qvec, float),
                      np.asarray(im.tvec, float)))
    mount_key.update(free_mount)

    pt_ids = sorted(rec.points3D)
    pt_of = {pid: k for k, pid in enumerate(pt_ids)}
    snap_of = {}
    for sidx, (ims, ridx, _, _) in enumerate(snaps):
        for iid in ims:
            snap_of[iid] = (sidx, ridx)
    snap_idx, cam_idx, pt_idx, obs_xy, focal, pp = [], [], [], [], {}, {}
    for pid in pt_ids:
        for iid, kp in rec.points3D[pid].track:
            if iid not in snap_of:
                continue
            sidx, ridx = snap_of[iid]
            cid = rec.images[iid].camera_id
            key = (ridx, cid) if ridx is not None else ("free", cid)
            midx = mount_key[key]
            cam = cameras[cid]
            f = cam.focal()
            focal[midx] = float(np.mean(f)) if np.ndim(f) else float(f)
            K = np.asarray(cam.calibration_matrix())
            pp[midx] = (float(K[0, 2]), float(K[1, 2]))
            snap_idx.append(sidx)
            cam_idx.append(midx)
            pt_idx.append(pt_of[pid])
            obs_xy.append(rec.images[iid].xys[kp])
    C = len(mount_q)
    focal_arr = np.array([focal.get(k, 1.0) for k in range(C)])
    pp_arr = np.array([pp.get(k, (0.0, 0.0)) for k in range(C)])
    prob = RigBAProblem(
        snap_idx=jnp.asarray(snap_idx, jnp.int32),
        cam_idx=jnp.asarray(cam_idx, jnp.int32),
        pt_idx=jnp.asarray(pt_idx, jnp.int32),
        obs_xy=jnp.asarray(np.asarray(obs_xy, float)),
        focal=jnp.asarray(focal_arr), pp=jnp.asarray(pp_arr),
        rig_q=jnp.asarray(np.stack([s[2] for s in snaps])),
        rig_t=jnp.asarray(np.stack([s[3] for s in snaps])),
        mount_q=jnp.asarray(np.stack(mount_q)),
        mount_t=jnp.asarray(np.stack(mount_t)),
        points=jnp.asarray(np.stack([rec.points3D[p].xyz
                                     for p in pt_ids])))
    meta = {"snaps": snaps, "mount_key": mount_key, "pt_ids": pt_ids}
    return prob, meta


def apply_rig_ba_result(rec, rigs: list, out, meta) -> None:
    """Write a RigBAResult back into the reconstruction (and rig mounts)."""
    for (key, midx) in meta["mount_key"].items():
        if key[0] == "free":
            continue
        ridx, cid = key
        rigs[ridx].cam_from_rig_q[cid] = np.asarray(out.mount_q[midx])
        rigs[ridx].cam_from_rig_t[cid] = np.asarray(out.mount_t[midx])
    for sidx, (ims, ridx, _, _) in enumerate(meta["snaps"]):
        q_rw = np.asarray(out.rig_q[sidx])
        t_rw = np.asarray(out.rig_t[sidx])
        for iid in ims:
            cid = rec.images[iid].camera_id
            if ridx is not None:
                q, t = rigs[ridx].image_pose(cid, q_rw, t_rw)
            else:
                midx = meta["mount_key"][("free", cid)]
                q, t = _compose(np.asarray(out.mount_q[midx]),
                                np.asarray(out.mount_t[midx]), q_rw, t_rw)
            rec.images[iid].qvec = q
            rec.images[iid].tvec = t
    for k, pid in enumerate(meta["pt_ids"]):
        rec.points3D[pid].xyz = np.asarray(out.points[k])
