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
