"""Incremental SfM mapper: host control loop over batched device kernels.

TPU-native counterpart of /root/reference/src/sfm/incremental_mapper.{h,cc}
and incremental_triangulator.{h,cc}. The reference interleaves per-point
host loops with Ceres solves; here every geometric step is one batched
device call (RANSAC pose, triangulation, BA), and the host only does the
graph-shaped bookkeeping:

  find_initial_pair      (ref incremental_mapper.cc FindInitialImagePair :161)
  register_initial_pair  (ref :258)
  find_next_images       (ref FindNextImages :202, visibility-score ranking)
  register_next_image    (ref RegisterNextImage :344 — 2D-3D LORANSAC P3P
                          + pose refine + observation insertion)
  triangulate_image      (ref IncrementalTriangulator::TriangulateImage)
  local / global BA      (ref AdjustLocalBundle :563 / AdjustGlobalBundle :658)
  filtering              (ref FilterPoints/FilterImages)

Shape discipline: device-call arrays are padded to power-of-two buckets so
XLA compiles a handful of program shapes per scene, not one per call.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from dagsfm_tpu.ops import absolute_pose as ap
from dagsfm_tpu.ops import epipolar as epi
from dagsfm_tpu.ops import ransac as rnsc
from dagsfm_tpu.ops import rotations as rops
from dagsfm_tpu.ops import triangulation as tri
from dagsfm_tpu.scene import cameras as cm
from dagsfm_tpu.scene.reconstruction import ImageRecord, Reconstruction
from dagsfm_tpu.sfm import bundle_adjustment as ba
from dagsfm_tpu.sfm.correspondence_graph import CorrespondenceGraph


@dataclasses.dataclass
class MapperOptions:
    """Defaults mirror reference incremental_mapper.h:66-134 options."""
    init_min_num_inliers: int = 50
    init_min_tri_angle_deg: float = 4.0
    # bootstrap retries: how many DIFFERENT init pairs to try when the
    # model never grows past 2 images (ref init_num_trials=200; ours is
    # smaller because each trial includes a full growth attempt)
    init_num_trials: int = 10
    abs_pose_max_error_px: float = 12.0
    abs_pose_min_num_inliers: int = 15
    abs_pose_min_inlier_ratio: float = 0.25
    filter_max_reproj_error_px: float = 4.0
    filter_min_tri_angle_deg: float = 1.5
    min_tri_angle_deg: float = 1.5
    tri_max_reproj_error_px: float = 8.0
    # triangulator merge/complete/retriangulate thresholds (ref
    # incremental_triangulator.h:43-90 Options: merge_max_reproj_error,
    # complete_max_reproj_error, re_min_ratio, re_max_trials)
    merge_max_reproj_error_px: float = 4.0
    complete_max_reproj_error_px: float = 4.0
    retri_min_ratio: float = 0.2
    retri_max_trials: int = 1
    # transitive correspondence depth when completing tracks (ref
    # correspondence_graph.h FindTransitiveCorrespondences)
    complete_transitivity: int = 5
    # intrinsics refinement during BA for cameras WITHOUT a focal prior
    # (ref incremental_mapper_controller.h:100-110 defaults:
    # ba_refine_focal_length=true, ba_refine_principal_point=false,
    # ba_refine_extra_params=true; cameras with prior_focal keep their
    # calibration fixed — the EXIF/user-provided value is trusted)
    ba_refine_focal: bool = True
    ba_refine_principal: bool = False
    ba_refine_extra: bool = True
    local_ba_num_images: int = 6
    ba_global_images_ratio: float = 1.1
    ba_global_points_ratio: float = 1.1
    ba_local_max_iterations: int = 15
    ba_global_max_iterations: int = 40
    # periodic model snapshots (ref snapshot_path/snapshot_images_freq,
    # incremental_mapper_controller.h:121-125): write cameras/images/
    # points3D .bin under snapshot_path every N registered images
    snapshot_path: str = ""
    snapshot_images_freq: int = 0
    num_ransac_hypotheses: int = 512
    max_track_len: int = 16
    # 'strict' = rank-one-register-one (the reference's exact loop,
    # incremental_mapper.cc:202 FindNextImages after EVERY registration);
    # 'batch' = register the top-5 ranked candidates per ranking round —
    # a deliberate scaling trade that amortizes the ranking rescan at
    # 500+ images (both modes are measured in bench_suite.py)
    registration_mode: str = "batch"
    seed: int = 0


def _bucket(n: int, minimum: int = 64, factor: int = 2) -> int:
    """Round n up to minimum * factor^k.

    Every padded size is a jit shape key; the per-registration kernels
    use coarse buckets (minimum=256, factor=4 -> 256/1024/4096) so an
    entire incremental run compiles each kernel a handful of times
    instead of once per power of two (compiles through the remote-TPU
    tunnel cost tens of seconds — they, not FLOPs, dominated the
    mapper's cold wall-clock)."""
    b = minimum
    while b < n:
        b *= factor
    return b


def _pad_to(arr: np.ndarray, n: int):
    pad = n - arr.shape[0]
    return np.pad(arr, [(0, pad)] + [(0, 0)] * (arr.ndim - 1))


class IncrementalMapper:
    """Drives reconstruction of one (sub-)scene.

    images: dict image_id -> ImageRecord with keypoints in `xys` (pixels).
    cameras: dict camera_id -> Camera.
    graph: CorrespondenceGraph with verified (inlier) matches.
    """

    def __init__(self, cameras: dict, images: dict,
                 graph: CorrespondenceGraph,
                 options: MapperOptions | None = None):
        self.opts = options or MapperOptions()
        self.graph = graph
        self.rec = Reconstruction()
        for c in cameras.values():
            self.rec.add_camera(c)
        for im in images.values():
            rec_im = dataclasses.replace(
                im, point3D_ids=np.full(len(im.xys), -1, np.int64),
                registered=False)
            self.rec.add_image(rec_im)
        self._rng = np.random.default_rng(self.opts.seed)
        self._key = jax.random.PRNGKey(self.opts.seed)
        self._last_snapshot_at = 0
        self._num_reg_at_last_global_ba = 0
        self._num_pts_at_last_global_ba = 0
        self._tried_init_pairs: set = set()
        self._failed_regs: dict = {}
        self._merge_candidates: set = set()
        self._cam_snapshot: dict | None = None

    @classmethod
    def wrap(cls, cameras: dict, rec: Reconstruction,
             graph: CorrespondenceGraph,
             options: "MapperOptions | None" = None) -> "IncrementalMapper":
        """Wrap an EXISTING reconstruction (e.g. the merged model) so its
        triangulation / BA / filtering machinery can be reused — used by
        the controller for separator retriangulation (ref :823)."""
        self = cls.__new__(cls)
        self.opts = options or MapperOptions()
        self.graph = graph
        self.rec = rec
        self._rng = np.random.default_rng(self.opts.seed)
        self._key = jax.random.PRNGKey(self.opts.seed)
        self._num_reg_at_last_global_ba = rec.num_reg_images()
        self._num_pts_at_last_global_ba = rec.num_points3D()
        self._tried_init_pairs = set()
        self._failed_regs = {}
        self._merge_candidates = set()
        self._cam_snapshot = None
        return self

    # ------------------------------------------------------------------ utils
    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def _cam_of(self, image_id: int) -> cm.Camera:
        return self.rec.cameras[self.rec.images[image_id].camera_id]

    def _normalize(self, image_id: int, xys: np.ndarray) -> np.ndarray:
        """Pixels -> normalized cam coords via iterative undistortion."""
        cam = self._cam_of(image_id)
        if cam.model_id in (cm.SIMPLE_PINHOLE, cm.PINHOLE):
            K = cam.calibration_matrix()
            return (xys - K[:2, 2]) / np.array([K[0, 0], K[1, 1]])
        params = np.zeros(cm.MAX_CAMERA_PARAMS)
        params[: len(cam.params)] = cam.params
        n = _bucket(len(xys), 256, 4)
        uv = np.asarray(_jit_cam_from_img(
            cam.model_id, jnp.asarray(params), jnp.asarray(_pad_to(xys, n))))
        return uv[: len(xys)]

    def _focal(self, image_id: int) -> float:
        return self._cam_of(image_id).focal()

    # ------------------------------------------------------ initial pair
    def find_initial_pair(self):
        """Rank pairs by correspondence count; verify E-geometry."""
        pairs = sorted(self.graph.image_pairs(),
                       key=lambda p: -len(self.graph.pair_matches[p]))
        for (i, j) in pairs:
            if (i, j) in self._tried_init_pairs:
                continue
            self._tried_init_pairs.add((i, j))
            ok = self._try_initialize(i, j)
            if ok:
                return (i, j)
        return None

    def _estimate_two_view(self, i: int, j: int, min_matches=None):
        m = self.graph.matches_between(i, j)
        if min_matches is None:
            min_matches = max(8, self.opts.init_min_num_inliers // 4)
        if len(m) < min_matches:
            return None
        x1 = self._normalize(i, self.rec.images[i].xys[m[:, 0]])
        x2 = self._normalize(j, self.rec.images[j].xys[m[:, 1]])
        n = _bucket(len(m), 256, 4)
        mask = np.zeros(n, bool)
        mask[: len(m)] = True
        x1p = _pad_to(x1, n)
        x2p = _pad_to(x2, n)
        thr = (self.opts.abs_pose_max_error_px / 3.0 / self._focal(i)) ** 2
        res = _ransac_essential(
            self._next_key(), jnp.asarray(x1p), jnp.asarray(x2p),
            jnp.asarray(mask), thr, self.opts.num_ransac_hypotheses)
        return m, x1p, x2p, mask, res

    def _try_initialize(self, i: int, j: int) -> bool:
        # host pre-filter: fewer matches than init_min_num_inliers can
        # never clear the inlier gate below — skip the device RANSAC
        # entirely (with init-pair RETRY, scans walk deep into the
        # ranked pair list; paying ~0.1 s of device time per hopeless
        # pair made each retry cost a minute at 200+ images)
        out = self._estimate_two_view(
            i, j, min_matches=self.opts.init_min_num_inliers)
        if out is None:
            return False
        m, x1p, x2p, mask, res = out
        if int(res.num_inliers) < self.opts.init_min_num_inliers:
            return False
        R, t, n_front, X, ang, z1, z2 = jax.device_get(_init_geometry(
            res.model, jnp.asarray(x1p), jnp.asarray(x2p), res.inliers))
        if int(n_front) < self.opts.init_min_num_inliers:
            return False
        q1 = np.array([1.0, 0, 0, 0])
        t1 = np.zeros(3)
        q2 = np.asarray(rops.rotmat_to_quat_np(R))
        t2 = np.asarray(t)
        inl = np.asarray(res.inliers)
        good = inl & (z1 > 1e-3) & (z2 > 1e-3) & \
            (ang > self.opts.min_tri_angle_deg)
        if good.sum() < self.opts.init_min_num_inliers:
            return False
        if np.median(ang[good]) < self.opts.init_min_tri_angle_deg:
            return False

        # commit: register both images + create points
        imi, imj = self.rec.images[i], self.rec.images[j]
        imi.qvec, imi.tvec = q1, t1
        imj.qvec, imj.tvec = q2, t2
        self.rec.register_image(i)
        self.rec.register_image(j)
        for k in np.nonzero(good)[0]:
            ki, kj = int(m[k, 0]), int(m[k, 1])
            if imi.point3D_ids[ki] >= 0 or imj.point3D_ids[kj] >= 0:
                continue
            self.rec.add_point3D(X[k], [(i, ki), (j, kj)])
        return True

    # ------------------------------------------------------ next images
    def find_next_images(self) -> list:
        """Unregistered images ranked by visible-triangulated-point score.

        Simplified VisibilityPyramid (ref base/visibility_pyramid): score =
        Σ levels of a coarse-to-fine grid hit by visible points, favouring
        spatial spread, + count. Vectorized per (image, registered
        neighbor) pair — no per-correspondence Python rows (the ref's
        per-registration rescan was the scaling wall at 500+ images).
        """
        reg = set(self.rec.reg_image_ids)
        scores = []
        for i, im in self.rec.images.items():
            if im.registered or i in reg:
                continue
            vis = []
            for j in self.graph.neighbors.get(i, ()):
                if j not in reg:
                    continue
                m = self.graph.matches_between(i, j)
                if len(m) == 0:
                    continue
                pid = self.rec.images[j].point3D_ids[m[:, 1]]
                sel = m[pid >= 0, 0]
                if len(sel):
                    vis.append(sel)
            if not vis:
                continue
            vis_kps = np.unique(np.concatenate(vis))
            cam = self._cam_of(i)
            pts = self.rec.images[i].xys[vis_kps.astype(np.int64)]
            score = float(len(vis_kps))
            for level in (2, 4, 8):  # pyramid levels
                gx = np.clip((pts[:, 0] / max(cam.width, 1) * level
                              ).astype(int), 0, level - 1)
                gy = np.clip((pts[:, 1] / max(cam.height, 1) * level
                              ).astype(int), 0, level - 1)
                score += len(np.unique(gy * level + gx)) * level
            # demote images that failed before
            score /= (1 + self._failed_regs.get(i, 0) * 2)
            scores.append((score, i))
        scores.sort(key=lambda s: -s[0])
        return [i for _, i in scores]

    # ------------------------------------------------- registration
    def register_next_image(self, image_id: int) -> bool:
        """2D-3D LORANSAC P3P + refinement + observation insertion."""
        reg = set(self.rec.reg_image_ids)
        corrs = self.graph.correspondences_of_image(image_id, others=reg)
        # keypoint -> set of visible point3D ids
        kp2pts: dict[int, set] = {}
        for kp, j, kj in corrs:
            pid = self.rec.images[int(j)].point3D_ids[int(kj)]
            if pid >= 0:
                kp2pts.setdefault(int(kp), set()).add(int(pid))
        if len(kp2pts) < self.opts.abs_pose_min_num_inliers:
            self._failed_regs[image_id] = \
                self._failed_regs.get(image_id, 0) + 1
            return False

        kp_idx, pids = [], []
        for kp, pidset in kp2pts.items():
            for pid in pidset:
                kp_idx.append(kp)
                pids.append(pid)
        kp_idx = np.array(kp_idx)
        pids = np.array(pids)
        X = np.stack([self.rec.points3D[p].xyz for p in pids])

        n = _bucket(len(X), 256, 4)
        mask = np.zeros(n, bool)
        mask[: len(X)] = True
        Xp = _pad_to(X, n)

        cam = self._cam_of(image_id)
        # focal-grid search only for a camera's FIRST registration
        # (matching the reference: once other images of the camera are
        # registered, BA refinement owns the focal — re-running the
        # coarse grid would re-quantize a BA-polished value)
        cam_in_use = any(
            self.rec.images[j].camera_id == cam.camera_id
            for j in self.rec.reg_image_ids)
        if not cam.prior_focal and not cam_in_use:
            # unknown calibration: focal-grid P3P search (ref pose.cc:79)
            K = cam.calibration_matrix()
            centered = self.rec.images[image_id].xys[kp_idx] - K[:2, 2]
            model, inliers, num, factor = _ransac_p3p_focal(
                self._next_key(), jnp.asarray(Xp),
                jnp.asarray(_pad_to(centered, n)), jnp.asarray(mask),
                cam.focal(), self.opts.abs_pose_max_error_px,
                self.opts.num_ransac_hypotheses)
            if int(num) >= self.opts.abs_pose_min_num_inliers:
                self.rec.cameras[cam.camera_id] = cm.scale_focal(
                    cam, float(factor))

        uv = self._normalize(image_id,
                             self.rec.images[image_id].xys[kp_idx])
        uvp = _pad_to(uv, n)
        thr = (self.opts.abs_pose_max_error_px / self._focal(image_id)) ** 2
        # ONE device dispatch + ONE host fetch for the whole
        # registration estimate: P3P-LORANSAC, pose refinement and the
        # quat conversion are fused, and every output crosses the
        # tunnel together (separate int()/asarray() fetches cost one
        # ~35 ms round trip EACH through remote TPU — they dominated
        # warm registration time)
        q2, t2, inliers, n_inl = jax.device_get(_register_pose(
            self._next_key(), jnp.asarray(Xp), jnp.asarray(uvp),
            jnp.asarray(mask), thr, self.opts.num_ransac_hypotheses))
        n_inl = int(n_inl)
        if (n_inl < self.opts.abs_pose_min_num_inliers
                or n_inl < self.opts.abs_pose_min_inlier_ratio
                * len(kp2pts)):
            self._failed_regs[image_id] = \
                self._failed_regs.get(image_id, 0) + 1
            return False

        im = self.rec.images[image_id]
        im.qvec = np.asarray(q2)
        im.tvec = np.asarray(t2)
        self.rec.register_image(image_id)

        # add observations for inlier 2D-3D (continue tracks)
        inl = np.asarray(inliers)[: len(X)]
        used_kp = set()
        for k in np.nonzero(inl)[0]:
            kp = int(kp_idx[k])
            pid = int(pids[k])
            if kp in used_kp or im.point3D_ids[kp] >= 0:
                continue
            if pid not in self.rec.points3D:
                continue
            self.rec.add_observation(pid, image_id, kp)
            used_kp.add(kp)
        return True

    # ------------------------------------------------- triangulation
    def triangulate_image(self, image_id: int) -> int:
        """Create new points from matches of image_id to registered images.

        Batched two-view DLT + checks (angle, reprojection, cheirality);
        ref IncrementalTriangulator::TriangulateImage + Create/Continue.
        """
        im_i = self.rec.images[image_id]
        if not im_i.registered:
            return 0
        reg = set(self.rec.reg_image_ids) - {image_id}
        cand = []  # (j, ki, kj)
        for kp, j, kj in self.graph.correspondences_of_image(
                image_id, others=reg):
            ki, j, kj = int(kp), int(j), int(kj)
            pid_i = im_i.point3D_ids[ki]
            pid_j = self.rec.images[j].point3D_ids[kj]
            if pid_i >= 0 and pid_j >= 0:
                if pid_i != pid_j:
                    # same physical track split across two 3D points —
                    # queue for merge_tracks()
                    self._merge_candidates.add(int(pid_i))
                continue
            if pid_i < 0 and pid_j >= 0:
                continue  # handled at registration (continue track)
            if pid_i >= 0 and pid_j < 0:
                # continue track into j
                pid = int(pid_i)
                if pid in self.rec.points3D and \
                        self._obs_ok(j, kj, self.rec.points3D[pid].xyz):
                    self.rec.add_observation(pid, j, kj)
                continue
            cand.append((j, ki, kj))
        if not cand:
            return 0

        cand = np.array(cand)
        x1 = self._normalize(image_id, im_i.xys[cand[:, 1]])
        q1 = np.broadcast_to(im_i.qvec, (len(cand), 4))
        t1 = np.broadcast_to(im_i.tvec, (len(cand), 3))
        q2 = np.stack([self.rec.images[int(j)].qvec for j in cand[:, 0]])
        t2 = np.stack([self.rec.images[int(j)].tvec for j in cand[:, 0]])
        # normalize candidate keypoints grouped by image (one vectorized
        # _normalize call per neighbor image, not per candidate)
        x2 = np.zeros((len(cand), 2))
        for j in np.unique(cand[:, 0]):
            rows = np.nonzero(cand[:, 0] == j)[0]
            kjs = cand[rows, 2].astype(np.int64)
            x2[rows] = self._normalize(int(j),
                                       self.rec.images[int(j)].xys[kjs])

        n = _bucket(len(cand), 256, 4)
        X = np.asarray(_triangulate_checked(
            jnp.asarray(_pad_to(q1, n)), jnp.asarray(_pad_to(t1, n)),
            jnp.asarray(_pad_to(q2, n)), jnp.asarray(_pad_to(t2, n)),
            jnp.asarray(_pad_to(x1, n)), jnp.asarray(_pad_to(x2, n))))
        X, ang, e1, e2, z1, z2 = (X[:, :3], X[:, 3], X[:, 4], X[:, 5],
                                  X[:, 6], X[:, 7])
        thr = self.opts.tri_max_reproj_error_px / self._focal(image_id)
        good = ((ang > np.radians(self.opts.min_tri_angle_deg))
                & (e1 < thr ** 2) & (e2 < thr ** 2)
                & (z1 > 1e-4) & (z2 > 1e-4))[: len(cand)]

        created = 0
        for k in np.nonzero(good)[0]:
            j, ki, kj = (int(cand[k, 0]), int(cand[k, 1]), int(cand[k, 2]))
            if im_i.point3D_ids[ki] >= 0:
                # track already created this round by an earlier pair:
                # continue it into j instead
                pid = int(im_i.point3D_ids[ki])
                if self.rec.images[j].point3D_ids[kj] < 0 and \
                        pid in self.rec.points3D:
                    self.rec.add_observation(pid, j, kj)
                continue
            if self.rec.images[j].point3D_ids[kj] >= 0:
                continue
            self.rec.add_point3D(X[k], [(image_id, ki), (j, kj)])
            created += 1
        return created

    def _obs_ok(self, image_id: int, kp: int, xyz: np.ndarray,
                max_error_px: float | None = None) -> bool:
        im = self.rec.images[image_id]
        Rcw = rops.quat_to_rotmat_np(im.qvec)
        Xc = Rcw @ xyz + im.tvec
        if Xc[2] < 1e-4:
            return False
        uv = self._normalize(image_id, im.xys[kp][None])[0]
        err = np.linalg.norm(Xc[:2] / Xc[2] - uv) * self._focal(image_id)
        if max_error_px is None:
            max_error_px = self.opts.tri_max_reproj_error_px
        return err < max_error_px

    # --------------------------- triangulator merge/complete/retriangulate
    # (ref incremental_triangulator.h:43-90: Merge/Complete/Retriangulate)

    def merge_tracks(self, point_ids=None) -> int:
        """Fuse 3D points that are the same physical track (ref
        IncrementalTriangulator::Merge).

        Two points are merge candidates when a keypoint correspondence
        links observations assigned to different point ids. The merged
        position is the track-length-weighted mean; the merge is accepted
        only if every observation of BOTH tracks reprojects within
        merge_max_reproj_error_px.
        """
        if point_ids is None:
            point_ids = set(self._merge_candidates)
        self._merge_candidates.clear()
        merged = 0
        queue = list(point_ids)
        while queue:
            pid = queue.pop()
            if pid not in self.rec.points3D:
                continue
            new_pid = self._try_merge(pid)
            if new_pid is not None:
                merged += 1
                queue.append(new_pid)  # keep merging into the fused point
        return merged

    def _merge_partners(self, pid: int) -> set:
        """Point ids linked to pid's track by keypoint correspondences."""
        partners = set()
        for (i, kp) in self.rec.points3D[pid].track:
            for j, kj in self.graph.correspondences_of(int(i), int(kp)):
                im_j = self.rec.images.get(int(j))
                if im_j is None or not im_j.registered:
                    continue
                pid2 = int(im_j.point3D_ids[int(kj)])
                if pid2 >= 0 and pid2 != pid and \
                        pid2 in self.rec.points3D:
                    partners.add(pid2)
        return partners

    def _try_merge(self, pid: int):
        """Attempt to merge pid with one correspondence-linked partner.

        Returns the new fused point id, or None."""
        pt1 = self.rec.points3D[pid]
        for pid2 in sorted(self._merge_partners(pid)):
            pt2 = self.rec.points3D[pid2]
            n1, n2 = len(pt1.track), len(pt2.track)
            xyz = (n1 * pt1.xyz + n2 * pt2.xyz) / (n1 + n2)
            track = list(pt1.track) + list(pt2.track)
            # a fused track may not observe one image twice
            imgs = [i for (i, _) in track]
            if len(set(imgs)) != len(imgs):
                continue
            if all(self._obs_ok(int(i), int(kp), xyz,
                                self.opts.merge_max_reproj_error_px)
                   for (i, kp) in track):
                self.rec.delete_point3D(pid)
                self.rec.delete_point3D(pid2)
                new_pid = self.rec.add_point3D(xyz, track)
                return new_pid
        return None

    def complete_tracks(self, point_ids=None) -> int:
        """Extend tracks transitively along keypoint correspondences
        (ref IncrementalTriangulator::Complete): an unassigned keypoint
        correspondence of a track member joins the track if the point
        reprojects within complete_max_reproj_error_px.
        """
        if point_ids is None:
            point_ids = list(self.rec.points3D.keys())
        completed = 0
        for pid in point_ids:
            pt = self.rec.points3D.get(pid)
            if pt is None:
                continue
            queue = list(pt.track)
            depth = 0
            while queue and depth < self.opts.complete_transitivity:
                depth += 1
                nxt = []
                for (i, kp) in queue:
                    for j, kj in self.graph.correspondences_of(
                            int(i), int(kp)):
                        j, kj = int(j), int(kj)
                        im_j = self.rec.images.get(j)
                        if im_j is None or not im_j.registered:
                            continue
                        if im_j.point3D_ids[kj] >= 0:
                            continue
                        if not self._obs_ok(
                                j, kj, pt.xyz,
                                self.opts.complete_max_reproj_error_px):
                            continue
                        self.rec.add_observation(pid, j, kj)
                        nxt.append((j, kj))
                        completed += 1
                queue = nxt
        return completed

    def retriangulate(self) -> int:
        """Re-triangulate under-reconstructed image pairs (ref
        IncrementalTriangulator::Retriangulate): pairs whose triangulated
        fraction is below retri_min_ratio get another create pass, at
        most retri_max_trials times per pair.
        """
        if not hasattr(self, "_retri_trials"):
            self._retri_trials = {}
        created = 0
        reg = set(self.rec.reg_image_ids)
        for (i, j) in self.graph.image_pairs():
            if i not in reg or j not in reg:
                continue
            m = self.graph.matches_between(i, j)
            if len(m) == 0:
                continue
            pi = self.rec.images[i].point3D_ids[m[:, 0]]
            pj = self.rec.images[j].point3D_ids[m[:, 1]]
            tri_ratio = float(((pi >= 0) & (pi == pj)).sum()) / len(m)
            if tri_ratio >= self.opts.retri_min_ratio:
                continue
            trials = self._retri_trials.get((i, j), 0)
            if trials >= self.opts.retri_max_trials:
                continue
            self._retri_trials[(i, j)] = trials + 1
            created += self._triangulate_pair(i, j, m)
        return created

    def _triangulate_pair(self, i: int, j: int, m: np.ndarray) -> int:
        """Batched two-view create over a pair's untriangulated matches."""
        im_i, im_j = self.rec.images[i], self.rec.images[j]
        free = (im_i.point3D_ids[m[:, 0]] < 0) & \
            (im_j.point3D_ids[m[:, 1]] < 0)
        cand = m[free]
        if len(cand) == 0:
            return 0
        x1 = self._normalize(i, im_i.xys[cand[:, 0]])
        x2 = self._normalize(j, im_j.xys[cand[:, 1]])
        n = _bucket(len(cand), 256, 4)
        q1 = np.broadcast_to(im_i.qvec, (len(cand), 4))
        t1 = np.broadcast_to(im_i.tvec, (len(cand), 3))
        q2 = np.broadcast_to(im_j.qvec, (len(cand), 4))
        t2 = np.broadcast_to(im_j.tvec, (len(cand), 3))
        X = np.asarray(_triangulate_checked(
            jnp.asarray(_pad_to(q1, n)), jnp.asarray(_pad_to(t1, n)),
            jnp.asarray(_pad_to(q2, n)), jnp.asarray(_pad_to(t2, n)),
            jnp.asarray(_pad_to(x1, n)), jnp.asarray(_pad_to(x2, n))))
        X, ang, e1, e2, z1, z2 = (X[:, :3], X[:, 3], X[:, 4], X[:, 5],
                                  X[:, 6], X[:, 7])
        thr = self.opts.tri_max_reproj_error_px / self._focal(i)
        good = ((ang > np.radians(self.opts.min_tri_angle_deg))
                & (e1 < thr ** 2) & (e2 < thr ** 2)
                & (z1 > 1e-4) & (z2 > 1e-4))[: len(cand)]
        created = 0
        for k in np.nonzero(good)[0]:
            ki, kj = int(cand[k, 0]), int(cand[k, 1])
            if im_i.point3D_ids[ki] >= 0 or im_j.point3D_ids[kj] >= 0:
                continue
            self.rec.add_point3D(X[k], [(i, ki), (j, kj)])
            created += 1
        return created

    # ------------------------------------------------- bundle adjustment
    def _run_ba(self, image_ids: list, max_iterations: int,
                const_images: set):
        """BA over the given registered images (+ their points)."""
        id_list = sorted(set(image_ids))
        # observations only for selected images; points referenced by ≥2
        pids = set()
        for i in id_list:
            for pid in self.rec.images[i].point3D_ids:
                if pid >= 0:
                    pids.add(int(pid))
        arrays, ids = _export_sub_arrays(self.rec, id_list, sorted(pids))
        if arrays is None:
            return
        cam_ids, img_ids, pt_ids = ids
        # arrays.image_* are bucket-padded beyond len(img_ids): pads are
        # constant (identity) cameras with no observations
        # Gauge: ONE full pose pinned (6 dofs); the scale dof is left to
        # LM damping, and absolute scale is restored downstream by the
        # Sim(3) aligner when partitions merge. The reference pins one
        # pose + one translation COMPONENT (7 dofs exactly,
        # FixGauge); pinning a SECOND full pose instead (as earlier
        # rounds did) over-constrains by 5 REAL dofs — fatally so for
        # the init-pair BA, where it froze the (noisy) two-view relative
        # pose forever and the 4px filter then gutted the model.
        # Block-level masking keeps every solver path scatter-free (a
        # per-COMPONENT mask would put an (I,6) mask inside all four
        # Schur assemblies).
        const = np.ones(arrays.image_qvec.shape[0], bool)
        for k, i in enumerate(img_ids):
            const[k] = i in const_images
        if const[: len(img_ids)].sum() == 0 and len(img_ids) >= 2:
            const[:1] = True
        # intrinsics refinement (ref optim/bundle_adjustment.cc:338
        # camera params as variable blocks): FOCAL refines only for
        # cameras without a prior (the EXIF/user calibration is
        # trusted), but zero-initialized DISTORTION refines for every
        # camera whose model has distortion slots — an EXIF focal says
        # nothing about k1 (ref ba_refine_extra_params=true default,
        # incremental_mapper_controller.h:100-110). Padded camera rows
        # (arrays.cam_model_id is bucket-padded past len(cam_ids)) are
        # never eligible for anything.
        C_pad = arrays.cam_model_id.shape[0]
        elig_focal = np.zeros(C_pad, bool)
        elig_focal[: len(cam_ids)] = [not self.rec.cameras[c].prior_focal
                                      for c in cam_ids]
        elig_extra = np.zeros(C_pad, bool)
        elig_extra[: len(cam_ids)] = True
        cam_refine = cm.intrinsics_refine_mask(
            arrays.cam_model_id, self.opts.ba_refine_focal,
            self.opts.ba_refine_principal, self.opts.ba_refine_extra,
            eligible=elig_focal, eligible_extra=elig_extra)
        refine_on = bool(cam_refine.any())
        if not refine_on:
            cam_refine = None
        prob = ba.make_problem(arrays, max_track_len=self.opts.max_track_len,
                               const_image=const, cam_refine=cam_refine,
                               reuse_shapes=True)
        # max_iterations rides as a TRACED argument so local BA (15) and
        # global BA (40) of the same problem shapes share one executable
        opts = ba.BAOptions(loss="cauchy", loss_scale=1.0,
                            refine_focal=refine_on and
                            self.opts.ba_refine_focal,
                            refine_principal=refine_on and
                            self.opts.ba_refine_principal,
                            refine_extra=refine_on and
                            self.opts.ba_refine_extra,
                            pinhole_only=ba.all_pinhole(arrays))
        prob, stats = _jit_ba_solve(prob, max_iterations, opts)
        # write back — ONE transfer for all outputs (separate np.asarray
        # fetches cost one ~30 ms tunnel round trip each)
        q, t, X, newp_all = jax.device_get(
            (prob.image_qvec, prob.image_tvec, prob.points,
             prob.cam_params))
        for k, i in enumerate(img_ids):
            self.rec.images[i].qvec = q[k]
            self.rec.images[i].tvec = t[k]
        for k, p in enumerate(pt_ids):
            if p in self.rec.points3D:
                self.rec.points3D[p].xyz = X[k]
        if refine_on:
            newp = newp_all
            for k, c in enumerate(cam_ids):
                cam = self.rec.cameras[c]
                n = len(cam.params)
                self.rec.cameras[c] = cam._replace(
                    params=tuple(float(v) for v in newp[k, :n]))

    def _local_refine(self, image_ids: list) -> None:
        """Per-round local refinement: Complete/Merge over the new
        images' points, local BA around them, then the global-BA growth
        check (ref :563 iterative local refinement + triangulator
        Complete/Merge; batch mode passes several images at once)."""
        local_pts = [int(p) for i in image_ids
                     for p in self.rec.images[i].point3D_ids if p >= 0]
        self.complete_tracks(local_pts)
        self.merge_tracks()
        self.adjust_local_bundle(image_ids)
        if self.needs_global_ba():
            # iterative global refinement (ref :658):
            # retriangulate + complete + merge, then BA
            self.retriangulate()
            self.complete_tracks()
            self.merge_tracks(set(self.rec.points3D.keys()))
            self.adjust_global_bundle()
            self.filter_points()

    def adjust_local_bundle(self, image_ids):
        """BA over the most-connected registered neighbors of the given
        image(s) (ref :563; batch mode refines one bundle around the
        whole round's new registrations)."""
        if isinstance(image_ids, (int, np.integer)):
            image_ids = [int(image_ids)]
        new = list(dict.fromkeys(int(i) for i in image_ids))
        # connectivity = shared 3D points with ANY of the new images
        shared: dict[int, int] = {}
        for image_id in new:
            im = self.rec.images[image_id]
            for pid in im.point3D_ids:
                if pid < 0 or int(pid) not in self.rec.points3D:
                    continue
                for (j, _) in self.rec.points3D[int(pid)].track:
                    if j not in new:
                        shared[j] = shared.get(j, 0) + 1
        budget = max(self.opts.local_ba_num_images - len(new),
                     len(new))
        local = sorted(shared, key=lambda j: -shared[j])[:budget] + new
        # anchor: all *other* registered images stay fixed implicitly by
        # fixing the two most-connected local images
        const = set(local[:2]) - set(new)
        if not const:
            const = set(local[:1])
        self._run_ba(local, self.opts.ba_local_max_iterations, const)

    def adjust_global_bundle(self):
        reg = self.rec.reg_image_ids
        if len(reg) < 2:
            return
        # one pinned pose; scale rides on LM damping (see _run_ba gauge
        # note — pinning two full poses froze init-pair relative pose)
        const = set(reg[:1])
        self._run_ba(reg, self.opts.ba_global_max_iterations, const)
        # drop images whose (refined) camera went degenerate (ref
        # controller filter loop -> Reconstruction::FilterImages;
        # round-2 gap: the filter existed but was never called)
        self.rec.filter_images()
        self._num_reg_at_last_global_ba = len(reg)
        self._num_pts_at_last_global_ba = self.rec.num_points3D()

    def needs_global_ba(self) -> bool:
        growth_i = self.rec.num_reg_images() / max(
            self._num_reg_at_last_global_ba, 1)
        growth_p = self.rec.num_points3D() / max(
            self._num_pts_at_last_global_ba, 1)
        return (growth_i > self.opts.ba_global_images_ratio
                or growth_p > self.opts.ba_global_points_ratio)

    # ------------------------------------------------- filtering
    def filter_points(self) -> int:
        """Drop observations/points with large error or tiny angle
        (ref FilterPoints -> Reconstruction::FilterPoints3D).

        Fully vectorized on host: one pass builds flat per-observation
        arrays; only the (few) offending observations touch dict state.
        """
        pids = list(self.rec.points3D.keys())
        if not pids:
            return 0
        # precompute per-image pose / calib
        img_ids = self.rec.reg_image_ids
        img_index = {i: k for k, i in enumerate(img_ids)}
        R_all = rops.quat_to_rotmat_np(
            np.stack([self.rec.images[i].qvec for i in img_ids]))
        t_all = np.stack([self.rec.images[i].tvec for i in img_ids])
        C_all = -np.einsum("nij,ni->nj", R_all, t_all)
        foc = np.array([self._focal(i) for i in img_ids])

        obs_pid, obs_img, obs_kp = [], [], []
        pt_index = {}
        X_list = []
        for pid in pids:
            pt = self.rec.points3D[pid]
            pt_index[pid] = len(X_list)
            X_list.append(pt.xyz)
            for (i, kp) in pt.track:
                obs_pid.append(pid)
                obs_img.append(img_index[i])
                obs_kp.append(kp)
        X = np.stack(X_list)
        oi = np.array(obs_img)
        okp = np.array(obs_kp)
        op = np.array([pt_index[p] for p in obs_pid])
        Xc = np.einsum("nij,nj->ni", R_all[oi], X[op]) + t_all[oi]
        # normalize observed keypoints grouped by image (vectorized; the
        # per-observation loop was quadratic-ish at scale)
        uv_obs = np.zeros((len(oi), 2))
        for k in np.unique(oi):
            rows = np.nonzero(oi == k)[0]
            img_id = img_ids[k]
            uv_obs[rows] = self._normalize(
                img_id, self.rec.images[img_id].xys[okp[rows]])
        z = Xc[:, 2]
        behind = z < 1e-4
        zs = np.where(np.abs(z) < 1e-12, 1e-12, z)
        err = np.linalg.norm(Xc[:, :2] / zs[:, None] - uv_obs, axis=1) \
            * foc[oi]
        bad = behind | (err > self.opts.filter_max_reproj_error_px)

        removed = 0
        for n in np.nonzero(bad)[0]:
            pid = obs_pid[n]
            if pid in self.rec.points3D:
                i = img_ids[obs_img[n]]
                kp = obs_kp[n]
                # observation may already be gone via point deletion
                if (i, kp) in self.rec.points3D[pid].track or \
                        any(t == (i, kp) for t in self.rec.points3D[pid].track):
                    self.rec.delete_observation(pid, i, kp)
        removed += sum(1 for p in pids if p not in self.rec.points3D)

        # angle filter: max pairwise angle per surviving track (vectorized
        # over padded track blocks)
        alive = [p for p in pids if p in self.rec.points3D]
        if alive:
            T = max(len(self.rec.points3D[p].track) for p in alive)
            P = len(alive)
            dirs = np.zeros((P, T, 3))
            dmask = np.zeros((P, T), bool)
            for a, pid in enumerate(alive):
                pt = self.rec.points3D[pid]
                for b, (i, _) in enumerate(pt.track):
                    dirs[a, b] = C_all[img_index[i]] - pt.xyz
                    dmask[a, b] = True
            norm = np.linalg.norm(dirs, axis=-1)
            dn = dirs / np.where(norm < 1e-12, 1.0, norm)[..., None]
            # (chunk, T, T) pairwise cosines in bounded chunks — the full
            # (P, T, T) tensor is a memory wall at 100k+ points
            min_cos = np.ones(P)
            chunk = max(1, (1 << 22) // max(T * T, 1))
            for s in range(0, P, chunk):
                e = min(s + chunk, P)
                cos = np.einsum("ptk,psk->pts", dn[s:e], dn[s:e])
                pairm = dmask[s:e, :, None] & dmask[s:e, None, :]
                min_cos[s:e] = np.where(pairm, cos, 1.0).min(axis=(1, 2))
            max_ang = np.degrees(np.arccos(np.clip(min_cos, -1, 1)))
            for a in np.nonzero(
                    max_ang < self.opts.filter_min_tri_angle_deg)[0]:
                self.rec.delete_point3D(alive[a])
                removed += 1

        # refresh per-point mean errors for survivors
        ok = ~bad
        for n in np.nonzero(ok)[0]:
            pid = obs_pid[n]
            pt = self.rec.points3D.get(pid)
            if pt is not None and pt.error < 0:
                pt.error = 0.0
        sums: dict = {}
        cnts: dict = {}
        for n in np.nonzero(ok)[0]:
            pid = obs_pid[n]
            if pid in self.rec.points3D:
                sums[pid] = sums.get(pid, 0.0) + err[n]
                cnts[pid] = cnts.get(pid, 0) + 1
        for pid, s in sums.items():
            self.rec.points3D[pid].error = s / cnts[pid]
        return removed

    def _maybe_snapshot(self) -> None:
        """Write a model snapshot every snapshot_images_freq registered
        images (ref WriteSnapshot, incremental_mapper_controller.cc:
        730-736)."""
        if not self.opts.snapshot_path or not self.opts.snapshot_images_freq:
            return
        n = self.rec.num_reg_images()
        last = self._last_snapshot_at
        if n - last < self.opts.snapshot_images_freq:
            return
        self._last_snapshot_at = n
        import os

        from dagsfm_tpu.scene import io as scene_io
        out = os.path.join(self.opts.snapshot_path, f"snapshot_{n:06d}")
        os.makedirs(out, exist_ok=True)
        scene_io.write_model_bin(self.rec, out)

    # ------------------------------------------------- main loop
    def _reset_model(self) -> None:
        """Tear the current model down to nothing (for init-pair retry).

        Also restores camera intrinsics to their pre-trial values: the
        failed trial's adjust_global_bundle refines distortion (and
        focal for no-prior cameras) for SHARED camera records, so a
        poisoned bootstrap would otherwise leak corrupted intrinsics
        into later trials and the final model. Registration-failure
        counters reset too — they described the torn-down model."""
        for pid in list(self.rec.points3D):
            self.rec.delete_point3D(pid)
        for i in list(self.rec.reg_image_ids):
            self.rec.deregister_image(i)
        if self._cam_snapshot is not None:
            self.rec.cameras.clear()
            self.rec.cameras.update(self._cam_snapshot)
        self._failed_regs = {}
        self._num_reg_at_last_global_ba = 0
        self._num_pts_at_last_global_ba = 0

    def reconstruct(self, callback=None) -> Reconstruction:
        """Full incremental pipeline (ref controller Reconstruct loop).

        Like the reference (init_num_trials=200,
        incremental_mapper_controller.h + FindInitialImagePair retry
        loop), a bootstrap whose model never grows past the initial
        pair is torn down and reconstruction restarts from the NEXT
        candidate init pair — a weak first pair (few triangulated
        points shared with any third view) must not strand the whole
        cluster at 2 registered images.
        """
        last_pair = None
        # pre-trial intrinsics snapshot (Camera records are immutable
        # NamedTuples, so a shallow dict copy suffices) for _reset_model
        self._cam_snapshot = dict(self.rec.cameras)
        pair = self.find_initial_pair()   # commits the pair's 2-view model
        for trial in range(self.opts.init_num_trials):
            if pair is None:
                break
            last_pair = pair
            self._bootstrap_and_grow(pair, callback)
            if self.rec.num_reg_images() > 2:
                break
            if trial + 1 >= self.opts.init_num_trials:
                break  # out of trials: keep this 2-view model
            self._reset_model()
            pair = self.find_initial_pair()
        if self.rec.num_reg_images() < 2 and last_pair is not None:
            # every alternative failed and the last teardown left the
            # model empty: re-establish the best 2-view model we had
            # rather than returning nothing
            self._tried_init_pairs.discard(last_pair)
            if self.find_initial_pair() is not None:
                self._bootstrap_and_grow(last_pair, callback)
        if self.rec.num_reg_images() < 2:
            return self.rec
        self.retriangulate()
        self.complete_tracks()
        self.merge_tracks(set(self.rec.points3D.keys()))
        self.adjust_global_bundle()
        self.filter_points()
        self.adjust_global_bundle()
        return self.rec

    def _count_2d3d(self, image_id: int) -> int:
        """Host-only count of distinct keypoints of `image_id` with a
        2D-3D correspondence into the current model."""
        reg = set(self.rec.reg_image_ids)
        kps = set()
        for kp, j, kj in self.graph.correspondences_of_image(
                image_id, others=reg):
            if self.rec.images[int(j)].point3D_ids[int(kj)] >= 0:
                kps.add(int(kp))
        return len(kps)

    def _bootstrap_viable(self) -> bool:
        """Cheap post-bootstrap gate: SOME unregistered image must have
        enough 2D-3D support to possibly register — otherwise this init
        pair strands the model at 2 images and a retry should not pay
        for a full (doomed) growth attempt + registration RANSACs."""
        need = self.opts.abs_pose_min_num_inliers
        for image_id in self.find_next_images()[:10]:
            if self._count_2d3d(image_id) >= need:
                return True
        return False

    def _bootstrap_and_grow(self, pair, callback=None) -> None:
        i0, j0 = pair
        self.triangulate_image(i0)
        self.triangulate_image(j0)
        self.adjust_global_bundle()
        self.filter_points()
        if self.rec.num_points3D() and not self._bootstrap_viable():
            return  # retry loop tears down and tries the next init pair
        # snapshot counter starts at the post-init registration count, so
        # the init pair does not count toward snapshot_images_freq (ref
        # incremental_mapper_controller.cc:672); also resets across
        # repeated reconstruct() calls on the same mapper
        self._last_snapshot_at = self.rec.num_reg_images()

        strict = self.opts.registration_mode == "strict"
        per_round = 1 if strict else 5
        stall = 0
        while stall < 2:
            nxt = self.find_next_images()
            if not nxt:
                break
            progressed = False
            new_imgs = []
            # batch mode: register up to 5 of the ranked candidates per
            # round (the per-round re-rank was the 500+-image scaling
            # wall); strict mode re-ranks after every registration like
            # the reference
            for image_id in nxt[:per_round]:
                if not self.register_next_image(image_id):
                    continue
                self.triangulate_image(image_id)
                new_imgs.append(image_id)
                progressed = True
                if strict:
                    self._local_refine([image_id])
                self._maybe_snapshot()
                if callback is not None:
                    callback(self)
            if not strict and new_imgs:
                # batch mode amortizes the per-registration refinement:
                # ONE complete/merge/local-BA over the round's newly
                # registered images (the per-image variant spent >50%
                # of warm wall-clock re-running these five times per
                # round; strict mode keeps exact reference cadence)
                self._local_refine(new_imgs)
            stall = 0 if progressed else stall + 1


# ---------------------------------------------------------------------------
# jitted helpers (module-level so compile cache is shared across mappers)
# ---------------------------------------------------------------------------

import functools


@jax.jit
def _jit_cam_from_img(model_id, params, xys):
    """Jitted pixel->normalized-cam undistortion (bucketized by caller;
    the eager call re-traced its iterative-inverse loop per shape)."""
    return cm.cam_from_img(model_id, params, xys)


@jax.jit
def _refine_pose_q(R, t, X, uv, inliers):
    """Jitted pose refinement returning (quat, t) — ONE device dispatch
    per registration (the unjitted call re-traced its internal scan per
    call: ~1 recompile + dozens of eager op round-trips each time)."""
    R2, t2 = ap.refine_pose(R, t, X, uv, inliers)
    return rops.rotmat_to_quat(R2), t2


@functools.partial(jax.jit, static_argnames=("num_hyps",))
def _register_pose(key, X, uv, mask, thr, num_hyps):
    """Fused registration estimate: P3P-LORANSAC + Cauchy-IRLS pose
    refinement + quat conversion in one program. Returns
    (qvec, tvec, inliers, num_inliers) — fetched together in one host
    round trip."""
    res = _ransac_p3p(key, X, uv, mask, thr, num_hyps)
    Rt = res.model
    R2, t2 = ap.refine_pose(Rt[:, :3], Rt[:, 3], X, uv, res.inliers)
    return rops.rotmat_to_quat(R2), t2, res.inliers, res.num_inliers


@jax.jit
def _init_geometry(model, x1p, x2p, inliers):
    """Fused initial-pair geometry: pose from essential + two-view
    triangulation + triangulation angles + cheirality depths, one
    device dispatch (was 4+ eager calls with re-traced closures)."""
    from dagsfm_tpu.ops.projection import triangulation_angles
    R, t, n_front = epi.pose_from_essential(model, x1p, x2p, inliers)
    N = x1p.shape[0]
    dtype = x1p.dtype
    q1 = jnp.zeros((N, 4), dtype).at[:, 0].set(1.0)
    t1 = jnp.zeros((N, 3), dtype)
    q2 = jnp.broadcast_to(rops.rotmat_to_quat(R), (N, 4))
    t2 = jnp.broadcast_to(t, (N, 3))
    X = tri.triangulate_two_view(q1, t1, q2, t2, x1p, x2p)
    ang = triangulation_angles(q1, t1, q2, t2, X)
    z1 = X[:, 2]
    z2 = (X @ R.T + t)[:, 2]
    return R, t, n_front, X, jnp.degrees(ang), z1, z2


@functools.partial(jax.jit, static_argnames=("num_hyps",))
def _ransac_essential(key, x1, x2, mask, thr, num_hyps):
    return rnsc.ransac(
        key, solver=epi.essential_5pt, residual_fn=epi.sampson_error,
        data=(x1, x2), mask=mask, sample_size=5, threshold=thr,
        num_hypotheses=num_hyps,
        refit=lambda a, b, inl: epi.essential_8pt(a, b, mask=inl)[0][0])


@functools.partial(jax.jit, static_argnames=("num_hyps",))
def _ransac_p3p(key, X, uv, mask, thr, num_hyps):
    def solver(Xs, uvs):
        Rs, ts, ok = ap.p3p(Xs, uvs)
        return jnp.concatenate([Rs, ts[:, :, None]], axis=-1), ok

    def residual(M, Xd, uvd):
        return ap.pose_reproj_error(M[:, :3], M[:, 3], Xd, uvd)

    def refit(Xd, uvd, inl):
        R, t, _ = ap.epnp(Xd, uvd, mask=inl)
        return jnp.concatenate([R, t[:, None]], axis=-1)

    return rnsc.ransac(key, solver=solver, residual_fn=residual,
                       data=(X, uv), mask=mask, sample_size=3, threshold=thr,
                       num_hypotheses=num_hyps, refit=refit)


@functools.partial(jax.jit, static_argnames=("num_hyps", "num_samples"))
def _ransac_p3p_focal(key, X, centered, mask, focal0, thr_px, num_hyps,
                      num_samples=15):
    """P3P RANSAC with focal-length grid search (ref estimators/pose.cc:79
    EstimateAbsolutePose with estimate_focal_length=true: LORANSAC+P3P at
    log-spaced focal factors, keep the focal with the most inliers).

    centered: (N, 2) pixel keypoints with the principal point removed.
    Returns (model (3,4), inliers (N,), num_inliers, focal_factor) — the
    whole grid runs as one vmapped device program.
    """
    # ref focal_length_ratio_min/max = 0.2 / 5 over 30 samples; 15
    # log-spaced samples cover the same range at half the solves
    factors = jnp.exp(jnp.linspace(jnp.log(0.2), jnp.log(5.0),
                                   num_samples))

    def run(f):
        uv = centered / (focal0 * f)
        thr = (thr_px / (focal0 * f)) ** 2
        res = rnsc.ransac(
            key,
            solver=lambda Xs, uvs: (lambda R, t, ok: (
                jnp.concatenate([R, t[:, :, None]], axis=-1), ok))(
                    *ap.p3p(Xs, uvs)),
            residual_fn=lambda M, Xd, uvd: ap.pose_reproj_error(
                M[:, :3], M[:, 3], Xd, uvd),
            data=(X, uv), mask=mask, sample_size=3, threshold=thr,
            num_hypotheses=num_hyps,
            refit=lambda Xd, uvd, inl: (lambda R, t, _: jnp.concatenate(
                [R, t[:, None]], axis=-1))(*ap.epnp(Xd, uvd, mask=inl)))
        return res.model, res.inliers, res.num_inliers

    models, inls, nums = jax.vmap(run)(factors)
    best = jnp.argmax(nums)
    return models[best], inls[best], nums[best], factors[best]


@jax.jit
def _triangulate_checked(q1, t1, q2, t2, x1, x2):
    """Two-view triangulation + quality stats, one fused call.

    Returns (N, 8): xyz, tri_angle(rad), reproj_err1², reproj_err2²
    (normalized coords), depth1, depth2.
    """
    from dagsfm_tpu.ops.projection import triangulation_angles
    X = tri.triangulate_two_view(q1, t1, q2, t2, x1, x2)
    ang = triangulation_angles(q1, t1, q2, t2, X)
    Xc1 = rops.quat_rotate(q1, X) + t1
    Xc2 = rops.quat_rotate(q2, X) + t2
    z1 = Xc1[:, 2]
    z2 = Xc2[:, 2]
    zs1 = jnp.where(jnp.abs(z1) < 1e-12, 1e-12, z1)
    zs2 = jnp.where(jnp.abs(z2) < 1e-12, 1e-12, z2)
    e1 = jnp.sum((Xc1[:, :2] / zs1[:, None] - x1) ** 2, -1)
    e2 = jnp.sum((Xc2[:, :2] / zs2[:, None] - x2) ** 2, -1)
    return jnp.concatenate([X, ang[:, None], e1[:, None], e2[:, None],
                            z1[:, None], z2[:, None]], axis=-1)


@functools.partial(jax.jit, static_argnames=("opts",))
def _jit_ba_solve(prob, max_iters, opts):
    return ba.solve(prob, opts, max_iters=max_iters)


def _export_sub_arrays(rec: Reconstruction, image_ids: list, point_ids: list):
    """SceneArrays for a subset of images/points, bucket-padded."""
    from dagsfm_tpu.scene.reconstruction import SceneArrays
    img_set = set(image_ids)
    cam_ids = sorted({rec.images[i].camera_id for i in image_ids})
    cam_index = {c: k for k, c in enumerate(cam_ids)}
    img_index = {i: k for k, i in enumerate(image_ids)}

    # camera count is ALSO a jit shape key (cam_params is (C, ...)): with
    # one camera per image, an unpadded C forced a recompile on nearly
    # every global BA of an incremental run. Padded cameras are inert:
    # no observation references them, their cam_refine rows are zero,
    # and the joint solve pins masked blocks via its freevec identity.
    C = _bucket(len(cam_ids), 4)
    I = _bucket(len(image_ids), 8)   # bucket image count to limit recompiles
    cam_model_id = np.zeros(C, np.int32)
    cam_params = np.zeros((C, cm.MAX_CAMERA_PARAMS))
    cam_params[:, 0] = 1.0  # benign focal for pad rows
    for k, c in enumerate(cam_ids):
        cam_model_id[k] = rec.cameras[c].model_id
        p = np.asarray(rec.cameras[c].params)
        cam_params[k, : len(p)] = p
    image_qvec = np.zeros((I, 4))
    image_qvec[:, 0] = 1.0
    image_tvec = np.zeros((I, 3))
    image_camidx = np.zeros(I, np.int32)
    for k, i in enumerate(image_ids):
        image_qvec[k] = rec.images[i].qvec
        image_tvec[k] = rec.images[i].tvec
        image_camidx[k] = cam_index[rec.images[i].camera_id]
    image_mask = np.zeros(I, bool)
    image_mask[: len(image_ids)] = True

    pts, pt_keep = [], []
    obs = []
    for p in point_ids:
        pt = rec.points3D.get(p)
        if pt is None:
            continue
        track = [(i, kp) for (i, kp) in pt.track if i in img_set]
        if len(track) < 2:
            continue
        pidx = len(pts)
        pts.append(pt.xyz)
        pt_keep.append(p)
        for (i, kp) in track:
            obs.append((img_index[i], pidx, rec.images[i].xys[kp]))
    if len(pts) == 0 or len(obs) == 0:
        return None, None
    P = _bucket(len(pts), 64, 4)
    N = _bucket(len(obs), 256, 4)
    points_xyz = _pad_to(np.stack(pts), P)
    points_mask = np.zeros(P, bool)
    points_mask[: len(pts)] = True
    obs_image = np.zeros(N, np.int32)
    obs_point = np.zeros(N, np.int32)
    obs_xy = np.zeros((N, 2))
    obs_mask = np.zeros(N, bool)
    for n, (ii, pp, xy) in enumerate(obs):
        obs_image[n], obs_point[n], obs_xy[n] = ii, pp, xy
        obs_mask[n] = True

    arrays = SceneArrays(cam_model_id, cam_params, image_qvec, image_tvec,
                         image_camidx, image_mask, points_xyz, points_mask,
                         obs_image, obs_point, obs_xy, obs_mask)
    return arrays, (cam_ids, image_ids, pt_keep)
