"""Reconstruction: the scene container (cameras + images + 3D points + tracks).

TPU-native counterpart of the reference's `Reconstruction`
(/root/reference/src/base/reconstruction.h:63). Two representations:

  * `Reconstruction` — host-side, numpy + dicts, supports the dynamic
    operations incremental SfM needs (register image, add/merge/delete
    points, Sim(3) transform, merge of two reconstructions). This replaces
    the reference's pointer-graph with flat arrays.
  * `SceneArrays` — frozen, padded, device-ready pytree used by the jitted
    kernels (BA, triangulation, pose estimation). Produced by
    `Reconstruction.to_arrays()` and consumed back via `update_from_arrays`.

Design note: the reference interleaves storage and compute; here storage is
host numpy (cheap, dynamic) and compute is pure functions over fixed-shape
arrays — the split that keeps XLA recompilation away from the dynamic
incremental loop.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import numpy as np

from dagsfm_tpu.scene import cameras as cm


class SceneArrays(NamedTuple):
    """Device-ready view of a reconstruction (fixed shapes, padded).

    Fields:
      cam_model_id: (C,) int32
      cam_params:   (C, MAX_CAMERA_PARAMS) float
      image_qvec:   (I, 4) float   world->cam rotation (wxyz)
      image_tvec:   (I, 3) float
      image_camidx: (I,)  int32    index into cameras
      image_mask:   (I,)  bool     registered?
      points_xyz:   (P, 3) float
      points_mask:  (P,)  bool     valid?
      obs_image:    (N,)  int32    observation -> image index
      obs_point:    (N,)  int32    observation -> 3D point index
      obs_xy:       (N, 2) float   observed pixel
      obs_mask:     (N,)  bool
    """
    cam_model_id: np.ndarray
    cam_params: np.ndarray
    image_qvec: np.ndarray
    image_tvec: np.ndarray
    image_camidx: np.ndarray
    image_mask: np.ndarray
    points_xyz: np.ndarray
    points_mask: np.ndarray
    obs_image: np.ndarray
    obs_point: np.ndarray
    obs_xy: np.ndarray
    obs_mask: np.ndarray


@dataclasses.dataclass
class ImageRecord:
    """Host record per image (ref: base/image.h)."""
    image_id: int
    name: str
    camera_id: int
    qvec: np.ndarray  # (4,) wxyz, world->cam
    tvec: np.ndarray  # (3,)
    xys: np.ndarray   # (K, 2) keypoints
    point3D_ids: np.ndarray  # (K,) int64, -1 = not triangulated
    registered: bool = False
    cluster_id: int = -1  # DAGSfM addition (ref: base/image.h:222)

    def num_points3D(self) -> int:
        return int(np.sum(self.point3D_ids >= 0))


@dataclasses.dataclass
class Point3DRecord:
    """Host record per 3D point (ref: base/point3d.h + track.h)."""
    xyz: np.ndarray            # (3,)
    color: np.ndarray          # (3,) uint8
    error: float
    track: list                # list[(image_id, point2D_idx)]


class Reconstruction:
    """Host-side scene container with COLMAP-equivalent semantics."""

    def __init__(self):
        self.cameras: dict[int, cm.Camera] = {}
        self.images: dict[int, ImageRecord] = {}
        self.points3D: dict[int, Point3DRecord] = {}
        self._next_point3D_id = 1

    # ------------------------------------------------------------------ adds
    def add_camera(self, camera: cm.Camera) -> None:
        assert camera.camera_id not in self.cameras
        self.cameras[camera.camera_id] = camera

    def add_image(self, image: ImageRecord) -> None:
        assert image.image_id not in self.images
        self.images[image.image_id] = image

    def add_point3D(self, xyz, track, color=None, error=-1.0) -> int:
        pid = self._next_point3D_id
        self._next_point3D_id += 1
        color = np.zeros(3, np.uint8) if color is None else np.asarray(color, np.uint8)
        self.points3D[pid] = Point3DRecord(np.asarray(xyz, np.float64), color,
                                           float(error), list(track))
        for image_id, p2d_idx in track:
            self.images[image_id].point3D_ids[p2d_idx] = pid
        return pid

    def add_observation(self, point3D_id: int, image_id: int, p2d_idx: int) -> None:
        self.points3D[point3D_id].track.append((image_id, p2d_idx))
        self.images[image_id].point3D_ids[p2d_idx] = point3D_id

    def delete_point3D(self, point3D_id: int) -> None:
        for image_id, p2d_idx in self.points3D[point3D_id].track:
            img = self.images.get(image_id)
            if img is not None and img.point3D_ids[p2d_idx] == point3D_id:
                img.point3D_ids[p2d_idx] = -1
        del self.points3D[point3D_id]

    def delete_observation(self, point3D_id: int, image_id: int, p2d_idx: int) -> None:
        pt = self.points3D[point3D_id]
        pt.track = [(i, k) for (i, k) in pt.track if not (i == image_id and k == p2d_idx)]
        self.images[image_id].point3D_ids[p2d_idx] = -1
        if len(pt.track) < 2:
            self.delete_point3D(point3D_id)

    def merge_points3D(self, pid1: int, pid2: int) -> int:
        """Merge pid2 into pid1 with track-length-weighted position."""
        p1, p2 = self.points3D[pid1], self.points3D[pid2]
        n1, n2 = len(p1.track), len(p2.track)
        xyz = (p1.xyz * n1 + p2.xyz * n2) / (n1 + n2)
        color = ((p1.color.astype(np.int64) * n1 + p2.color.astype(np.int64) * n2)
                 // (n1 + n2)).astype(np.uint8)
        track = p1.track + p2.track
        for image_id, p2d_idx in p2.track:
            self.images[image_id].point3D_ids[p2d_idx] = pid1
        p1.xyz, p1.color, p1.track = xyz, color, track
        del self.points3D[pid2]
        return pid1

    # ------------------------------------------------------------ registration
    def register_image(self, image_id: int) -> None:
        self.images[image_id].registered = True

    def deregister_image(self, image_id: int) -> None:
        img = self.images[image_id]
        for p2d_idx, pid in enumerate(img.point3D_ids):
            if pid >= 0:
                self.delete_observation(int(pid), image_id, p2d_idx)
        img.registered = False

    def filter_images(self, min_focal_length_ratio: float = 0.1,
                      max_focal_length_ratio: float = 10.0,
                      max_extra_param: float = 100.0) -> list:
        """Deregister images whose camera has bogus intrinsics (ref
        Reconstruction::FilterImages, base/reconstruction.cc: focal/max-dim
        ratio out of bounds, or any distortion param > max_extra_param).
        Returns the deregistered image ids."""
        bad_cams = set()
        for cid, cam in self.cameras.items():
            f = cam.focal()
            f = float(np.mean(f)) if np.ndim(f) else float(f)
            ratio = f / max(cam.width, cam.height)
            # host table lookup — the former eager jnp._is_single_focal
            # call re-entered the (remote) compile cache every time the
            # camera params constant changed: ~1.2 s per filter_images
            # call on the tunnel, ~17% of total mapping time
            n_intr = 3 if cam.model_id in cm._SINGLE_FOCAL else 4
            extra = np.abs(np.asarray(cam.params[n_intr:], float))
            if (ratio < min_focal_length_ratio
                    or ratio > max_focal_length_ratio
                    or (extra.size and extra.max() > max_extra_param)):
                bad_cams.add(cid)
        filtered = [i for i in self.reg_image_ids
                    if self.images[i].camera_id in bad_cams]
        for iid in filtered:
            self.deregister_image(iid)
        return filtered

    def extract_colors(self, images: dict) -> int:
        """Set 3D point colors by averaging the bilinear image sample over
        all observing images (ref Reconstruction::ExtractColorsForAllImages,
        base/reconstruction.h:310-324). ``images`` maps image_id ->
        (H, W) grayscale or (H, W, 3) RGB float array in [0, 1].
        Returns the number of colored points."""
        acc = {pid: np.zeros(3) for pid in self.points3D}
        cnt = {pid: 0 for pid in self.points3D}
        for iid, img in images.items():
            if iid not in self.images:
                continue
            arr = np.asarray(img, np.float64)
            if arr.ndim == 2:
                arr = np.repeat(arr[:, :, None], 3, axis=2)
            h, w = arr.shape[:2]
            im = self.images[iid]
            for p2d_idx, pid in enumerate(im.point3D_ids):
                if pid < 0 or int(pid) not in acc:
                    continue
                x, y = im.xys[p2d_idx]
                if not (0 <= x <= w - 1 and 0 <= y <= h - 1):
                    continue
                x0, y0 = int(np.floor(min(x, w - 2))), \
                    int(np.floor(min(y, h - 2)))
                fx, fy = x - x0, y - y0
                c = ((1 - fx) * (1 - fy) * arr[y0, x0]
                     + fx * (1 - fy) * arr[y0, x0 + 1]
                     + (1 - fx) * fy * arr[y0 + 1, x0]
                     + fx * fy * arr[y0 + 1, x0 + 1])
                acc[int(pid)] += c
                cnt[int(pid)] += 1
        n = 0
        for pid, k in cnt.items():
            if k > 0:
                self.points3D[pid].color = np.clip(
                    acc[pid] / k * 255.0, 0, 255).astype(np.uint8)
                n += 1
        return n

    @property
    def reg_image_ids(self) -> list:
        return [i for i, im in self.images.items() if im.registered]

    def num_reg_images(self) -> int:
        return len(self.reg_image_ids)

    def num_points3D(self) -> int:
        return len(self.points3D)

    def find_common_reg_image_ids(self, other: "Reconstruction") -> list:
        """Shared registered image names (ref: reconstruction FindCommonRegImageIds)."""
        mine = {self.images[i].name: i for i in self.reg_image_ids}
        out = []
        for j in other.reg_image_ids:
            name = other.images[j].name
            if name in mine:
                out.append((mine[name], j))
        return out

    # ------------------------------------------------------------- geometry
    def compute_mean_reprojection_error(self) -> float:
        errs, w = 0.0, 0
        for pt in self.points3D.values():
            if pt.error >= 0:
                errs += pt.error * len(pt.track)
                w += len(pt.track)
        return errs / max(w, 1)

    def transform(self, scale: float, R: np.ndarray, t: np.ndarray) -> None:
        """Apply Sim(3): x -> scale * R @ x + t to points & camera centers."""
        for pt in self.points3D.values():
            pt.xyz = scale * R @ pt.xyz + t
        for img in self.images.values():
            if not img.registered:
                continue
            from dagsfm_tpu.ops import rotations as rops
            import jax.numpy as jnp
            Rcw = np.asarray(rops.quat_to_rotmat(jnp.asarray(img.qvec)))
            # new world->cam rotation: Rcw @ R^T; center transforms like a point
            C = -Rcw.T @ img.tvec
            C_new = scale * R @ C + t
            R_new = Rcw @ R.T
            img.qvec = np.asarray(rops.rotmat_to_quat(jnp.asarray(R_new)))
            img.tvec = -R_new @ C_new

    def merge(self, other: "Reconstruction", scale: float, R: np.ndarray,
              t: np.ndarray, max_reproj_error: float = 8.0) -> None:
        """Fold `other` (transformed by the given Sim(3)) into self.

        Ref: Reconstruction::Merge (reconstruction.h:202) — used by the
        cluster aligner. Common images keep self's pose; other's new images
        and points are imported; duplicate observations of common images
        merge tracks.
        """
        import copy
        other = copy.deepcopy(other)
        other.transform(scale, R, t)

        name_to_self = {im.name: i for i, im in self.images.items()}
        common_other, new_other = [], []
        for j, im in other.images.items():
            (common_other if im.name in name_to_self else new_other).append(j)

        for cam_id, cam in other.cameras.items():
            if cam_id not in self.cameras:
                self.cameras[cam_id] = cam

        id_map = {}
        for j in new_other:
            im = other.images[j]
            # keep original (database-global) image id when free
            new_id = j if j not in self.images else \
                max(self.images.keys(), default=0) + 1
            id_map[j] = new_id
            im2 = dataclasses.replace(im, image_id=new_id,
                                      point3D_ids=np.full_like(im.point3D_ids, -1))
            self.images[new_id] = im2
        for j in common_other:
            id_map[j] = name_to_self[other.images[j].name]

        # import points; redirect tracks through id_map, merging duplicates
        for pid, pt in other.points3D.items():
            track = []
            merge_into = None
            for (img_id, k) in pt.track:
                self_img_id = id_map[img_id]
                existing = self.images[self_img_id].point3D_ids[k]
                if img_id in common_other and existing >= 0:
                    merge_into = int(existing)
                elif self.images[self_img_id].point3D_ids[k] < 0:
                    track.append((self_img_id, k))
            if merge_into is not None:
                for (img_id, k) in track:
                    self.add_observation(merge_into, img_id, k)
            elif len(track) >= 2:
                self.add_point3D(pt.xyz, track, pt.color, pt.error)

    # --------------------------------------------------------------- arrays
    def to_arrays(self, max_obs: int | None = None, dtype=np.float64) -> tuple:
        """Export to SceneArrays + index maps (camera/image/point id orders)."""
        cam_ids = sorted(self.cameras)
        img_ids = sorted(self.images)
        pt_ids = sorted(self.points3D)
        cam_index = {c: k for k, c in enumerate(cam_ids)}
        img_index = {i: k for k, i in enumerate(img_ids)}
        pt_index = {p: k for k, p in enumerate(pt_ids)}

        C, I, P = len(cam_ids), len(img_ids), len(pt_ids)
        cam_model_id = np.array([self.cameras[c].model_id for c in cam_ids], np.int32)
        cam_params = np.zeros((C, cm.MAX_CAMERA_PARAMS), dtype)
        for k, c in enumerate(cam_ids):
            p = np.asarray(self.cameras[c].params)
            cam_params[k, : len(p)] = p

        image_qvec = np.stack([self.images[i].qvec for i in img_ids]) if I else np.zeros((0, 4))
        image_tvec = np.stack([self.images[i].tvec for i in img_ids]) if I else np.zeros((0, 3))
        image_camidx = np.array([cam_index[self.images[i].camera_id] for i in img_ids], np.int32)
        image_mask = np.array([self.images[i].registered for i in img_ids], bool)

        points_xyz = (np.stack([self.points3D[p].xyz for p in pt_ids])
                      if P else np.zeros((0, 3)))

        obs = []
        for p in pt_ids:
            for (img_id, k) in self.points3D[p].track:
                if self.images[img_id].registered:
                    obs.append((img_index[img_id], pt_index[p],
                                self.images[img_id].xys[k]))
        N = len(obs)
        pad = max_obs if max_obs is not None else N
        assert pad >= N, (pad, N)
        obs_image = np.zeros(pad, np.int32)
        obs_point = np.zeros(pad, np.int32)
        obs_xy = np.zeros((pad, 2), dtype)
        obs_mask = np.zeros(pad, bool)
        for n, (ii, pp, xy) in enumerate(obs):
            obs_image[n], obs_point[n], obs_xy[n] = ii, pp, xy
            obs_mask[n] = True

        arrays = SceneArrays(
            cam_model_id, cam_params.astype(dtype),
            image_qvec.astype(dtype), image_tvec.astype(dtype),
            image_camidx, image_mask,
            points_xyz.astype(dtype), np.ones(P, bool),
            obs_image, obs_point, obs_xy.astype(dtype), obs_mask,
        )
        return arrays, (cam_ids, img_ids, pt_ids)

    def update_from_arrays(self, arrays: SceneArrays, ids) -> None:
        """Write optimized poses/points/intrinsics back into host records."""
        cam_ids, img_ids, pt_ids = ids
        for k, c in enumerate(cam_ids):
            n = cm.CAMERA_MODEL_NUM_PARAMS[self.cameras[c].model_id]
            self.cameras[c] = self.cameras[c]._replace(
                params=tuple(np.asarray(arrays.cam_params[k][:n]).tolist()))
        for k, i in enumerate(img_ids):
            self.images[i].qvec = np.asarray(arrays.image_qvec[k])
            self.images[i].tvec = np.asarray(arrays.image_tvec[k])
        for k, p in enumerate(pt_ids):
            self.points3D[p].xyz = np.asarray(arrays.points_xyz[k])
