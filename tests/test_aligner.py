"""SfMAligner tests: split a GT scene into overlapping clusters with random
Sim(3) gauges, merge, verify global consistency (ref sfm_aligner flow)."""
import jax.numpy as jnp
import numpy as np
import pytest

from dagsfm_tpu.ops import rotations as rops
from dagsfm_tpu.scene import synthetic
from dagsfm_tpu.sfm.aligner import AlignerOptions, SfMAligner, Sim3


def make_cluster_recs(num_clusters=3, overlap=4, seed=0):
    """GT scene -> per-cluster reconstructions in random Sim3 gauges."""
    spec = synthetic.SyntheticSceneSpec(num_cameras=18, num_points=300,
                                        seed=seed)
    sc = synthetic.generate(spec)
    rec_full = synthetic.to_reconstruction(sc)
    I = spec.num_cameras
    per = I // num_clusters
    rng = np.random.default_rng(seed)
    recs = []
    for c in range(num_clusters):
        lo = c * per
        hi = min(I, (c + 1) * per + overlap)
        ids = list(range(lo + 1, hi + 1))
        sub = _subset_rec(rec_full, ids)
        # random gauge: scale, rotation, translation
        s = rng.uniform(0.5, 2.0)
        aa = rng.normal(0, 0.5, 3)
        R = np.asarray(rops.angleaxis_to_rotmat(jnp.asarray(aa)))
        t = rng.normal(0, 3.0, 3)
        sub.transform(s, R, t)
        recs.append(sub)
    return sc, rec_full, recs


def _subset_rec(rec, image_ids):
    """Copy of rec restricted to image_ids (tracks re-limited)."""
    import copy
    from dagsfm_tpu.scene.reconstruction import Reconstruction
    out = Reconstruction()
    out.cameras = dict(rec.cameras)
    idset = set(image_ids)
    import dataclasses
    for i in image_ids:
        im = rec.images[i]
        out.images[i] = dataclasses.replace(
            im, point3D_ids=np.full_like(im.point3D_ids, -1),
            registered=True)
    for pid, pt in rec.points3D.items():
        track = [(i, k) for (i, k) in pt.track if i in idset]
        if len(track) >= 2:
            out.points3D[pid] = type(pt)(pt.xyz.copy(), pt.color.copy(),
                                         pt.error, track)
            for (i, k) in track:
                out.images[i].point3D_ids[k] = pid
    out._next_point3D_id = max(out.points3D, default=0) + 1
    return out


class TestSim3:
    def test_compose_apply(self):
        rng = np.random.default_rng(0)
        a = Sim3(2.0, np.asarray(rops.angleaxis_to_rotmat(
            jnp.asarray([0.1, 0.2, 0.3]))), rng.normal(0, 1, 3))
        b = Sim3(0.5, np.asarray(rops.angleaxis_to_rotmat(
            jnp.asarray([-0.2, 0.1, 0.4]))), rng.normal(0, 1, 3))
        x = rng.normal(0, 1, (10, 3))
        np.testing.assert_allclose(a.compose(b).apply(x), a.apply(b.apply(x)),
                                   atol=1e-12)
        np.testing.assert_allclose(a.inverse().apply(a.apply(x)), x,
                                   atol=1e-12)


class TestAligner:
    def test_merge_recovers_scene(self):
        sc, rec_full, recs = make_cluster_recs()
        aligner = SfMAligner(recs, AlignerOptions())
        merged = aligner.align()
        # all images registered in the merged model
        assert merged.num_reg_images() == 18
        errs = synthetic.pose_errors(merged, sc)
        assert errs["ate"] < 0.01, errs
        assert errs["rot_err_deg_max"] < 0.1, errs
        # separators recorded
        seps = aligner.separator_image_ids(merged)
        assert len(seps) >= 4

    def test_two_clusters(self):
        sc, rec_full, recs = make_cluster_recs(num_clusters=2, overlap=5,
                                               seed=3)
        merged = SfMAligner(recs).align()
        assert merged.num_reg_images() == 18
        errs = synthetic.pose_errors(merged, sc)
        assert errs["ate"] < 0.01, errs

    def test_disconnected_cluster_ignored(self):
        sc, rec_full, recs = make_cluster_recs(num_clusters=3, overlap=4,
                                               seed=4)
        # a 4th cluster with no shared images
        spec2 = synthetic.SyntheticSceneSpec(num_cameras=6, num_points=80,
                                            seed=99)
        sc2 = synthetic.generate(spec2)
        stray = synthetic.to_reconstruction(sc2)
        # rename its images so nothing matches
        for im in stray.images.values():
            im.name = "stray_" + im.name
        aligner = SfMAligner(recs + [stray])
        merged = aligner.align()
        assert merged.num_reg_images() == 18  # stray not merged
