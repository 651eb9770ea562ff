"""Feature pipeline controller: images -> SIFT -> pairs -> matches -> DB.

TPU-native counterpart of the reference's extraction+matching controllers
(/root/reference/src/feature/extraction.cc SiftFeatureExtractor thread
pipeline + matching.cc SiftFeatureMatcher) plus the database checkpoint
behavior of LoadTwoviewGeometries (distributed_mapper_controller.cpp:
113-147): if the database already holds two-view geometries, extraction
and matching are skipped entirely on re-runs.

The resizer->extractor->writer threads become: batch images on host ->
one jitted SIFT call per batch -> matcher batches -> batched RANSAC
verification -> SQLite writes.
"""

from __future__ import annotations

import dataclasses
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from dagsfm_tpu.features import matching as fm
from dagsfm_tpu.features import retrieval as rt
from dagsfm_tpu.features import sift
from dagsfm_tpu.scene import cameras as cm
from dagsfm_tpu.scene import io as scene_io
from dagsfm_tpu.scene.reconstruction import ImageRecord
from dagsfm_tpu.sfm.correspondence_graph import CorrespondenceGraph
from dagsfm_tpu.sfm.two_view import verify_pairs


class TwoViewRecord:
    """Verified two-view geometry of one pair (ref TwoViewGeometry:
    winning model config + relative pose + inlier matches)."""

    __slots__ = ("R", "t", "inlier_matches", "num_inliers", "config",
                 "E", "F", "H")

    def __init__(self, R, t, inlier_matches, num_inliers, config,
                 E=None, F=None, H=None):
        self.R = R
        self.t = t
        self.inlier_matches = inlier_matches
        self.num_inliers = num_inliers
        self.config = config
        self.E = E
        self.F = F
        self.H = H


@dataclasses.dataclass
class FeaturePipelineOptions:
    sift: sift.SiftOptions = dataclasses.field(default_factory=sift.SiftOptions)
    matching: fm.MatchingOptions = dataclasses.field(
        default_factory=fm.MatchingOptions)
    retrieval: rt.RetrievalOptions = dataclasses.field(
        default_factory=rt.RetrievalOptions)
    pair_mode: str = "exhaustive"   # exhaustive | sequential | retrieval
    #                               # | vocab_tree | global
                                    # | vocab_tree
    # sequential mode extras (ref SequentialMatchingOptions,
    # matching.h:427-448): temporal window + vocab loop closure every
    # loop_detection_period frames (0 = off)
    sequential_overlap: int = 10
    loop_detection_period: int = 0
    loop_detection_num_images: int = 50
    batch_size: int = 8
    min_num_inliers: int = 15       # ref sift.h min_num_inliers
    max_error_px: float = 4.0       # ref sift.h max_error
    num_ransac_hypotheses: int = 256
    # calibrated pairs verify with the essential matrix only (~3x faster
    # verification; loses planar/watermark classification — see
    # TwoViewOptions.essential_only)
    two_view_essential_only: bool = False
    seed: int = 0
    # ref sift.h:116-166 guided_matching: re-match each verified pair
    # under its winning epipolar/homography constraint, recovering
    # matches the ratio test killed
    guided_matching: bool = False
    # vocab_tree pair_mode extras (ref retrieval/visual_index.h +
    # vote_and_verify.cc): Hamming rerank depth and spatial verification
    vocab_tree_rerank: int = 0
    spatial_verification: bool = False


class FeaturePipeline:
    """Extract + match + verify for a set of images.

    images: dict image_id -> (H, W) float32 grayscale array in [0, 1].
    cameras: dict image_id -> Camera (for normalization during
    verification). All images must share HxW per batch (resize upstream).
    """

    def __init__(self, images: dict, cameras: dict,
                 options: FeaturePipelineOptions | None = None,
                 database_path: str | None = None):
        self.images = images
        self.cameras = cameras
        self.opts = options or FeaturePipelineOptions()
        self.database_path = database_path
        self.keypoints: dict = {}
        self.kp_geom: dict = {}     # image_id -> (K, 4) x y scale ori
        self.descriptors: dict = {}
        self.masks: dict = {}
        self.matches: dict = {}
        self.two_view: dict = {}
        self.timings: dict = {}
        self.bank: "fm.DescriptorBank | None" = None   # device-resident

    # ------------------------------------------------------------- extract
    def extract_features(self):
        t0 = time.time()
        ids = sorted(self.images)
        B = self.opts.batch_size
        # max_image_size resize (ref sift.h:44: images larger than the
        # bound are downscaled for extraction; keypoints are mapped back
        # to the original pixel frame)
        H, W = next(iter(self.images.values())).shape
        max_dim = max(H, W)
        bound = self.opts.sift.max_image_size
        scale_back = 1.0
        if bound > 0 and max_dim > bound:
            scale = bound / max_dim
            newH, newW = int(round(H * scale)), int(round(W * scale))
            scale_back = max_dim / bound
        bank_ids, bank_desc, bank_mask = [], [], []
        for s in range(0, len(ids), B):
            chunk = ids[s: s + B]
            real = len(chunk)
            while len(chunk) < B:
                chunk = chunk + [chunk[-1]]
            batch = jnp.asarray(np.stack([self.images[i] for i in chunk]))
            if scale_back != 1.0:
                batch = jax.image.resize(
                    batch, (batch.shape[0], newH, newW), "linear")
            feats = sift.extract(batch, self.opts.sift)
            if self._want_device_bank():
                # keep the device-side copy (bf16) for resident matching
                # — descriptors then never re-cross the host link
                bank_ids.extend(chunk[:real])
                bank_desc.append(
                    feats.descriptor[:real].astype(jnp.bfloat16))
                bank_mask.append(feats.mask[:real])
            xy = np.asarray(feats.xy) * scale_back
            desc = np.asarray(feats.descriptor)
            mask = np.asarray(feats.mask)
            scl = np.asarray(feats.scale) * scale_back
            ori = np.asarray(feats.orientation)
            for k in range(real):
                i = chunk[k]
                self.keypoints[i] = xy[k]
                self.kp_geom[i] = np.concatenate(
                    [xy[k], scl[k][:, None], ori[k][:, None]], axis=1)
                self.descriptors[i] = desc[k]
                self.masks[i] = mask[k]
        if bank_ids:
            self.bank = fm.make_bank_from_device(
                bank_ids, jnp.concatenate(bank_desc),
                jnp.concatenate(bank_mask))
        self.timings["extraction"] = time.time() - t0

    def _want_device_bank(self) -> bool:
        """Device-resident descriptor bank: on for device backends when
        the bf16 bank fits comfortably in HBM."""
        if jax.default_backend() == "cpu":
            return False
        K = self.opts.sift.max_num_features
        return len(self.images) * K * 128 * 2 < 4 * 1024 ** 3

    # --------------------------------------------------------------- pairs
    def select_pairs(self) -> list:
        ids = sorted(self.images)
        if self.opts.pair_mode == "exhaustive":
            return [(i, j) for (i, j, _) in rt.exhaustive_pairs(ids)]
        if self.opts.pair_mode == "sequential":
            return [(i, j) for (i, j, _) in rt.sequential_pairs(
                ids, overlap=self.opts.sequential_overlap,
                loop_detection_period=self.opts.loop_detection_period,
                loop_detection_num_images=self.opts
                .loop_detection_num_images,
                descriptors=self.descriptors, masks=self.masks,
                retrieval_opts=self.opts.retrieval,
                seed=self.opts.seed)]
        if self.opts.pair_mode == "retrieval":
            return [(i, j) for (i, j, _) in rt.similarity_pairs(
                self.descriptors, self.masks, self.opts.retrieval,
                seed=self.opts.seed)]
        if self.opts.pair_mode == "vocab_tree":
            return self._vocab_tree_pairs(ids)
        if self.opts.pair_mode == "global":
            # global-descriptor kNN pairing (ref MirrorSimilarityGraph,
            # similarity_graph.h:91-120 — the CNN embedding's role is
            # filled by VLAD over the already-extracted SIFT descriptors
            # when available, else the GIST-style Gabor bank on raw
            # images; features/global_descriptor.py)
            from dagsfm_tpu.features import global_descriptor as gd
            if self.descriptors:
                descs = gd.vlad_descriptors(self.descriptors, self.masks,
                                            seed=self.opts.seed)
            else:
                descs = gd.global_descriptors(self.images)
            return [(i, j) for (i, j, _) in gd.global_similarity_pairs(
                descs, num_neighbors=self.opts.retrieval.num_neighbors)]
        raise ValueError(self.opts.pair_mode)

    def _vocab_tree_pairs(self, ids: list) -> list:
        """Vocab-tree retrieval pairing (ref VocabSimilarityGraph,
        similarity_graph.cpp:101-199): index every image into a
        VisualIndex built from the scene's own descriptors, query
        top-num_images neighbors, optionally re-rank by Hamming votes
        and spatially verify candidates (vote_and_verify.cc)."""
        from dagsfm_tpu.features import visual_index as vi
        train = np.concatenate(
            [self.descriptors[i][self.masks[i]] for i in ids])
        rng = np.random.default_rng(self.opts.seed)
        if len(train) > 20000:
            train = train[rng.choice(len(train), 20000, replace=False)]
        tree = vi.build_vocab_tree(train, vi.VocabTreeOptions(),
                                   seed=self.opts.seed)
        index = vi.VisualIndex(tree)
        for i in ids:
            index.add(i, self.descriptors[i][self.masks[i]],
                      keypoints=self.kp_geom[i][self.masks[i]]
                      if i in self.kp_geom else None)
        pairs = set()
        for i in ids:
            for j, _ in index.query(
                    i, num_images=self.opts.retrieval.num_neighbors,
                    rerank=self.opts.vocab_tree_rerank):
                pair = (i, j) if i < j else (j, i)
                if pair in pairs or pair[0] == pair[1]:
                    continue
                if self.opts.spatial_verification and i in self.kp_geom:
                    cand = index.match_words(pair[0], pair[1])
                    score, _ = vi.vote_and_verify(
                        self.kp_geom[pair[0]][self.masks[pair[0]]],
                        self.kp_geom[pair[1]][self.masks[pair[1]]],
                        cand)
                    if score < 4:
                        continue
                pairs.add(pair)
        return sorted(pairs)

    # --------------------------------------------------------------- match
    def match_and_verify(self, pairs: list | None = None):
        t0 = time.time()
        if pairs is None:
            pairs = self.select_pairs()
            self.timings["pair_selection"] = time.time() - t0
        t0 = time.time()
        raw = fm.match_pairs(self.descriptors, self.masks, pairs,
                             self.opts.matching, bank=self.bank)
        self.timings["matching"] = time.time() - t0

        t0 = time.time()
        from dagsfm_tpu.ops import two_view_classify as tvc
        pair_data = []
        for (i, j), m in raw.items():
            if len(m) < self.opts.min_num_inliers:
                continue
            cam_i = self.cameras[i]
            cam_j = self.cameras[j]
            pair_data.append((
                (i, j), self.keypoints[i][m[:, 0]],
                self.keypoints[j][m[:, 1]],
                cam_i.calibration_matrix(), cam_j.calibration_matrix(),
                (cam_i.width, cam_i.height), (cam_j.width, cam_j.height),
                getattr(cam_i, "prior_focal", True)
                and getattr(cam_j, "prior_focal", True)))
        tv_opts = tvc.TwoViewOptions(
            min_num_inliers=self.opts.min_num_inliers,
            max_error_px=self.opts.max_error_px,
            num_hypotheses=self.opts.num_ransac_hypotheses,
            essential_only=self.opts.two_view_essential_only)
        results = tvc.classify_pairs(pair_data, tv_opts,
                                     seed=self.opts.seed)
        for (i, j), res in results.items():
            if res.config in (tvc.DEGENERATE, tvc.WATERMARK):
                continue
            if res.num_inliers < self.opts.min_num_inliers:
                continue
            m = raw[(i, j)]
            inlier_matches = m[res.inlier_mask]
            num_inliers = res.num_inliers
            if self.opts.guided_matching:
                gm = self._guided_rematch((i, j), res)
                if gm is not None and len(gm) >= num_inliers:
                    inlier_matches, num_inliers = gm, len(gm)
            self.matches[(i, j)] = m
            self.two_view[(i, j)] = TwoViewRecord(
                R=res.R, t=res.t, inlier_matches=inlier_matches,
                num_inliers=num_inliers, config=res.config,
                E=res.E, F=res.F, H=res.H)
        self.timings["verification"] = time.time() - t0

    def _guided_rematch(self, pair, res):
        """Guided matching under the winning two-view model (ref
        matching.cc guided matching: epipolar constraint for E/F pairs,
        reprojection for H pairs). Returns (M, 2) uint32 or None."""
        from dagsfm_tpu.ops import two_view_classify as tvc
        i, j = pair
        use_h = res.config in (tvc.PLANAR, tvc.PANORAMIC,
                               tvc.PLANAR_OR_PANORAMIC)
        G = res.H if use_h else res.F
        if G is None:
            return None
        matches, _ = fm.guided_match_pair(
            jnp.asarray(self.descriptors[i]),
            jnp.asarray(self.descriptors[j]),
            jnp.asarray(self.keypoints[i]),
            jnp.asarray(self.keypoints[j]),
            jnp.asarray(self.masks[i]), jnp.asarray(self.masks[j]),
            jnp.asarray(G, jnp.float32),
            max_error_px=self.opts.max_error_px,
            opts=self.opts.matching, use_homography=use_h)
        m = np.asarray(matches)
        m = m[m[:, 0] >= 0]
        return m.astype(np.uint32)

    # ------------------------------------------------------------ database
    def write_database(self, path: str | None = None):
        path = path or self.database_path
        assert path is not None
        with scene_io.ColmapDatabase(path) as db:
            for i in sorted(self.images):
                cam = self.cameras[i]
                db.add_camera(cam)
                db.add_image(f"image{i:05d}.jpg", cam.camera_id, image_id=i)
                db.add_keypoints(i, self.keypoints[i][self.masks[i]])
                db.add_descriptors(i, sift.descriptors_to_uint8(
                    jnp.asarray(self.descriptors[i][self.masks[i]])))
            # matches reference compacted keypoint indices
            for (i, j), m in self.matches.items():
                remap_i = np.cumsum(self.masks[i]) - 1
                remap_j = np.cumsum(self.masks[j]) - 1
                mm = np.stack([remap_i[m[:, 0]], remap_j[m[:, 1]]], 1)
                db.add_matches(i, j, mm)
                rec = self.two_view[(i, j)]
                inl_m = rec.inlier_matches
                mi = np.stack([remap_i[inl_m[:, 0]], remap_j[inl_m[:, 1]]], 1)
                db.add_two_view_geometry(i, j, mi, config=rec.config,
                                         F=rec.F, E=rec.E, H=rec.H)

    @staticmethod
    def has_checkpoint(path: str | None) -> bool:
        """True if the DB already holds two-view geometries (ref :113)."""
        if path is None or not os.path.exists(path):
            return False
        with scene_io.ColmapDatabase(path) as db:
            return db.num_two_view_geometries() > 0

    # ----------------------------------------------------------------- run
    def run(self):
        """Extract+match+verify, or load from a checkpoint database."""
        if self.has_checkpoint(self.database_path):
            return self.load_from_database(self.database_path)
        self.extract_features()
        self.match_and_verify()
        if self.database_path:
            self.write_database()
        return self.to_mapper_inputs()

    def load_from_database(self, path: str):
        """Reconstruct mapper inputs from a checkpoint DB (ref :113-147)."""
        with scene_io.ColmapDatabase(path) as db:
            cams = db.read_cameras()
            imgs = db.read_images()
            graph = CorrespondenceGraph()
            images = {}
            for i, (name, cam_id) in sorted(imgs.items()):
                kp = db.read_keypoints(i)[:, :2].astype(np.float64)
                graph.add_image(i, len(kp))
                images[i] = ImageRecord(
                    image_id=i, name=name, camera_id=cam_id,
                    qvec=np.array([1.0, 0, 0, 0]), tvec=np.zeros(3),
                    xys=kp, point3D_ids=np.full(len(kp), -1, np.int64))
            for (i, j, m, config, F, E, H) in \
                    db.read_all_two_view_geometries():
                if len(m):
                    graph.add_matches(i, j, m)
        return cams, images, graph

    def to_mapper_inputs(self):
        """(cameras, images, graph) for the incremental/distributed mapper."""
        graph = CorrespondenceGraph()
        images = {}
        cam_by_id = {}
        for i in sorted(self.images):
            kp_mask = self.masks[i]
            kp = self.keypoints[i][kp_mask].astype(np.float64)
            graph.add_image(i, len(kp))
            cam = self.cameras[i]
            cam_by_id[cam.camera_id] = cam
            images[i] = ImageRecord(
                image_id=i, name=f"image{i:05d}.jpg",
                camera_id=cam.camera_id,
                qvec=np.array([1.0, 0, 0, 0]), tvec=np.zeros(3),
                xys=kp, point3D_ids=np.full(len(kp), -1, np.int64))
        for (i, j), rec in self.two_view.items():
            inl_m = rec.inlier_matches
            remap_i = np.cumsum(self.masks[i]) - 1
            remap_j = np.cumsum(self.masks[j]) - 1
            mm = np.stack([remap_i[inl_m[:, 0]], remap_j[inl_m[:, 1]]], 1)
            graph.add_matches(i, j, mm.astype(np.uint32))
        return cam_by_id, images, graph

    def two_view_edges(self) -> dict:
        """{(i, j): (R, t, num_inliers, config)} for the controller's
        view graph — pose edges from the WINNING two-view model (feeds
        DistributedMapperController(two_view_geometries=...))."""
        return {(i, j): (rec.R, rec.t, rec.num_inliers, rec.config)
                for (i, j), rec in self.two_view.items()}


def load_two_view_geometries_from_database(path: str) -> dict:
    """{(i, j): (R, t, num_inliers, config)} from a checkpoint database.

    Mirrors the reference's LoadTwoviewGeometries
    (distributed_mapper_controller.cpp:585): the stored winning model
    (E / F / H by config) is decomposed back into a relative pose using
    the stored inlier correspondences.
    """
    from dagsfm_tpu.ops import two_view_classify as tvc

    def _bucketed(a):
        n = 64
        while n < len(a):
            n *= 2
        out = np.zeros((n, 2))
        out[: len(a)] = a
        msk = np.zeros(n, bool)
        msk[: len(a)] = True
        return out, msk

    out = {}
    with scene_io.ColmapDatabase(path) as db:
        cams = db.read_cameras()
        imgs = db.read_images()
        kps = {i: db.read_keypoints(i)[:, :2].astype(np.float64)
               for i in imgs}
        cam_of = {i: cams[cid] for i, (name, cid) in imgs.items()}
        for (i, j, m, config, F, E, H) in db.read_all_two_view_geometries():
            if len(m) < 5:
                continue
            Ki = cam_of[i].calibration_matrix()
            Kj = cam_of[j].calibration_matrix()
            p1 = kps[i][m[:, 0]]
            p2 = kps[j][m[:, 1]]
            x1 = (p1 - Ki[:2, 2]) / np.array([Ki[0, 0], Ki[1, 1]])
            x2 = (p2 - Kj[:2, 2]) / np.array([Kj[0, 0], Kj[1, 1]])
            R = t = None
            if config == tvc.CALIBRATED and E is not None:
                x1p, msk = _bucketed(x1)
                x2p, _ = _bucketed(x2)
                Rj, tj, _nf = tvc._pose_from_e(
                    jnp.asarray(E), jnp.asarray(x1p), jnp.asarray(x2p),
                    jnp.asarray(msk))
                R, t = np.asarray(Rj), np.asarray(tj)
            elif config == tvc.UNCALIBRATED and F is not None:
                E_up = Kj.T @ np.asarray(F) @ Ki
                x1p, msk = _bucketed(x1)
                x2p, _ = _bucketed(x2)
                Rj, tj, _nf = tvc._pose_from_e(
                    jnp.asarray(E_up), jnp.asarray(x1p), jnp.asarray(x2p),
                    jnp.asarray(msk))
                R, t = np.asarray(Rj), np.asarray(tj)
            elif config in (tvc.PLANAR, tvc.PANORAMIC,
                            tvc.PLANAR_OR_PANORAMIC) and H is not None:
                Hn = np.linalg.inv(Kj) @ np.asarray(H) @ Ki
                R, t, _n = tvc.pose_from_homography(Hn, x1, x2)
            out[(i, j)] = (R, t, len(m), config)
    return out


# ---------------------------------------------------------------------------
# Database-backed matching (spatial / transitive / retrieval re-runs).
# The ref's SpatialFeatureMatcher / TransitiveFeatureMatcher operate on an
# existing database (features already extracted); these helpers do the same
# against our ColmapDatabase, with the pair list supplied by the caller.
# ---------------------------------------------------------------------------


def load_features_from_database(path: str):
    """Load (cams_by_image, keypoints, descriptors, masks, names,
    matched_pairs, priors) from a database.  Descriptors are dequantized
    to L2-normalized float32 and zero-padded to a common K (multiple of
    32) so they can be batch-matched on device."""
    with scene_io.ColmapDatabase(path) as db:
        cams = db.read_cameras()
        imgs = db.read_images()
        priors = db.read_image_priors()
        kps, descs = {}, {}
        for i in imgs:
            kps[i] = db.read_keypoints(i)[:, :2].astype(np.float64)
            d = db.read_descriptors(i).astype(np.float32) / 512.0
            n = np.linalg.norm(d, axis=1, keepdims=True)
            descs[i] = d / np.maximum(n, 1e-9)
        matched = [(i1, i2) for (i1, i2, m, *_)
                   in db.read_all_two_view_geometries() if len(m)]
    kmax = max([len(d) for d in descs.values()] + [32])
    kmax = int(np.ceil(kmax / 32) * 32)
    masks = {}
    for i, d in descs.items():
        k = len(d)
        pad = np.zeros((kmax, 128), np.float32)
        pad[:k] = d
        descs[i] = pad
        m = np.zeros(kmax, bool)
        m[:k] = True
        masks[i] = m
    cams_by_image = {i: cams[cid] for i, (name, cid) in imgs.items()}
    names = {i: name for i, (name, cid) in imgs.items()}
    return cams_by_image, kps, descs, masks, names, matched, priors


def run_matcher_on_database(database_path: str, pairs: list,
                            options: FeaturePipelineOptions | None = None
                            ) -> int:
    """Match + verify the given image-id pairs against an existing
    database and append the verified two-view geometries.  Returns the
    number of pairs that passed verification."""
    opts = options or FeaturePipelineOptions()
    (cams_by_image, kps, descs, masks, names, matched,
     priors) = load_features_from_database(database_path)
    pairs = [(i, j) for (i, j) in pairs
             if i in descs and j in descs]
    if not pairs:
        return 0
    raw = fm.match_pairs(descs, masks, pairs, opts.matching)
    pair_data = []
    for (i, j), m in raw.items():
        if len(m) < opts.min_num_inliers:
            continue
        Ki = cams_by_image[i].calibration_matrix()
        Kj = cams_by_image[j].calibration_matrix()
        x1 = (kps[i][m[:, 0]] - Ki[:2, 2]) / np.array([Ki[0, 0], Ki[1, 1]])
        x2 = (kps[j][m[:, 1]] - Kj[:2, 2]) / np.array([Kj[0, 0], Kj[1, 1]])
        thr = (opts.max_error_px / Ki[0, 0]) ** 2
        pair_data.append(((i, j), x1, x2, thr))
    results = verify_pairs(pair_data, num_hyps=opts.num_ransac_hypotheses,
                           seed=opts.seed)
    n = 0
    with scene_io.ColmapDatabase(database_path) as db:
        for (i, j), (R, t, ninl, nf, inl, valid) in results.items():
            if not valid or ninl < opts.min_num_inliers:
                continue
            m = raw[(i, j)]
            db.add_matches(i, j, m)
            db.add_two_view_geometry(i, j, m[inl], config=2)
            n += 1
    return n
