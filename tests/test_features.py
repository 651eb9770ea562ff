"""Feature stack tests: SIFT on synthetic bitmaps + matcher + retrieval
(ref feature/sift_test.cc style: on-the-fly synthetic images)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dagsfm_tpu.features import matching as fm
from dagsfm_tpu.features import retrieval as rt
from dagsfm_tpu.features import sift


def blob_image(H=256, W=256, num_blobs=40, seed=0):
    """Random Gaussian blobs — classic synthetic SIFT test pattern."""
    rng = np.random.default_rng(seed)
    img = np.zeros((H, W), np.float32)
    ys = rng.uniform(20, H - 20, num_blobs)
    xs = rng.uniform(20, W - 20, num_blobs)
    sig = rng.uniform(2.0, 6.0, num_blobs)
    amp = rng.uniform(0.4, 1.0, num_blobs) * rng.choice([-1, 1], num_blobs)
    yy, xx = np.mgrid[0:H, 0:W]
    for y, x, s, a in zip(ys, xs, sig, amp):
        img += a * np.exp(-((yy - y) ** 2 + (xx - x) ** 2) / (2 * s * s))
    img = (img - img.min()) / (img.max() - img.min())
    return img.astype(np.float32), np.stack([xs, ys], 1)


@pytest.fixture(scope="module")
def opts():
    return sift.SiftOptions(max_num_features=256, candidates_per_octave=256,
                            num_octaves=3)


class TestSift:
    def test_finds_blobs(self, opts):
        img, centers = blob_image()
        feats = sift.extract(jnp.asarray(img[None]), opts)
        n = int(feats.mask[0].sum())
        assert n >= 30, n
        xy = np.asarray(feats.xy[0][np.asarray(feats.mask[0])])
        # most blob centers have a keypoint within a few pixels
        d = np.linalg.norm(centers[:, None] - xy[None], axis=-1).min(1)
        assert (d < 3.0).mean() > 0.6, (d < 3.0).mean()

    def test_shift_equivariance(self, opts):
        img, _ = blob_image(seed=1)
        shift = 8
        img2 = np.roll(img, shift, axis=1)
        feats = sift.extract(jnp.asarray(np.stack([img, img2])), opts)
        m = np.asarray(feats.mask)
        xy1 = np.asarray(feats.xy[0])[m[0]]
        xy2 = np.asarray(feats.xy[1])[m[1]]
        # keypoints away from the wrap seam move by exactly `shift`
        inner = (xy1[:, 0] > 24) & (xy1[:, 0] < 256 - 24 - shift)
        moved = xy1[inner] + np.array([shift, 0.0])
        d = np.linalg.norm(moved[:, None] - xy2[None], axis=-1).min(1)
        assert np.median(d) < 1.0, np.median(d)

    def test_descriptors_normalized(self, opts):
        img, _ = blob_image(seed=2)
        feats = sift.extract(jnp.asarray(img[None]), opts)
        m = np.asarray(feats.mask[0])
        d = np.asarray(feats.descriptor[0])[m]
        # l1_root: squared descriptors sum to ~1
        np.testing.assert_allclose((d ** 2).sum(1), 1.0, atol=1e-3)
        assert (d >= 0).all()

    def test_match_shifted_images(self, opts):
        img, _ = blob_image(seed=3)
        shift = 10
        img2 = np.roll(img, shift, axis=1)
        feats = sift.extract(jnp.asarray(np.stack([img, img2])), opts)
        desc = np.asarray(feats.descriptor)
        mask = np.asarray(feats.mask)
        matches, counts = fm.match_pair_batch(
            jnp.asarray(desc[:1]), jnp.asarray(desc[1:]),
            jnp.asarray(mask[:1]), jnp.asarray(mask[1:]))
        m = np.asarray(matches[0])
        m = m[m[:, 0] >= 0]
        assert len(m) >= 20, len(m)
        xy1 = np.asarray(feats.xy[0])[m[:, 0]]
        xy2 = np.asarray(feats.xy[1])[m[:, 1]]
        dx = xy2[:, 0] - xy1[:, 0]
        dy = xy2[:, 1] - xy1[:, 1]
        good = (np.abs(dx - shift) < 2.0) & (np.abs(dy) < 2.0)
        # allow seam-wrapped outliers
        assert good.mean() > 0.7, good.mean()


class TestMatcher:
    def _toy(self, key, n1=100, n2=100, common=40):
        rng = np.random.default_rng(key)
        d_common = rng.normal(0, 1, (common, 128))
        d1 = np.concatenate([d_common + rng.normal(0, 0.05, d_common.shape),
                             rng.normal(0, 1, (n1 - common, 128))])
        d2 = np.concatenate([d_common + rng.normal(0, 0.05, d_common.shape),
                             rng.normal(0, 1, (n2 - common, 128))])
        d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
        d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
        return d1.astype(np.float32), d2.astype(np.float32)

    def test_ratio_and_crosscheck(self):
        d1, d2 = self._toy(0)
        m1 = np.ones(100, bool)
        matches, counts = fm.match_pair_batch(
            jnp.asarray(d1[None]), jnp.asarray(d2[None]),
            jnp.asarray(m1[None]), jnp.asarray(m1[None]))
        m = np.asarray(matches[0])
        m = m[m[:, 0] >= 0]
        # all common descriptors matched identically, few false matches
        correct = (m[:, 0] == m[:, 1]) & (m[:, 0] < 40)
        assert correct.sum() >= 35
        assert (~correct).sum() <= 3

    def test_masked_keypoints_ignored(self):
        d1, d2 = self._toy(1)
        m1 = np.ones(100, bool)
        m2 = np.ones(100, bool)
        m2[:40] = False  # hide the common ones in image 2
        matches, counts = fm.match_pair_batch(
            jnp.asarray(d1[None]), jnp.asarray(d2[None]),
            jnp.asarray(m1[None]), jnp.asarray(m2[None]))
        m = np.asarray(matches[0])
        m = m[m[:, 0] >= 0]
        assert not np.any(m[:, 1] < 40)

    def test_match_pairs_wrapper(self):
        d1, d2 = self._toy(2)
        descs = {1: d1, 2: d2, 3: d1.copy()}
        masks = {k: np.ones(100, bool) for k in descs}
        out = fm.match_pairs(descs, masks, [(1, 2), (1, 3)])
        assert len(out[(1, 3)]) >= 90  # identical images match fully
        assert len(out[(1, 2)]) >= 35

    def test_match_pairs_device_resident_parity(self):
        """The device-resident packed path (incl. the >PACK_M overflow
        fallback) must reproduce the per-pair loop exactly."""
        rng = np.random.default_rng(5)
        K = 256
        base = np.abs(rng.normal(size=(K, 128))).astype(np.float32)
        descs, masks = {}, {}
        for i in range(6):
            d = base + (0.1 + 0.1 * (i % 2)) * np.abs(
                rng.normal(size=(K, 128))).astype(np.float32)
            d /= np.linalg.norm(d, axis=1, keepdims=True)
            descs[i] = d
            m = np.ones(K, bool)
            m[K - 1 - (i * 13) % 40:] = False
            masks[i] = m
        pairs = [(i, j) for i in range(6) for j in range(i + 1, 6)]
        ref = fm.match_pairs(descs, masks, pairs, device_resident=False,
                             use_pallas=False)
        res = fm.match_pairs(descs, masks, pairs, device_resident=True,
                             use_pallas=False)
        # correlated descriptors make some pairs overflow PACK_M, so
        # both the packed fast path and the full-row fallback run
        assert any(len(ref[p]) > fm.PACK_M for p in pairs)
        for p in pairs:
            np.testing.assert_array_equal(ref[p], res[p])

    def test_match_pairs_with_bank(self):
        d1, d2 = self._toy(3)
        K = d1.shape[0]
        pad = 128 - K % 128 if K % 128 else 0
        d1p = np.concatenate([d1, np.zeros((pad, 128), np.float32)])
        d2p = np.concatenate([d2, np.zeros((pad, 128), np.float32)])
        m = np.zeros(len(d1p), bool)
        m[:K] = True
        descs = {1: d1p, 2: d2p}
        masks = {1: m, 2: m.copy()}
        bank = fm.make_bank(descs, masks)
        out = fm.match_pairs(descs, masks, [(1, 2)], bank=bank,
                             device_resident=True, use_pallas=False)
        ref = fm.match_pairs(descs, masks, [(1, 2)],
                             device_resident=False, use_pallas=False)
        np.testing.assert_array_equal(out[(1, 2)], ref[(1, 2)])


class TestRetrieval:
    def test_similar_images_paired(self):
        rng = np.random.default_rng(0)
        # two groups of images sharing descriptors within-group
        base_a = rng.normal(0, 1, (200, 128))
        base_b = rng.normal(0, 1, (200, 128))
        descs, masks = {}, {}
        for i in range(4):
            d = base_a + rng.normal(0, 0.05, base_a.shape)
            descs[i] = (d / np.linalg.norm(d, axis=1, keepdims=True)
                        ).astype(np.float32)
            masks[i] = np.ones(200, bool)
        for i in range(4, 8):
            d = base_b + rng.normal(0, 0.05, base_b.shape)
            descs[i] = (d / np.linalg.norm(d, axis=1, keepdims=True)
                        ).astype(np.float32)
            masks[i] = np.ones(200, bool)
        pairs = rt.similarity_pairs(descs, masks,
                                    rt.RetrievalOptions(num_neighbors=3,
                                                        vocab_size=64))
        # top pairs should be within-group
        top = pairs[:8]
        within = sum(1 for (i, j, s) in top if (i < 4) == (j < 4))
        assert within >= 7, top

    def test_pair_generators(self):
        ids = list(range(6))
        ex = rt.exhaustive_pairs(ids)
        assert len(ex) == 15
        seq = rt.sequential_pairs(ids, overlap=2)
        assert (0, 1, 0.0) in seq and (0, 2, 0.0) in seq
        assert len(seq) == 9
        loc = np.arange(6)[:, None] * np.array([[10.0, 0.0, 0.0]])
        sp = rt.spatial_pairs(ids, loc, max_num_neighbors=2,
                              max_distance=15.0)
        assert ((0, 1) in [(i, j) for (i, j, _) in sp])
        assert not any(abs(i - j) > 1 for (i, j, _) in sp)


class TestGuidedMatching:
    def test_recovers_ratio_killed_matches(self):
        import jax
        rng = np.random.default_rng(5)
        K = 64
        # repetitive texture: half the descriptors are near-duplicates so
        # the ratio test kills them; guided matching recovers them
        base = rng.normal(0, 1, (K // 2, 128))
        d1 = np.concatenate([base, base + rng.normal(0, 0.01, base.shape)])
        d2 = d1 + rng.normal(0, 0.01, d1.shape)
        d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
        d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
        xy1 = rng.uniform(0, 500, (K, 2))
        xy2 = xy1 + np.array([3.0, 0.0])   # pure shift homography
        m = np.ones(K, bool)
        # plain matching: ratio test rejects the duplicated half
        plain, n_plain = fm.match_pair_batch(
            jnp.asarray(d1[None]), jnp.asarray(d2[None]),
            jnp.asarray(m[None]), jnp.asarray(m[None]))
        H = np.array([[1.0, 0, 3.0], [0, 1, 0], [0, 0, 1]])
        guided, n_guided = fm.guided_match_pair(
            jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(xy1),
            jnp.asarray(xy2), jnp.asarray(m), jnp.asarray(m),
            jnp.asarray(H), max_error_px=2.0, use_homography=True)
        assert int(n_guided) > int(n_plain[0])
        g = np.asarray(guided)
        g = g[g[:, 0] >= 0]
        assert (g[:, 0] == g[:, 1]).mean() > 0.9


class TestSiftReferenceParity:
    """first_octave=-1 / auto octaves / max_image_size (ref sift.h:44-114)."""

    def _image(self, H=96, W=128, seed=5):
        rng = np.random.default_rng(seed)
        img = rng.random((H, W)).astype(np.float32)
        import scipy.ndimage as ndi
        return ndi.gaussian_filter(img, 1.2).astype(np.float32)

    def test_upsampled_first_octave_increases_yield(self):
        img = self._image()
        batch = jnp.asarray(img[None])
        o_up = sift.SiftOptions(first_octave=-1, num_octaves=3,
                                max_num_features=8192,
                                candidates_per_octave=512)
        o_no = sift.SiftOptions(first_octave=0, num_octaves=3,
                                max_num_features=8192,
                                candidates_per_octave=512)
        n_up = int(np.asarray(sift.extract(batch, o_up).mask).sum())
        n_no = int(np.asarray(sift.extract(batch, o_no).mask).sum())
        assert n_up > 1.5 * n_no, (n_up, n_no)
        # keypoints stay inside the ORIGINAL pixel frame
        f = sift.extract(batch, o_up)
        xy = np.asarray(f.xy)[0][np.asarray(f.mask)[0]]
        assert xy[:, 0].max() < img.shape[1]
        assert xy[:, 1].max() < img.shape[0]

    def test_auto_octave_count(self):
        # num_octaves=0 derives the pyramid depth from the image size:
        # both shapes must run without error and yield features
        for shape in ((64, 64), (96, 160)):
            img = self._image(*shape)
            o = sift.SiftOptions(num_octaves=0, first_octave=-1,
                                 max_num_features=1024,
                                 candidates_per_octave=256)
            f = sift.extract(jnp.asarray(img[None]), o)
            assert int(np.asarray(f.mask).sum()) > 0, shape

    def test_max_image_size_resize_maps_back(self):
        from dagsfm_tpu.pipeline.feature_pipeline import (
            FeaturePipeline, FeaturePipelineOptions)
        from dagsfm_tpu.scene import cameras as cm
        img = self._image(128, 192)
        opts = FeaturePipelineOptions(batch_size=1)
        opts.sift = sift.SiftOptions(max_image_size=96, num_octaves=2,
                                     max_num_features=512,
                                     candidates_per_octave=256)
        cams = {1: cm.make_simple_camera(1, 192, 128, focal=200.0)}
        fp = FeaturePipeline({1: img}, cams, opts)
        fp.extract_features()
        kp = fp.keypoints[1][fp.masks[1]]
        assert len(kp) > 0
        # coordinates are back in the ORIGINAL (192x128) frame, and use
        # the full extent (not clipped to the resized 96px bound)
        assert kp[:, 0].max() > 96.0
        assert kp[:, 0].max() < 192 and kp[:, 1].max() < 128


def test_patch_sampling_matches_gather_path():
    """The TPU patch-sampling path (dynamic-slice patches + one-hot
    matmul interpolation) produces the SAME keypoints/descriptors as the
    gather path — forced on here (CPU auto-resolves to gathers)."""
    import scipy.ndimage as ndi

    from dagsfm_tpu.features import sift

    rng = np.random.default_rng(0)
    img = ndi.gaussian_filter(rng.random((192, 256)).astype(np.float32),
                              1.2)
    batch = np.stack([img])
    o_patch = sift.SiftOptions(max_num_features=384,
                               candidates_per_octave=256, num_octaves=3,
                               patch_sampling=True)
    fp_ = sift.extract(batch, o_patch)
    fg = sift.extract(batch, o_patch._replace(patch_sampling=False))
    mp_ = np.asarray(fp_.mask[0])
    mg = np.asarray(fg.mask[0])
    assert mp_.sum() == mg.sum()
    # same detections in the same order (detection path is identical)
    np.testing.assert_allclose(np.asarray(fp_.xy[0])[mp_],
                               np.asarray(fg.xy[0])[mg], atol=1e-6)
    np.testing.assert_allclose(np.asarray(fp_.orientation[0])[mp_],
                               np.asarray(fg.orientation[0])[mg],
                               atol=1e-5)
    dp = np.asarray(fp_.descriptor[0])[mp_]
    dg = np.asarray(fg.descriptor[0])[mg]
    cos = np.sum(dp * dg, -1) / np.maximum(
        np.linalg.norm(dp, axis=-1) * np.linalg.norm(dg, axis=-1), 1e-12)
    assert cos.min() > 0.999, cos.min()
