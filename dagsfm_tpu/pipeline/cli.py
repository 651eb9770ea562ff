"""Command-line interface: colmap-compatible subcommand layout.

TPU-native counterpart of /root/reference/src/exe/colmap.cc (command table
:2105-2140) — the DAGSfM-relevant subset:

  automatic_reconstructor   one-click pipeline (ref AutomaticReconstruction)
  feature_extractor         SIFT over an image directory -> database.db
  exhaustive_matcher /
  sequential_matcher /
  vocab_tree_matcher        match + verify -> database.db
  mapper                    incremental SfM from a database
  distributed_mapper        the full graph-partitioned pipeline (ref :828)
  sfm_aligner               merge partial reconstructions (ref :1009)
  bundle_adjuster           standalone global BA (ref BundleAdjustmentController)
  model_converter           bin <-> text <-> PLY
  synthetic_scene           generate a benchmark scene (test/bench backbone)

Flag names mirror the reference's boost::program_options registry
(util/option_manager.{h,cc}) where a counterpart exists.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def _load_images_from_dir(image_path: str):
    """Grayscale-load all images in a directory (PIL if available)."""
    try:
        from PIL import Image
    except ImportError as e:
        raise SystemExit("image loading requires PIL; for synthetic "
                         "pipelines use `synthetic_scene`") from e
    out = {}
    names = {}
    exts = {".jpg", ".jpeg", ".png", ".bmp", ".tif", ".tiff"}
    files = sorted(f for f in os.listdir(image_path)
                   if os.path.splitext(f.lower())[1] in exts)
    for k, f in enumerate(files):
        img = Image.open(os.path.join(image_path, f)).convert("L")
        out[k + 1] = np.asarray(img, np.float32) / 255.0
        names[k + 1] = f
    return out, names


def _image_reader_opts(args):
    """ImageReaderOptions from the shared --ImageReader-parity flags
    (ref image_reader.h:64-83: default SIMPLE_RADIAL + EXIF focal)."""
    from dagsfm_tpu.scene.image_reader import ImageReaderOptions
    return ImageReaderOptions(
        camera_model=getattr(args, "camera_model", "SIMPLE_RADIAL"),
        single_camera=bool(getattr(args, "single_camera", False)),
        camera_params=getattr(args, "camera_params", "") or "",
        default_focal_length_factor=getattr(
            args, "default_focal_length_factor", 1.2))


def _load_images_and_cameras(args):
    """Directory -> (images, names, cameras) with EXIF focal priors."""
    from dagsfm_tpu.scene.image_reader import read_images_with_cameras
    return read_images_with_cameras(args.image_path,
                                    _image_reader_opts(args))


def cmd_feature_extractor(args):
    from dagsfm_tpu.features import sift
    from dagsfm_tpu.pipeline.feature_pipeline import (FeaturePipeline,
                                                      FeaturePipelineOptions)
    images, names, cams = _load_images_and_cameras(args)
    opts = FeaturePipelineOptions()
    opts.sift = sift.SiftOptions(
        max_num_features=args.max_num_features,
        first_octave=args.first_octave,
        num_octaves=args.num_octaves,
        max_image_size=args.max_image_size)
    fp = FeaturePipeline(images, cams, opts, database_path=args.database_path)
    fp.extract_features()
    fp.write_database()
    print(f"extracted features for {len(images)} images "
          f"-> {args.database_path}")


def _run_matcher(args, mode):
    from dagsfm_tpu.pipeline.feature_pipeline import (FeaturePipeline,
                                                      FeaturePipelineOptions)
    images, names, cams = _load_images_and_cameras(args)
    opts = FeaturePipelineOptions(pair_mode=mode)
    fp = FeaturePipeline(images, cams, opts, database_path=args.database_path)
    fp.run()
    print(f"matched ({mode}); two-view geometries: {len(fp.two_view)}")


def cmd_exhaustive_matcher(args):
    _run_matcher(args, "exhaustive")


def cmd_sequential_matcher(args):
    _run_matcher(args, "sequential")


def cmd_vocab_tree_matcher(args):
    _run_matcher(args, "retrieval")


def cmd_global_matcher(args):
    """Global-descriptor kNN pairing + matching (ref mirror_matcher /
    MirrorSimilarityGraph role, similarity_graph.h:91-120; embedding =
    VLAD over SIFT, features/global_descriptor.py)."""
    _run_matcher(args, "global")


def cmd_mapper(args):
    """Multi-model incremental mapping with init-trial relaxation;
    models are written under output_path/0, /1, ... (ref mapper CLI +
    ReconstructionManager::Write)."""
    from dagsfm_tpu.pipeline.feature_pipeline import FeaturePipeline
    from dagsfm_tpu.sfm.mapper_controller import (ControllerOptions,
                                                  MapperController)
    fp = FeaturePipeline({}, {}, database_path=args.database_path)
    cams, images, graph = fp.load_from_database(args.database_path)
    ctrl = MapperController(cams, images, graph, ControllerOptions())
    mgr = ctrl.run()
    mgr.write(args.output_path)
    for k, rec in enumerate(mgr):
        print(f"model {k}: {rec.num_reg_images()} images, "
              f"{rec.num_points3D()} points")
    total = sum(r.num_reg_images() for r in mgr)
    print(f"registered {total}/{len(images)} images in {len(mgr)} "
          f"model(s) -> {args.output_path}")


def cmd_distributed_mapper(args):
    from dagsfm_tpu.clustering.image_clustering import ClusteringOptions
    from dagsfm_tpu.pipeline.distributed_mapper import (
        DistributedMapperController, DistributedMapperOptions)
    from dagsfm_tpu.pipeline.feature_pipeline import FeaturePipeline
    from dagsfm_tpu.scene import io as scene_io
    from dagsfm_tpu.pipeline.feature_pipeline import (
        load_two_view_geometries_from_database)
    fp = FeaturePipeline({}, {}, database_path=args.database_path)
    cams, images, graph = fp.load_from_database(args.database_path)
    two_view = load_two_view_geometries_from_database(args.database_path)
    opts = DistributedMapperOptions(
        clustering=ClusteringOptions(
            num_images_ub=args.num_images_ub,
            completeness_ratio=args.completeness_ratio,
            relax_ratio=args.relax_ratio,
            image_overlap=args.image_overlap,
            cluster_type=args.cluster_type),
        distributed_final_ba=args.distributed,
        retriangulate=args.retriangulate,
        final_ba=args.final_ba,
    )
    ctrl = DistributedMapperController(cams, images, graph, opts,
                                       two_view_geometries=two_view)
    rec = ctrl.run()
    os.makedirs(args.output_path, exist_ok=True)
    scene_io.write_model_bin(rec, args.output_path)
    print(ctrl.report())
    print(f"registered {rec.num_reg_images()}/{len(images)} images, "
          f"{rec.num_points3D()} points -> {args.output_path}")


def cmd_sfm_aligner(args):
    from dagsfm_tpu.scene import io as scene_io
    from dagsfm_tpu.sfm.aligner import SfMAligner
    recs = []
    for d in sorted(os.listdir(args.input_path)):
        p = os.path.join(args.input_path, d)
        if os.path.isdir(p) and os.path.exists(
                os.path.join(p, "cameras.bin")):
            recs.append(scene_io.read_model_bin(p))
    if not recs:
        raise SystemExit("no partial reconstructions found")
    merged = SfMAligner(recs).align()
    os.makedirs(args.output_path, exist_ok=True)
    scene_io.write_model_bin(merged, args.output_path)
    print(f"merged {len(recs)} partitions -> {merged.num_reg_images()} "
          f"images, {merged.num_points3D()} points")


def cmd_bundle_adjuster(args):
    import jax.numpy as jnp
    from dagsfm_tpu.scene import io as scene_io
    from dagsfm_tpu.sfm import bundle_adjustment as ba
    rec = scene_io.read_model_bin(args.input_path)
    arrays, ids = rec.to_arrays()
    const = np.zeros(arrays.image_qvec.shape[0], bool)
    const[:2] = True
    prob = ba.make_problem(arrays, const_image=const)
    prob, stats = ba.solve(prob, ba.BAOptions(
        max_iterations=args.max_num_iterations))
    arrays = arrays._replace(image_qvec=np.asarray(prob.image_qvec),
                             image_tvec=np.asarray(prob.image_tvec),
                             points_xyz=np.asarray(prob.points))
    rec.update_from_arrays(arrays, ids)
    os.makedirs(args.output_path, exist_ok=True)
    scene_io.write_model_bin(rec, args.output_path)
    print(f"BA cost {float(stats.initial_cost):.2f} -> "
          f"{float(stats.final_cost):.2f}")


def cmd_model_converter(args):
    from dagsfm_tpu.scene import io as scene_io
    if os.path.exists(os.path.join(args.input_path, "cameras.bin")):
        rec = scene_io.read_model_bin(args.input_path)
    else:
        rec = scene_io.read_model_text(args.input_path)
    if args.output_type == "BIN":
        scene_io.write_model_bin(rec, args.output_path)
    elif args.output_type == "TXT":
        scene_io.write_model_text(rec, args.output_path)
    elif args.output_type == "PLY":
        scene_io.write_model_ply(rec, args.output_path)
    elif args.output_type == "NVM":
        from dagsfm_tpu.scene import exporters
        exporters.write_nvm(rec, args.output_path)
    elif args.output_type == "Bundler":
        from dagsfm_tpu.scene import exporters
        exporters.write_bundler(rec, args.output_path,
                                args.output_path + ".list.txt")
    else:
        raise SystemExit(f"unknown output_type {args.output_type}")
    print(f"converted -> {args.output_path} ({args.output_type})")


def cmd_automatic_reconstructor(args):
    """One-click sparse pipeline (ref AutomaticReconstructionController)."""
    from dagsfm_tpu.pipeline.feature_pipeline import (FeaturePipeline,
                                                      FeaturePipelineOptions)
    from dagsfm_tpu.scene import cameras as cm
    from dagsfm_tpu.scene import io as scene_io
    from dagsfm_tpu.sfm.incremental_mapper import (IncrementalMapper,
                                                   MapperOptions)
    images, names, cams = _load_images_and_cameras(args)
    db = os.path.join(args.workspace_path, "database.db")
    os.makedirs(args.workspace_path, exist_ok=True)
    fp = FeaturePipeline(images, cams,
                         FeaturePipelineOptions(pair_mode="exhaustive"),
                         database_path=db)
    cams2, imgs2, graph = fp.run()
    mapper = IncrementalMapper(cams2, imgs2, graph, MapperOptions())
    rec = mapper.reconstruct()
    out = os.path.join(args.workspace_path, "sparse", "0")
    scene_io.write_model_bin(rec, out)
    print(f"reconstruction: {rec.num_reg_images()} images, "
          f"{rec.num_points3D()} points -> {out}")


def cmd_local_sfm_worker(args):
    """Worker process: claim cluster jobs from a shared work_dir and
    reconstruct them (ref `colmap local_sfm_worker`, exe/colmap.cc:923;
    RPC replaced by shared-storage leases)."""
    from dagsfm_tpu.parallel.distributed import run_worker
    from dagsfm_tpu.pipeline.feature_pipeline import FeaturePipeline
    fp = FeaturePipeline({}, {}, database_path=args.database_path)
    cams, images, graph = fp.load_from_database(args.database_path)
    with open(os.path.join(args.work_dir, "clusters.json")) as f:
        clusters = json.load(f)
    done = run_worker(cams, images, graph, clusters, args.work_dir,
                      host_id=args.host_id,
                      lease_timeout_s=args.lease_timeout)
    print(f"worker {args.host_id}: completed clusters {done}")


def cmd_local_matching_worker(args):
    """Worker process: claim MATCHING jobs from a shared work_dir,
    extract+match+verify each job's pair list into a per-job database
    (ref worker RunMatching binding, exe/colmap.cc:961-983 ->
    ExtractFeatureAndMatch; RPC replaced by shared-storage leases).

    Images are .npy grayscale files `image<id>.npy` under --image_path;
    jobs come from matching_jobs.json in the work_dir (written by
    parallel.distributed.make_matching_jobs).
    """
    from dagsfm_tpu.parallel.distributed import run_matching_worker
    from dagsfm_tpu.pipeline.feature_pipeline import FeaturePipelineOptions
    from dagsfm_tpu.scene import cameras as cm

    with open(os.path.join(args.work_dir, "matching_jobs.json")) as f:
        jobs = json.load(f)
    need = sorted({i for j in jobs for i in j["image_ids"]})
    images, cams = {}, {}
    for i in need:
        img = np.load(os.path.join(args.image_path, f"image{i}.npy"))
        images[i] = img
        cams[i] = cm.make_simple_camera(
            i, img.shape[1], img.shape[0],
            focal=args.focal if args.focal > 0 else None)
    opts = FeaturePipelineOptions(batch_size=args.batch_size,
                                  guided_matching=args.guided_matching)
    if args.max_num_features > 0:
        from dagsfm_tpu.features import sift
        opts.sift = sift.SiftOptions(
            max_num_features=args.max_num_features,
            candidates_per_octave=min(512, args.max_num_features),
            num_octaves=3)
    done = run_matching_worker(images, cams, jobs, args.work_dir,
                               host_id=args.host_id,
                               pipeline_options=opts,
                               lease_timeout_s=args.lease_timeout)
    print(f"matching worker {args.host_id}: completed jobs {done}")


def cmd_database_creator(args):
    """Create an empty COLMAP-schema database (ref database_creator)."""
    from dagsfm_tpu.scene.io import ColmapDatabase
    ColmapDatabase(args.database_path).close()
    print(f"created {args.database_path}")


def cmd_matches_importer(args):
    """Import raw feature matches from a text file (ref matches_importer
    --match_type raw: blocks of 'name1 name2' then 'i j' rows)."""
    from dagsfm_tpu.scene.io import ColmapDatabase
    db = ColmapDatabase(args.database_path)
    name_to_id = {name: iid for iid, (name, _)
                  in db.read_images().items()}
    cur_pair, rows, n = None, [], 0
    def flush():
        nonlocal rows, n
        if cur_pair and rows:
            db.add_matches(cur_pair[0], cur_pair[1],
                           np.asarray(rows, np.uint32))
            n += 1
        rows = []
    with open(args.match_list_path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                flush(); cur_pair = None
            elif len(parts) == 2 and parts[0] in name_to_id:
                flush()
                cur_pair = (name_to_id[parts[0]], name_to_id[parts[1]])
            elif cur_pair and len(parts) == 2:
                rows.append((int(parts[0]), int(parts[1])))
    flush()
    db.close()
    print(f"imported matches for {n} pairs")


def cmd_point_triangulator(args):
    """Triangulate a model with known poses from database matches
    (ref point_triangulator)."""
    from dagsfm_tpu.pipeline.feature_pipeline import FeaturePipeline
    from dagsfm_tpu.scene import io as scene_io
    from dagsfm_tpu.sfm.incremental_mapper import (IncrementalMapper,
                                                   MapperOptions)
    rec = scene_io.read_model_bin(args.input_path)
    fp = FeaturePipeline({}, {}, database_path=args.database_path)
    cams, images, graph = fp.load_from_database(args.database_path)
    mapper = IncrementalMapper(cams, images, graph, MapperOptions())
    # install known poses, then triangulate every registered image
    name_to_db = {im.name: iid for iid, im in images.items()}
    n_tri = 0
    for iid in rec.reg_image_ids:
        im = rec.images[iid]
        did = name_to_db.get(im.name)
        if did is None:
            continue
        mapper.rec.images[did].qvec = im.qvec
        mapper.rec.images[did].tvec = im.tvec
        mapper.rec.register_image(did)
    for did in mapper.rec.reg_image_ids:
        n_tri += mapper.triangulate_image(did)
    out = mapper.rec
    os.makedirs(args.output_path, exist_ok=True)
    scene_io.write_model_bin(out, args.output_path)
    print(f"triangulated {n_tri} observations, "
          f"{out.num_points3D()} points -> {args.output_path}")


def cmd_image_undistorter(args):
    """Undistort model (+ export PMVS/CMP-MVS metadata) (ref
    image_undistorter --output_type COLMAP|PMVS|CMP-MVS)."""
    from dagsfm_tpu.scene import exporters, io as scene_io
    from dagsfm_tpu.scene.undistortion import undistort_reconstruction
    rec = scene_io.read_model_bin(args.input_path)
    und = undistort_reconstruction(rec)
    os.makedirs(args.output_path, exist_ok=True)
    if args.output_type == "PMVS":
        exporters.write_pmvs_workspace(und, args.output_path)
    elif args.output_type == "CMP-MVS":
        exporters.write_cmpmvs_workspace(und, args.output_path)
    else:
        sparse = os.path.join(args.output_path, "sparse")
        os.makedirs(sparse, exist_ok=True)
        scene_io.write_model_bin(und, sparse)
    print(f"undistorted -> {args.output_path} ({args.output_type})")


def cmd_model_analyzer(args):
    """Print model statistics (ref model_analyzer / ShowReconInfo)."""
    from dagsfm_tpu.scene import io as scene_io
    rec = scene_io.read_model_bin(args.input_path)
    tr = [len(p.track) for p in rec.points3D.values()]
    mean_tr = float(np.mean(tr)) if tr else 0.0
    obs = int(np.sum(tr)) if tr else 0
    print(json.dumps({
        "num_cameras": len(rec.cameras),
        "num_images": len(rec.images),
        "num_reg_images": rec.num_reg_images(),
        "num_points3D": rec.num_points3D(),
        "num_observations": obs,
        "mean_track_length": round(mean_tr, 3),
        "mean_observations_per_image": round(
            obs / max(rec.num_reg_images(), 1), 3),
        "mean_reprojection_error_px": round(
            rec.compute_mean_reprojection_error(), 4),
    }))


def cmd_model_merger(args):
    """Merge two overlapping models via Sim(3) (ref model_merger)."""
    from dagsfm_tpu.scene import io as scene_io
    from dagsfm_tpu.sfm.aligner import SfMAligner
    rec1 = scene_io.read_model_bin(args.input_path1)
    rec2 = scene_io.read_model_bin(args.input_path2)
    merged = SfMAligner([rec1, rec2]).align()
    os.makedirs(args.output_path, exist_ok=True)
    scene_io.write_model_bin(merged, args.output_path)
    print(f"merged -> {merged.num_reg_images()} images, "
          f"{merged.num_points3D()} points")


def cmd_model_aligner(args):
    """Robust-Sim(3) align a model to reference camera locations from a
    text file `name x y z` (ref model_aligner --ref_images_path)."""
    from dagsfm_tpu.ops import rotations as rops
    from dagsfm_tpu.ops import umeyama
    from dagsfm_tpu.scene import io as scene_io
    rec = scene_io.read_model_bin(args.input_path)
    refs = {}
    with open(args.ref_images_path) as f:
        for line in f:
            p = line.split()
            if len(p) >= 4:
                refs[p[0]] = [float(x) for x in p[1:4]]
    src, dst = [], []
    for iid in rec.reg_image_ids:
        im = rec.images[iid]
        if im.name in refs:
            R = np.asarray(rops.quat_to_rotmat_np(im.qvec))
            src.append(-R.T @ im.tvec)
            dst.append(refs[im.name])
    if len(src) < 3:
        raise SystemExit("need >= 3 reference locations")
    s, R, t = umeyama.umeyama_np(np.stack(src), np.stack(dst),
                                 with_scale=True)
    rec.transform(float(s), np.asarray(R), np.asarray(t))
    os.makedirs(args.output_path, exist_ok=True)
    scene_io.write_model_bin(rec, args.output_path)
    err = np.linalg.norm(
        float(s) * np.stack(src) @ np.asarray(R).T + np.asarray(t)
        - np.stack(dst), axis=1)
    print(f"aligned with {len(src)} refs, mean error "
          f"{err.mean():.4f} -> {args.output_path}")


def cmd_vocab_tree_builder(args):
    """Train a vocab tree from database descriptors (ref
    vocab_tree_builder)."""
    from dagsfm_tpu.features import visual_index as vi
    from dagsfm_tpu.scene.io import ColmapDatabase
    db = ColmapDatabase(args.database_path)
    descs = []
    for iid in db.read_images():
        d = db.read_descriptors(iid)
        if len(d):
            descs.append(np.asarray(d, np.float32))
    db.close()
    train = np.concatenate(descs)
    opts = vi.VocabTreeOptions(branching=args.branching,
                               depth=args.depth)
    tree = vi.build_vocab_tree(train, opts)
    np.savez(args.vocab_tree_path,
             proj=np.asarray(tree.proj),
             thresholds=np.asarray(tree.thresholds),
             **{f"level{k}": np.asarray(l)
                for k, l in enumerate(tree.levels)})
    print(f"vocab tree: {tree.num_words} words from {len(train)} "
          f"descriptors -> {args.vocab_tree_path}")


def cmd_poisson_mesher(args):
    """Fused point cloud -> watertight Poisson mesh (ref colmap.cc
    RunPoissonMesher / mvs/meshing.h:106; here the spectral grid solver,
    mvs/poisson.py)."""
    from dagsfm_tpu.mvs import io as mvs_io
    from dagsfm_tpu.mvs import meshing
    from dagsfm_tpu.mvs.poisson import PoissonOptions, poisson_mesh
    xyz, normals = mvs_io.read_ply_points(args.input_path)
    if normals is None:
        raise SystemExit("poisson_mesher needs a PLY with nx/ny/nz "
                         "normals (run stereo_fusion first)")
    verts, tris = poisson_mesh(
        xyz, normals, PoissonOptions(grid=args.grid, screen=args.screen,
                                     smooth_sigma=args.smooth))
    meshing.write_ply_mesh(args.output_path, verts, tris)
    print(f"poisson mesh: {len(verts)} vertices, {len(tris)} triangles "
          f"-> {args.output_path}")


def cmd_delaunay_mesher(args):
    """Fused point cloud -> Delaunay surface mesh (ref colmap.cc
    RunDelaunayMesher; mvs/meshing.py)."""
    from dagsfm_tpu.mvs import io as mvs_io
    from dagsfm_tpu.mvs import meshing
    xyz, _normals = mvs_io.read_ply_points(args.input_path)
    verts, tris = meshing.delaunay_mesh(
        xyz, meshing.MeshingOptions(max_edge_factor=args.max_edge_factor))
    meshing.write_ply_mesh(args.output_path, verts, tris)
    print(f"delaunay mesh: {len(verts)} vertices, {len(tris)} triangles "
          f"-> {args.output_path}")


def cmd_point_filtering(args):
    """Filter 3D points by track length / reprojection error (ref
    point_filtering)."""
    from dagsfm_tpu.scene import io as scene_io
    rec = scene_io.read_model_bin(args.input_path)
    drop = [pid for pid, pt in rec.points3D.items()
            if len(pt.track) < args.min_track_len
            or (pt.error >= 0 and pt.error > args.max_reproj_error)]
    for pid in drop:
        rec.delete_point3D(pid)
    os.makedirs(args.output_path, exist_ok=True)
    scene_io.write_model_bin(rec, args.output_path)
    print(f"filtered {len(drop)} points, kept {rec.num_points3D()}")


def _load_color_images(image_path: str, names_wanted=None):
    """RGB-load images keyed by file name (for color extraction)."""
    try:
        from PIL import Image
    except ImportError as e:
        raise SystemExit("image loading requires PIL") from e
    out = {}
    exts = {".jpg", ".jpeg", ".png", ".bmp", ".tif", ".tiff"}
    for f in sorted(os.listdir(image_path)):
        if os.path.splitext(f.lower())[1] not in exts:
            continue
        if names_wanted is not None and f not in names_wanted:
            continue
        img = Image.open(os.path.join(image_path, f)).convert("RGB")
        out[f] = np.asarray(img, np.float32) / 255.0
    return out


def _read_model_any(path):
    from dagsfm_tpu.scene import io as scene_io
    if os.path.exists(os.path.join(path, "cameras.bin")):
        return scene_io.read_model_bin(path)
    return scene_io.read_model_text(path)


def cmd_color_extractor(args):
    """Set 3D point colors from source images (ref color_extractor,
    exe/colmap.cc:223-240)."""
    from dagsfm_tpu.scene import io as scene_io
    rec = _read_model_any(args.input_path)
    names = {rec.images[i].name for i in rec.images}
    by_name = _load_color_images(args.image_path, names)
    images = {i: by_name[im.name] for i, im in rec.images.items()
              if im.name in by_name}
    n = rec.extract_colors(images)
    os.makedirs(args.output_path, exist_ok=True)
    scene_io.write_model_bin(rec, args.output_path)
    print(f"colored {n}/{rec.num_points3D()} points")


def cmd_database_merger(args):
    """Merge two databases (ref database_merger, exe/colmap.cc:251-273)."""
    from dagsfm_tpu.scene.io import ColmapDatabase
    if os.path.exists(args.merged_database_path):
        raise SystemExit("ERROR: Merged database file must not exist.")
    db1 = ColmapDatabase(args.database_path1)
    db2 = ColmapDatabase(args.database_path2)
    out = ColmapDatabase(args.merged_database_path)
    ColmapDatabase.merge(db1, db2, out)
    n_img = len(out.read_images())
    n_tvg = out.num_two_view_geometries()
    db1.close(); db2.close(); out.close()
    print(f"merged -> {n_img} images, {n_tvg} two-view geometries")


def cmd_project_generator(args):
    """Write a project .ini with a quality preset applied (ref
    project_generator, exe/colmap.cc:275-303)."""
    from dagsfm_tpu.utils.options import (ProjectOptions,
                                          apply_quality_preset,
                                          save_project)
    opts = ProjectOptions()
    apply_quality_preset(opts, args.quality.lower())
    save_project(opts, args.output_path)
    print(f"project ({args.quality}) -> {args.output_path}")


def cmd_feature_importer(args):
    """Import features from COLMAP text files `<image_name>.txt`
    (header `N 128`, rows `x y scale orient d0..d127`; ref
    feature_importer / FeatureImporter, feature/extraction.cc)."""
    from dagsfm_tpu.scene import cameras as cm
    from dagsfm_tpu.scene.io import ColmapDatabase
    db = ColmapDatabase(args.database_path)
    existing = {name: iid for iid, (name, _) in db.read_images().items()}
    n_img = 0
    for fname in sorted(os.listdir(args.import_path)):
        if not fname.endswith(".txt"):
            continue
        name = fname[:-4]
        rows = np.loadtxt(os.path.join(args.import_path, fname),
                          skiprows=1, ndmin=2)
        if name in existing:
            iid = existing[name]
        else:
            cam = cm.make_simple_camera(len(existing) + n_img + 1,
                                        args.default_width,
                                        args.default_height)
            db.add_camera(cam)
            iid = db.add_image(name, cam.camera_id)
        if rows.size:
            db.add_keypoints(iid, rows[:, :4].astype(np.float32))
            desc = rows[:, 4:132]
            norm = np.linalg.norm(desc, axis=1, keepdims=True)
            desc = np.clip(np.round(desc / np.maximum(norm, 1e-9) * 512),
                           0, 255).astype(np.uint8)
            db.add_descriptors(iid, desc)
        n_img += 1
    db.close()
    print(f"imported features for {n_img} images")


def cmd_image_deleter(args):
    """Deregister images by id/name list (ref image_deleter,
    exe/colmap.cc:462-538)."""
    from dagsfm_tpu.scene import io as scene_io
    rec = _read_model_any(args.input_path)
    n = 0
    if args.image_ids_path:
        with open(args.image_ids_path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                iid = int(line)
                if iid in rec.images and rec.images[iid].registered:
                    rec.deregister_image(iid)
                    n += 1
                else:
                    print(f"WARNING: Skipping image_id={iid}")
    if args.image_names_path:
        by_name = {im.name: i for i, im in rec.images.items()}
        with open(args.image_names_path) as f:
            for line in f:
                name = line.strip()
                if not name:
                    continue
                iid = by_name.get(name)
                if iid is not None and rec.images[iid].registered:
                    rec.deregister_image(iid)
                    n += 1
                else:
                    print(f"WARNING: Skipping image_name={name}")
    os.makedirs(args.output_path, exist_ok=True)
    scene_io.write_model_bin(rec, args.output_path)
    print(f"deleted {n} images")


def cmd_image_filterer(args):
    """Filter images by intrinsics sanity + observation count (ref
    image_filterer, exe/colmap.cc:540-587)."""
    from dagsfm_tpu.scene import io as scene_io
    rec = _read_model_any(args.input_path)
    before = rec.num_reg_images()
    rec.filter_images(args.min_focal_length_ratio,
                      args.max_focal_length_ratio, args.max_extra_param)
    drop = [i for i in rec.reg_image_ids
            if rec.images[i].num_points3D() < args.min_num_observations]
    for iid in drop:
        rec.deregister_image(iid)
    os.makedirs(args.output_path, exist_ok=True)
    scene_io.write_model_bin(rec, args.output_path)
    print(f"Filtered {before - rec.num_reg_images()} images "
          f"from a total of {before} images")


def cmd_image_rectifier(args):
    """Stereo-rectify image pairs from a list file `name1 name2` per line
    (ref image_rectifier, exe/colmap.cc:589-622)."""
    from dagsfm_tpu.ops import rotations as rops
    from dagsfm_tpu.scene.undistortion import (
        rectify_and_undistort_stereo_pair)
    rec = _read_model_any(args.input_path)
    by_name = {im.name: i for i, im in rec.images.items()}
    imgs = _load_color_images(args.image_path)
    os.makedirs(args.output_path, exist_ok=True)
    n = 0
    with open(args.stereo_pairs_list) as f:
        for line in f:
            names = line.split()
            if len(names) != 2:
                continue
            i1, i2 = by_name[names[0]], by_name[names[1]]
            im1, im2 = rec.images[i1], rec.images[i2]
            R1 = np.asarray(rops.quat_to_rotmat_np(im1.qvec))
            R2 = np.asarray(rops.quat_to_rotmat_np(im2.qvec))
            # relative pose 2-from-1
            R12 = R2 @ R1.T
            t12 = im2.tvec - R12 @ im1.tvec
            q12 = np.asarray(rops.rotmat_to_quat_np(R12))
            g1 = np.mean(imgs[names[0]], axis=2)
            g2 = np.mean(imgs[names[1]], axis=2)
            r1, r2, Q = rectify_and_undistort_stereo_pair(
                g1, g2, rec.cameras[im1.camera_id],
                rec.cameras[im2.camera_id], q12, t12)
            stem = f"{os.path.splitext(names[0])[0]}-" \
                   f"{os.path.splitext(names[1])[0]}"
            np.savez(os.path.join(args.output_path, stem + ".npz"),
                     left=r1, right=r2, Q=Q)
            n += 1
    print(f"rectified {n} stereo pairs -> {args.output_path}")


def cmd_image_registrator(args):
    """Register new database images into an existing model WITHOUT
    triangulating new points or BA (ref image_registrator,
    exe/colmap.cc:624-713)."""
    from dagsfm_tpu.pipeline.feature_pipeline import FeaturePipeline
    from dagsfm_tpu.scene import io as scene_io
    from dagsfm_tpu.sfm.incremental_mapper import (IncrementalMapper,
                                                   MapperOptions)
    rec = _read_model_any(args.input_path)
    fp = FeaturePipeline({}, {}, database_path=args.database_path)
    cams, images, graph = fp.load_from_database(args.database_path)
    mapper = IncrementalMapper(cams, images, graph, MapperOptions())
    name_to_db = {im.name: iid for iid, im in images.items()}
    # seed mapper with the existing model (poses + points)
    for iid in rec.reg_image_ids:
        im = rec.images[iid]
        did = name_to_db.get(im.name)
        if did is None:
            continue
        mapper.rec.images[did].qvec = im.qvec
        mapper.rec.images[did].tvec = im.tvec
        mapper.rec.register_image(did)
    for pid, pt in rec.points3D.items():
        track = []
        for (iid, kp) in pt.track:
            did = name_to_db.get(rec.images[iid].name)
            if did is not None and mapper.rec.images[did].registered:
                track.append((did, kp))
        if len(track) >= 2:
            new_pid = mapper.rec.add_point3D(pt.xyz, track,
                                             color=pt.color,
                                             error=pt.error)
            for (did, kp) in track:
                mapper.rec.images[did].point3D_ids[kp] = new_pid
    n = 0
    for did in sorted(mapper.rec.images):
        if mapper.rec.images[did].registered:
            continue
        if mapper.register_next_image(did):
            n += 1
    os.makedirs(args.output_path, exist_ok=True)
    scene_io.write_model_bin(mapper.rec, args.output_path)
    print(f"registered {n} new images "
          f"({mapper.rec.num_reg_images()} total)")


def cmd_model_orientation_aligner(args):
    """Align the model's coordinate frame to gravity / Manhattan axes
    (ref model_orientation_aligner, exe/colmap.cc:1315-1381)."""
    from dagsfm_tpu.estimation import coordinate_frame as cf
    from dagsfm_tpu.scene import io as scene_io
    rec = _read_model_any(args.input_path)
    method = args.method.lower()
    if method == "image-orientation":
        gravity = cf.estimate_gravity_vector_from_image_orientation(rec)
        tform = cf.rotation_from_unit_vectors(gravity, [0, 1, 0])
    elif method == "manhattan-world":
        names = {rec.images[i].name for i in rec.images}
        by_name = _load_color_images(args.image_path, names)
        images = {i: np.mean(by_name[im.name], axis=2)
                  for i, im in rec.images.items() if im.name in by_name}
        opts = cf.ManhattanOptions(max_image_size=args.max_image_size)
        frame = cf.estimate_manhattan_world_frame(rec, images, opts)
        tform = cf.align_to_manhattan_world(rec, frame)
    else:
        raise SystemExit("ERROR: Invalid `method` - supported values are "
                         "'MANHATTAN-WORLD' or 'IMAGE-ORIENTATION'.")
    rec.transform(1.0, np.asarray(tform, float), np.zeros(3))
    os.makedirs(args.output_path, exist_ok=True)
    scene_io.write_model_bin(rec, args.output_path)
    print(f"aligned ({method}) -> {args.output_path}")


def cmd_rig_bundle_adjuster(args):
    """Rig-constrained global BA (ref rig_bundle_adjuster,
    exe/colmap.cc:1713-1758)."""
    from dagsfm_tpu.scene import camera_rig as crig
    from dagsfm_tpu.scene import io as scene_io
    from dagsfm_tpu.sfm import rig_bundle_adjustment as rba
    rec = _read_model_any(args.input_path)
    rigs = crig.read_rig_config(args.rig_config_path, rec)
    for k, rig in enumerate(rigs):
        print(f"Camera Rig {k + 1}: {rig.num_cameras} cameras, "
              f"{rig.num_snapshots} snapshots")
    prob, meta = crig.make_rig_ba_problem(rec, rigs)
    out = rba.solve(prob, rba.RigBAOptions(
        max_iterations=args.max_num_iterations,
        refine_relative_poses=bool(args.refine_relative_poses)))
    crig.apply_rig_ba_result(rec, rigs, out, meta)
    os.makedirs(args.output_path, exist_ok=True)
    scene_io.write_model_bin(rec, args.output_path)
    print(f"rig BA cost {float(out.initial_cost):.2f} -> "
          f"{float(out.final_cost):.2f}")


def cmd_spatial_matcher(args):
    """Match images by location priors (ref spatial_matcher; GPS/prior
    kNN pair generation, feature/matching.h:466)."""
    from dagsfm_tpu.features.retrieval import spatial_pairs
    from dagsfm_tpu.pipeline.feature_pipeline import (
        load_features_from_database, run_matcher_on_database)
    from dagsfm_tpu.utils import gps
    *_, priors = load_features_from_database(args.database_path)
    if not priors:
        raise SystemExit("no location priors in database")
    ids = sorted(priors)
    loc = np.stack([priors[i] for i in ids])
    if args.is_gps:
        loc = gps.ell_to_enu(loc)
    pairs = [(i, j) for (i, j, _) in spatial_pairs(
        ids, loc, max_num_neighbors=args.max_num_neighbors,
        max_distance=args.max_distance)]
    n = run_matcher_on_database(args.database_path, pairs)
    print(f"spatial matching: {n}/{len(pairs)} pairs verified")


def cmd_transitive_matcher(args):
    """Match transitive-closure pairs of already-matched images (ref
    transitive_matcher, feature/matching.h:486)."""
    from dagsfm_tpu.features.retrieval import transitive_pairs
    from dagsfm_tpu.pipeline.feature_pipeline import (
        load_features_from_database, run_matcher_on_database)
    *_, matched, priors = load_features_from_database(args.database_path)
    total = 0
    for _ in range(args.num_iterations):
        pairs = transitive_pairs(matched, num_iterations=1,
                                 batch_size=args.batch_size)
        pairs = [(i, j) for (i, j, *_r) in pairs] \
            if pairs and len(pairs[0]) > 2 else pairs
        if not pairs:
            break
        n = run_matcher_on_database(args.database_path, pairs)
        total += n
        matched = matched + [(i, j) for (i, j) in pairs]
    print(f"transitive matching: {total} new pairs verified")


def cmd_vocab_tree_retriever(args):
    """Rank database images against query images via the vocab-tree
    index (ref vocab_tree_retriever, exe/colmap.cc:1939-2037)."""
    from dagsfm_tpu.features import visual_index as vi
    from dagsfm_tpu.scene.io import ColmapDatabase
    data = np.load(args.vocab_tree_path)
    levels = []
    k = 0
    while f"level{k}" in data:
        levels.append(data[f"level{k}"])
        k += 1
    tree = vi.VocabTree(levels=tuple(levels), proj=data["proj"],
                        thresholds=data["thresholds"])
    index = vi.VisualIndex(tree)
    db = ColmapDatabase(args.database_path)
    imgs = db.read_images()
    for iid in sorted(imgs):
        d = db.read_descriptors(iid).astype(np.float32) / 512.0
        kp = db.read_keypoints(iid)
        if len(d):
            index.add(iid, d, kp[:, :2])
    db.close()
    for qid in sorted(imgs):
        ranked = index.query(qid, num_images=args.num_images)
        top = ", ".join(f"{imgs[i][0]}({s:.3f})" for i, s in
                        ranked[: args.num_images])
        print(f"{imgs[qid][0]}: {top}")


def cmd_synthetic_scene(args):
    from dagsfm_tpu.scene import io as scene_io
    from dagsfm_tpu.scene import synthetic
    spec = synthetic.SyntheticSceneSpec(
        num_cameras=args.num_cameras, num_points=args.num_points,
        pixel_noise=args.pixel_noise, seed=args.seed)
    sc = synthetic.generate(spec)
    rec = synthetic.to_reconstruction(sc)
    os.makedirs(args.output_path, exist_ok=True)
    scene_io.write_model_bin(rec, args.output_path)
    print(json.dumps({"num_cameras": args.num_cameras,
                      "num_points": args.num_points,
                      "output": args.output_path}))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="dagsfm_tpu",
        description="TPU-native distributed Structure-from-Motion")
    sub = p.add_subparsers(dest="command", required=True)

    def add(name, fn, flags):
        sp = sub.add_parser(name)
        for f, kw in flags:
            sp.add_argument(f, **kw)
        sp.set_defaults(func=fn)
        return sp

    # --ImageReader.* parity flags (ref image_reader.h:64-83)
    image_reader_flags = [
        ("--camera_model", dict(default="SIMPLE_RADIAL")),
        ("--single_camera", dict(type=int, default=0)),
        ("--camera_params", dict(default="")),
        ("--default_focal_length_factor", dict(type=float, default=1.2)),
    ]

    add("feature_extractor", cmd_feature_extractor, [
        ("--image_path", dict(required=True)),
        ("--database_path", dict(required=True)),
        ("--max_num_features", dict(type=int, default=8192)),
        ("--first_octave", dict(type=int, default=-1)),
        ("--num_octaves", dict(type=int, default=0)),
        ("--max_image_size", dict(type=int, default=3200)),
    ] + image_reader_flags)
    for name, fn in (("exhaustive_matcher", cmd_exhaustive_matcher),
                     ("sequential_matcher", cmd_sequential_matcher),
                     ("vocab_tree_matcher", cmd_vocab_tree_matcher),
                     ("global_matcher", cmd_global_matcher)):
        add(name, fn, [
            ("--image_path", dict(required=True)),
            ("--database_path", dict(required=True)),
        ] + image_reader_flags)
    add("mapper", cmd_mapper, [
        ("--database_path", dict(required=True)),
        ("--output_path", dict(required=True)),
    ])
    add("distributed_mapper", cmd_distributed_mapper, [
        ("--database_path", dict(required=True)),
        ("--output_path", dict(required=True)),
        ("--num_images_ub", dict(type=int, default=100)),
        ("--completeness_ratio", dict(type=float, default=0.5)),
        ("--relax_ratio", dict(type=float, default=1.3)),
        ("--image_overlap", dict(type=int, default=50)),
        ("--cluster_type", dict(default="SPECTRAL")),
        ("--distributed", dict(type=int, default=0)),
        ("--retriangulate", dict(type=int, default=0)),
        ("--final_ba", dict(type=int, default=1)),
    ])
    add("sfm_aligner", cmd_sfm_aligner, [
        ("--input_path", dict(required=True)),
        ("--output_path", dict(required=True)),
    ])
    add("bundle_adjuster", cmd_bundle_adjuster, [
        ("--input_path", dict(required=True)),
        ("--output_path", dict(required=True)),
        ("--max_num_iterations", dict(type=int, default=50)),
    ])
    add("model_converter", cmd_model_converter, [
        ("--input_path", dict(required=True)),
        ("--output_path", dict(required=True)),
        ("--output_type", dict(default="TXT")),
    ])
    add("automatic_reconstructor", cmd_automatic_reconstructor, [
        ("--image_path", dict(required=True)),
        ("--workspace_path", dict(required=True)),
    ] + image_reader_flags)
    add("synthetic_scene", cmd_synthetic_scene, [
        ("--output_path", dict(required=True)),
        ("--num_cameras", dict(type=int, default=20)),
        ("--num_points", dict(type=int, default=500)),
        ("--pixel_noise", dict(type=float, default=0.5)),
        ("--seed", dict(type=int, default=0)),
    ])
    add("local_sfm_worker", cmd_local_sfm_worker, [
        ("--database_path", dict(required=True)),
        ("--work_dir", dict(required=True)),
        ("--host_id", dict(type=int, default=0)),
        ("--lease_timeout", dict(type=float, default=3600.0)),
    ])
    add("local_matching_worker", cmd_local_matching_worker, [
        ("--image_path", dict(required=True)),
        ("--work_dir", dict(required=True)),
        ("--host_id", dict(type=int, default=0)),
        ("--focal", dict(type=float, default=-1.0)),
        ("--batch_size", dict(type=int, default=4)),
        ("--max_num_features", dict(type=int, default=1024)),
        ("--guided_matching", dict(action="store_true")),
        ("--lease_timeout", dict(type=float, default=3600.0)),
    ])
    add("database_creator", cmd_database_creator, [
        ("--database_path", dict(required=True)),
    ])
    add("matches_importer", cmd_matches_importer, [
        ("--database_path", dict(required=True)),
        ("--match_list_path", dict(required=True)),
    ])
    add("point_triangulator", cmd_point_triangulator, [
        ("--database_path", dict(required=True)),
        ("--input_path", dict(required=True)),
        ("--output_path", dict(required=True)),
    ])
    add("image_undistorter", cmd_image_undistorter, [
        ("--input_path", dict(required=True)),
        ("--output_path", dict(required=True)),
        ("--output_type", dict(default="COLMAP")),
    ])
    add("model_analyzer", cmd_model_analyzer, [
        ("--input_path", dict(required=True)),
    ])
    add("model_merger", cmd_model_merger, [
        ("--input_path1", dict(required=True)),
        ("--input_path2", dict(required=True)),
        ("--output_path", dict(required=True)),
    ])
    add("model_aligner", cmd_model_aligner, [
        ("--input_path", dict(required=True)),
        ("--ref_images_path", dict(required=True)),
        ("--output_path", dict(required=True)),
    ])
    add("vocab_tree_builder", cmd_vocab_tree_builder, [
        ("--database_path", dict(required=True)),
        ("--vocab_tree_path", dict(required=True)),
        ("--branching", dict(type=int, default=8)),
        ("--depth", dict(type=int, default=2)),
    ])
    add("point_filtering", cmd_point_filtering, [
        ("--input_path", dict(required=True)),
        ("--output_path", dict(required=True)),
        ("--min_track_len", dict(type=int, default=2)),
        ("--max_reproj_error", dict(type=float, default=4.0)),
    ])
    add("poisson_mesher", cmd_poisson_mesher, [
        ("--input_path", dict(required=True)),
        ("--output_path", dict(required=True)),
        ("--grid", dict(type=int, default=128)),
        ("--screen", dict(type=float, default=4.0)),
        ("--smooth", dict(type=float, default=1.0)),
    ])
    add("delaunay_mesher", cmd_delaunay_mesher, [
        ("--input_path", dict(required=True)),
        ("--output_path", dict(required=True)),
        ("--max_edge_factor", dict(type=float, default=3.0)),
    ])
    add("color_extractor", cmd_color_extractor, [
        ("--image_path", dict(required=True)),
        ("--input_path", dict(required=True)),
        ("--output_path", dict(required=True)),
    ])
    add("database_merger", cmd_database_merger, [
        ("--database_path1", dict(required=True)),
        ("--database_path2", dict(required=True)),
        ("--merged_database_path", dict(required=True)),
    ])
    add("project_generator", cmd_project_generator, [
        ("--output_path", dict(required=True)),
        ("--quality", dict(default="high")),
    ])
    add("feature_importer", cmd_feature_importer, [
        ("--database_path", dict(required=True)),
        ("--import_path", dict(required=True)),
        ("--default_width", dict(type=int, default=1024)),
        ("--default_height", dict(type=int, default=768)),
    ])
    add("image_deleter", cmd_image_deleter, [
        ("--input_path", dict(required=True)),
        ("--output_path", dict(required=True)),
        ("--image_ids_path", dict(default="")),
        ("--image_names_path", dict(default="")),
    ])
    add("image_filterer", cmd_image_filterer, [
        ("--input_path", dict(required=True)),
        ("--output_path", dict(required=True)),
        ("--min_focal_length_ratio", dict(type=float, default=0.1)),
        ("--max_focal_length_ratio", dict(type=float, default=10.0)),
        ("--max_extra_param", dict(type=float, default=100.0)),
        ("--min_num_observations", dict(type=int, default=10)),
    ])
    add("image_rectifier", cmd_image_rectifier, [
        ("--image_path", dict(required=True)),
        ("--input_path", dict(required=True)),
        ("--output_path", dict(required=True)),
        ("--stereo_pairs_list", dict(required=True)),
    ])
    add("image_registrator", cmd_image_registrator, [
        ("--database_path", dict(required=True)),
        ("--input_path", dict(required=True)),
        ("--output_path", dict(required=True)),
    ])
    add("model_orientation_aligner", cmd_model_orientation_aligner, [
        ("--image_path", dict(default="")),
        ("--input_path", dict(required=True)),
        ("--output_path", dict(required=True)),
        ("--method", dict(default="MANHATTAN-WORLD")),
        ("--max_image_size", dict(type=int, default=1024)),
    ])
    add("rig_bundle_adjuster", cmd_rig_bundle_adjuster, [
        ("--input_path", dict(required=True)),
        ("--output_path", dict(required=True)),
        ("--rig_config_path", dict(required=True)),
        ("--max_num_iterations", dict(type=int, default=50)),
        ("--refine_relative_poses", dict(type=int, default=1)),
    ])
    add("spatial_matcher", cmd_spatial_matcher, [
        ("--database_path", dict(required=True)),
        ("--max_num_neighbors", dict(type=int, default=50)),
        ("--max_distance", dict(type=float, default=100.0)),
        ("--is_gps", dict(type=int, default=0)),
    ])
    add("transitive_matcher", cmd_transitive_matcher, [
        ("--database_path", dict(required=True)),
        ("--batch_size", dict(type=int, default=1000)),
        ("--num_iterations", dict(type=int, default=3)),
    ])
    add("vocab_tree_retriever", cmd_vocab_tree_retriever, [
        ("--database_path", dict(required=True)),
        ("--vocab_tree_path", dict(required=True)),
        ("--num_images", dict(type=int, default=10)),
    ])
    return p


def main(argv=None):
    # persistent compile cache: lease workers and repeated CLI stages are
    # fresh processes that would otherwise re-pay every jit compile
    from dagsfm_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    args = build_parser().parse_args(argv)
    args.func(args)


if __name__ == "__main__":
    main()
