"""dagsfm_tpu — a TPU-native distributed Structure-from-Motion framework.

A from-scratch re-design of the capabilities of DAGSfM/GraphSfM
(graph-partitioned distributed incremental SfM on top of COLMAP) for TPU
hardware: batched array programs under `jax.jit`, Pallas kernels for the hot
ops, and `jax.sharding`/`shard_map` over device meshes in place of the
reference's thread-pipelines and msgpack-RPC map-reduce.

Layer map (mirrors reference layers L1-L10, see SURVEY.md):
  utils/       — timers, logging, rng, options            (ref src/util)
  ops/         — batched geometry kernels: rotations, projection,
                 triangulation, minimal solvers, RANSAC    (ref src/estimators, src/optim)
  solvers/     — L1/ADMM/QP/CG/IRLS linear solvers         (ref src/solver, src/math)
  scene/       — cameras, images, points, tracks, reconstruction,
                 COLMAP-compatible I/O, synthetic scenes   (ref src/base)
  features/    — SIFT extraction, matching, verification,
                 retrieval                                 (ref src/feature, src/retrieval)
  graph/       — view graph, union-find, similarity graph  (ref src/graph)
  clustering/  — spectral / community / ncut partitioning,
                 cut-and-expand driver                     (ref src/clustering)
  estimation/  — global rotation averaging + filters       (ref src/rotation_estimation)
  sfm/         — incremental mapper, triangulator, bundle
                 adjustment, track selection, aligner      (ref src/sfm, src/controllers)
  parallel/    — meshes, sharded BA, cluster scheduling    (ref src/map_reduce)
  pipeline/    — top-level controllers + CLI               (ref src/controllers, src/exe)
"""

__version__ = "0.1.0"
