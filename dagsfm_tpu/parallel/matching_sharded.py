"""Device-sharded pair matching: shard_map over the local TPU mesh.

TPU-native counterpart of the reference's multi-GPU matcher fan-out (one
SiftGPU matcher thread per gpu_index, feature/matching.cc:610-647 —
SURVEY.md P5): instead of threads + GPU contexts, the pair batch is
sharded over the device mesh and every chip runs the same batched
descriptor-matmul matcher on its shard. No host involvement between
pairs; results gather back as one array.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from dagsfm_tpu.features.matching import MatchingOptions, match_pair_batch
from dagsfm_tpu.parallel.mesh import make_mesh


def match_pairs_sharded(descriptors: dict, masks: dict, pairs: list,
                        opts: MatchingOptions = MatchingOptions(),
                        mesh: Mesh | None = None) -> dict:
    """Match image pairs with the pair axis sharded over the mesh.

    descriptors: image_id -> (K, 128) normalized float; masks: image_id
    -> (K,) bool. All images must share K. Returns
    pair -> (M, 2) uint32, like features.matching.match_pairs.
    """
    if not pairs:
        return {}
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    B = len(pairs)
    pad = (-B) % n_dev
    padded = pairs + [pairs[-1]] * pad

    d1 = jnp.asarray(np.stack([descriptors[i] for (i, _) in padded]))
    d2 = jnp.asarray(np.stack([descriptors[j] for (_, j) in padded]))
    m1 = jnp.asarray(np.stack([masks[i] for (i, _) in padded]))
    m2 = jnp.asarray(np.stack([masks[j] for (_, j) in padded]))

    @jax.jit
    def run(d1, d2, m1, m2):
        fn = shard_map(
            lambda a, b, c, d: match_pair_batch(a, b, c, d, opts),
            mesh=mesh,
            in_specs=(P("d"), P("d"), P("d"), P("d")),
            out_specs=(P("d"), P("d")))
        return fn(d1, d2, m1, m2)

    matches, counts = run(d1, d2, m1, m2)
    matches = np.asarray(matches)
    out = {}
    for k in range(B):
        m = matches[k]
        m = m[m[:, 0] >= 0][: opts.max_num_matches]
        out[padded[k]] = m.astype(np.uint32)
    return out
