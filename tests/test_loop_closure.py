"""Sequential-matcher loop closure (ref SequentialFeatureMatcher,
matching.h:427-448): vocab-retrieval queries every loop_detection_period
frames add loop edges that plain temporal-overlap pairing misses, and
rotation averaging uses them to close accumulated drift."""
import numpy as np

from dagsfm_tpu.estimation import rotation_averaging as ra
from dagsfm_tpu.features import retrieval as rt


def _ring_descriptors(n_images=24, n_points=400, n_vis=60, dim=32,
                      seed=0):
    """Synthetic BoW-ready descriptors: each image sees a contiguous
    window of ring points; descriptor of a keypoint = the point's fixed
    random vector + noise, so BoW similarity ~ covisibility."""
    rng = np.random.default_rng(seed)
    point_desc = rng.normal(size=(n_points, dim)).astype(np.float32)
    point_desc /= np.linalg.norm(point_desc, axis=1, keepdims=True)
    descs, masks = {}, {}
    for i in range(n_images):
        c = int(i / n_images * n_points)
        idx = (np.arange(c - n_vis // 2, c + n_vis // 2) % n_points)
        d = point_desc[idx] + 0.05 * rng.normal(size=(len(idx), dim))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        descs[i + 1] = d.astype(np.float32)
        masks[i + 1] = np.ones(len(idx), bool)
    return descs, masks


def test_loop_detection_finds_ring_closure():
    descs, masks = _ring_descriptors()
    ids = sorted(descs)
    plain = rt.sequential_pairs(ids, overlap=2)
    with_loops = rt.sequential_pairs(
        ids, overlap=2, loop_detection_period=4,
        loop_detection_num_images=3, descriptors=descs, masks=masks,
        retrieval_opts=rt.RetrievalOptions(vocab_size=64),
        seed=0)
    plain_set = {(i, j) for (i, j, _) in plain}
    loop_edges = [(i, j) for (i, j, _) in with_loops
                  if (i, j) not in plain_set]
    assert loop_edges, "no loop edges proposed"
    # the sequence-end closure (image 1 against the last frames) found
    closure = [e for e in loop_edges if e[0] <= 2 and e[1] >= len(ids) - 1]
    assert closure, f"ring closure missed: {loop_edges}"


def test_loop_edges_close_ra_drift():
    """Chain-with-drift vs chain+loop-edge: RA error drops when the
    closure edge is present (the mechanism loop detection feeds)."""
    from dagsfm_tpu.ops import rotations as rops
    import jax.numpy as jnp

    n = 24
    rng = np.random.default_rng(1)
    # GT: ring of rotations about z
    Rg = np.stack([np.asarray(rops.quat_to_rotmat_np(np.array(
        [np.cos(np.pi * i / n), 0, 0, np.sin(np.pi * i / n)])))
        for i in range(n)])

    def rel(i, j, noise):
        R = Rg[j] @ Rg[i].T
        aa = rng.normal(0, noise, 3)
        Rn = np.asarray(rops.quat_to_rotmat_np(np.asarray(
            rops.angleaxis_to_quat(jnp.asarray(aa)))))
        return Rn @ R

    # temporal chain with consistent drift bias
    bias = np.array([0.0, 0.0, 0.015])
    chain_edges = [(i, i + 1) for i in range(n - 1)]
    chain_rel = []
    for (i, j) in chain_edges:
        R = Rg[j] @ Rg[i].T
        Rb = np.asarray(rops.quat_to_rotmat_np(np.asarray(
            rops.angleaxis_to_quat(jnp.asarray(
                bias + rng.normal(0, 0.002, 3))))))
        chain_rel.append(Rb @ R)

    def ra_error(edges, rels):
        R_est = ra.estimate_rotations(
            n, np.array(edges, np.int32), np.stack(rels))
        R_al = ra.align_rotations(R_est, Rg)
        errs = []
        for k in range(n):
            dR = R_al[k] @ Rg[k].T
            errs.append(np.degrees(np.arccos(
                np.clip((np.trace(dR) - 1) / 2, -1, 1))))
        return float(np.mean(errs))

    err_chain = ra_error(chain_edges, chain_rel)
    # + the loop edges a period-4 vocab query would add (long-range,
    # low-noise) — one lone closure edge would be voted down as an
    # outlier by 23 consistently-biased chain edges, which is exactly
    # why loop detection adds MANY of them
    loop_edges = list(chain_edges)
    loop_rels = list(chain_rel)
    for a in range(0, n, 4):
        b = (a + n // 2) % n
        i, j = min(a, b), max(a, b)
        loop_edges.append((i, j))
        loop_rels.append(rel(i, j, 0.002))
    err_loop = ra_error(loop_edges, loop_rels)
    assert err_loop < err_chain * 0.5, (err_chain, err_loop)
