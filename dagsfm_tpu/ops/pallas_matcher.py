"""Pallas TPU kernel: fused descriptor matching (matmul + streaming top-2).

TPU-native replacement for the SiftGPU CUDA matcher
(/root/reference/lib/SiftGPU + feature/matching.cc GPU paths). The XLA
matcher (features/matching.py) materializes the (K1, K2) similarity
matrix in HBM before top_k; this kernel streams d2 tiles through VMEM,
does the (TILE, 128) x (128, TILE) products on the MXU and keeps only the
running (best, second, argbest) per query row — HBM traffic drops from
O(K1*K2) to O((K1+K2)*D + K1), which is the speed-of-light bound for the
ratio-test matcher.

Grid: one program per TILE rows of d1; inner fori_loop walks d2 tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128
DESC_DIM = 128


def _matcher_kernel(d1_ref, d2_ref, best_ref, second_ref, idx_ref):
    """d1_ref (TILE, D) VMEM block; d2_ref (K2, D) VMEM (whole)."""
    K2 = d2_ref.shape[0]
    num_tiles = K2 // TILE

    d1 = d1_ref[:]                                        # (TILE, D)

    def body(t, carry):
        best, second, bidx = carry
        d2t = d2_ref[pl.ds(t * TILE, TILE), :]            # (TILE, D)
        sim = jax.lax.dot_general(
            d1, d2t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # (TILE, TILE)
        tile_best = jnp.max(sim, axis=1)
        tile_arg = jnp.argmax(sim, axis=1).astype(jnp.int32) + t * TILE
        # second-best within tile: mask out the argmax column
        cols = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1)
        masked = jnp.where(cols == (tile_arg[:, None] - t * TILE),
                           -jnp.inf, sim)
        tile_second = jnp.max(masked, axis=1)

        # merge running top-2 with tile top-2: the second best of
        # (old top2 ∪ tile top2) is max(best, tile_second) when the tile
        # wins, else max(tile_best, second)
        new_best = jnp.maximum(best, tile_best)
        new_idx = jnp.where(tile_best > best, tile_arg, bidx)
        new_second = jnp.where(tile_best >= best,
                               jnp.maximum(best, tile_second),
                               jnp.maximum(tile_best, second))
        return new_best, new_second, new_idx

    init = (jnp.full((TILE,), -jnp.inf, jnp.float32),
            jnp.full((TILE,), -jnp.inf, jnp.float32),
            jnp.zeros((TILE,), jnp.int32))
    best, second, bidx = jax.lax.fori_loop(0, num_tiles, body, init)
    best_ref[:, 0] = best
    second_ref[:, 0] = second
    idx_ref[:, 0] = bidx


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_top2(d1: jax.Array, d2: jax.Array, interpret: bool = False):
    """Top-2 similarity per row of d1 against all of d2.

    d1 (K1, 128), d2 (K2, 128) float32 (L2-normalized); K1, K2 must be
    multiples of 128. Returns (best (K1,), second (K1,), idx (K1,)).
    """
    K1 = d1.shape[0]
    nt = K1 // TILE
    grid = (nt,)
    # outputs are (K1, 1) column vectors: block (TILE, 1) keeps the
    # second-to-last dim 8-aligned and the last dim equal to the array's
    best, second, idx = pl.pallas_call(
        _matcher_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, DESC_DIM), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((K1, 1), jnp.float32),
            jax.ShapeDtypeStruct((K1, 1), jnp.float32),
            jax.ShapeDtypeStruct((K1, 1), jnp.int32),
        ],
        interpret=interpret,
    )(d1.astype(jnp.float32), d2.astype(jnp.float32))
    return best.reshape(K1), second.reshape(K1), idx.reshape(K1)


# ---------------------------------------------------------------------------
# Batched kernel: grid over pairs, ONE pass per pair computing the forward
# running top-2 AND the reverse argmax (cross-check) from the same MXU
# tiles. The (K, K) similarity matrix never touches HBM — per pair the
# traffic is 2*K*D descriptor reads + 4*K scalars out, vs the XLA path's
# K*K score materialization (the round-3 single-pair kernel additionally
# paid one dispatch per pair AND a second full pass for the reverse
# direction; both are gone here).
# ---------------------------------------------------------------------------

VMEM_BUDGET_BYTES = 15 * 1024 * 1024   # Mosaic scoped-vmem limit is 16M


def _vmem_estimate(K: int, tile_j: int) -> int:
    """Per-grid-step scoped-VMEM bytes for _batch_matcher_kernel.

    Affine model FIT TO MOSAIC'S OWN OOM REPORTS on v5e (the compiler
    prints the exact scoped allocation it attempts): 18.24M at
    (K=2048, TILE_J=1024) and 20.67M at (K=4096, TILE_J=128) give
    ~1.15x the (K, TILE_J) f32 score block plus ~4.7 KiB per K row
    (double-buffered bf16 descriptor blocks, f32 conversions, loop
    carries, masks, outputs). Rounded up for safety. In practice this
    admits K <= 2048 (K=1024 -> j-tile 1024, K=2048 -> 512) and routes
    larger K to the XLA matcher."""
    return int(1.2 * K * tile_j * 4) + 4864 * K


def _pick_tile(K: int) -> int:
    """Largest MXU-friendly j-tile dividing K THAT FITS VMEM (bigger
    tiles amortize the per-tile loop overhead; measured 256->1024 halves
    device time at K=1024 — but the (K, TILE_J) f32 score block must
    stay inside the ~16 MiB/core budget, so large K forces small
    tiles)."""
    for t in (1024, 512, 256, 128):
        if K % t == 0 and _vmem_estimate(K, t) <= VMEM_BUDGET_BYTES:
            return t
    raise ValueError(
        f"K={K}: no 128-multiple tile fits the VMEM budget "
        f"(use pallas_batch_supported to gate)")


def pallas_batch_supported(K: int) -> bool:
    """True if the batched kernel can run at this descriptor count: K a
    multiple of 128 and some j-tile keeps the kernel under the VMEM
    budget. features.matching uses this to gate the TPU auto-enable and
    fall back to the XLA matcher otherwise."""
    if K < 128 or K % 128 != 0:
        return False
    return _vmem_estimate(K, 128) <= VMEM_BUDGET_BYTES


def _batch_matcher_kernel(TILE_J, d1_ref, d2_ref, m1_ref, m2_ref,
                          best_ref, second_ref, idx_ref, rev_ref):
    """One grid step = one pair. d1/d2 (1, K, D) bf16 VMEM blocks;
    m1/m2 (1, K, 1) float32 (trailing singleton satisfies the TPU
    (sublane, lane) block tiling rule). Outputs (1, K, 1): forward
    best/second/argbest and reverse argmax (best row per column)."""
    K = d1_ref.shape[1]
    nt = K // TILE_J
    d1 = d1_ref[0]                                        # (K, D) bf16
    m1 = m1_ref[0, :, 0]                                  # (K,) f32
    neg = jnp.float32(-jnp.inf)

    def body(t, carry):
        best, second, bidx = carry
        d2t = d2_ref[0, pl.ds(t * TILE_J, TILE_J), :]     # (TILE_J, D)
        sim = jax.lax.dot_general(
            d1, d2t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # (K, TILE_J)
        m2t = m2_ref[0, pl.ds(t * TILE_J, TILE_J), 0]     # (TILE_J,)
        valid = (m1[:, None] > 0) & (m2t[None, :] > 0)
        sim = jnp.where(valid, sim, neg)
        tile_best = jnp.max(sim, axis=1)
        targ = jnp.argmax(sim, axis=1).astype(jnp.int32)
        cols = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1)
        tile_second = jnp.max(
            jnp.where(cols == targ[:, None], neg, sim), axis=1)
        # reverse direction falls out of the same tile: best ROW per
        # column j, written directly to this tile's output slice
        rev_ref[0, pl.ds(t * TILE_J, TILE_J), 0] = \
            jnp.argmax(sim, axis=0).astype(jnp.int32)
        targ_glob = targ + t * TILE_J
        new_best = jnp.maximum(best, tile_best)
        new_idx = jnp.where(tile_best > best, targ_glob, bidx)
        new_second = jnp.where(tile_best >= best,
                               jnp.maximum(best, tile_second),
                               jnp.maximum(tile_best, second))
        return new_best, new_second, new_idx

    init = (jnp.full((K,), neg, jnp.float32),
            jnp.full((K,), neg, jnp.float32),
            jnp.zeros((K,), jnp.int32))
    best, second, bidx = jax.lax.fori_loop(0, nt, body, init)
    best_ref[0, :, 0] = best
    second_ref[0, :, 0] = second
    idx_ref[0, :, 0] = bidx


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_top2_batch(d1, d2, m1, m2, interpret: bool = False):
    """Batched fused top-2 + reverse-argmax.

    d1, d2 (B, K, 128) float (cast to bf16 for the MXU; f32 accumulate —
    borderline ratio-test decisions can differ from the f32 XLA matcher
    by the bf16 rounding of the similarity inputs); m1, m2 (B, K) bool.
    K multiple of 128 with a j-tile under the VMEM budget (gate with
    pallas_batch_supported). Returns (best, second, idx, rev_idx) each
    (B, K)."""
    import functools as _ft
    B, K, D = d1.shape
    outs = pl.pallas_call(
        _ft.partial(_batch_matcher_kernel, _pick_tile(K)),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, K, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, K, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(4)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, K, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, K, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, K, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, K, 1), jnp.int32),
        ],
        interpret=interpret,
    )(d1.astype(jnp.bfloat16), d2.astype(jnp.bfloat16),
      m1.astype(jnp.float32)[..., None], m2.astype(jnp.float32)[..., None])
    return tuple(o[..., 0] for o in outs)


def _fused_matcher_kernel(TILE_J, max_ratio, max_distance, cross_check,
                          d1_ref, d2_ref, m1_ref, m2_ref, j_ref):
    """Fully-fused variant: ratio test AND mutual cross-check INSIDE the
    kernel, emitting only the (1, K, 1) int32 j-index (-1 = no match).

    The mutual check is gather-free: each column belongs to exactly one
    j-tile, so the tile's own column-argmax IS the global reverse
    winner; a row is mutual iff, in the tile that produced its forward
    best, the (row == column-argmax) and (column == row-argmax)
    indicator matrices intersect on its row. The XLA-side
    take_along_axis formulation of the same check cost ~6 ms per
    256-pair batch — TPU gathers again — which DOUBLED the wrapper time
    over the kernel itself."""
    K = d1_ref.shape[1]
    nt = K // TILE_J
    d1 = d1_ref[0]
    m1 = m1_ref[0, :, 0]
    neg = jnp.float32(-jnp.inf)

    def body(t, carry):
        best, second, bidx, mutual = carry
        d2t = d2_ref[0, pl.ds(t * TILE_J, TILE_J), :]
        sim = jax.lax.dot_general(
            d1, d2t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        m2t = m2_ref[0, pl.ds(t * TILE_J, TILE_J), 0]
        valid = (m1[:, None] > 0) & (m2t[None, :] > 0)
        sim = jnp.where(valid, sim, neg)
        tile_best = jnp.max(sim, axis=1)
        targ = jnp.argmax(sim, axis=1).astype(jnp.int32)
        cols = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1)
        is_best_col = cols == targ[:, None]
        tile_second = jnp.max(jnp.where(is_best_col, neg, sim), axis=1)
        if cross_check:
            rev_tile = jnp.argmax(sim, axis=0).astype(jnp.int32)  # (T,)
            rows = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 0)
            # int32 carry: Mosaic cannot select on an i1 loop carry
            tile_mutual = jnp.any(
                is_best_col & (rows == rev_tile[None, :]),
                axis=1).astype(jnp.int32)
        else:
            tile_mutual = jnp.ones((K,), jnp.int32)
        win = tile_best > best
        return (jnp.maximum(best, tile_best),
                jnp.where(tile_best >= best,
                          jnp.maximum(best, tile_second),
                          jnp.maximum(tile_best, second)),
                jnp.where(win, targ + t * TILE_J, bidx),
                jnp.where(win, tile_mutual, mutual))

    init = (jnp.full((K,), neg, jnp.float32),
            jnp.full((K,), neg, jnp.float32),
            jnp.zeros((K,), jnp.int32),
            jnp.zeros((K,), jnp.int32))
    best, second, bidx, mutual = jax.lax.fori_loop(0, nt, body, init)
    d_best = jnp.sqrt(jnp.maximum(2.0 - 2.0 * best, 0.0))
    d_second = jnp.sqrt(jnp.maximum(2.0 - 2.0 * second, 1e-12))
    ok = ((d_best < max_ratio * d_second) & (d_best < max_distance)
          & (m1 > 0))
    if cross_check:
        ok = ok & (mutual > 0)
    j_ref[0, :, 0] = jnp.where(ok, bidx, -1)


@functools.partial(jax.jit,
                   static_argnames=("max_ratio", "max_distance",
                                    "cross_check", "interpret"))
def pallas_match_j_batch(d1, d2, m1, m2, max_ratio: float = 0.8,
                         max_distance: float = 0.7,
                         cross_check: bool = True,
                         interpret: bool = False):
    """Fully-fused batched matcher: one kernel, one (B, K) int32 output
    (j index per row, -1 = no match). The fastest production entry —
    no XLA post-processing at all."""
    import functools as _ft
    B, K, D = d1.shape
    j = pl.pallas_call(
        _ft.partial(_fused_matcher_kernel, _pick_tile(K),
                    float(max_ratio), float(max_distance),
                    bool(cross_check)),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, K, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, K, 1), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, K, 1), jnp.int32),
        interpret=interpret,
    )(d1.astype(jnp.bfloat16), d2.astype(jnp.bfloat16),
      m1.astype(jnp.float32)[..., None], m2.astype(jnp.float32)[..., None])
    return j[..., 0]


@functools.partial(jax.jit,
                   static_argnames=("max_ratio", "max_distance",
                                    "cross_check", "interpret"))
def pallas_match_pair_batch(d1, d2, m1, m2, max_ratio: float = 0.8,
                            max_distance: float = 0.7,
                            cross_check: bool = True,
                            interpret: bool = False):
    """Drop-in batched matcher on the fused kernel — same contract as
    features.matching.match_pair_batch: (matches (B, K, 2) int32 with -1
    pads, num_matches (B,))."""
    j = pallas_match_j_batch(d1, d2, m1, m2, max_ratio=max_ratio,
                             max_distance=max_distance,
                             cross_check=cross_check, interpret=interpret)
    K = d1.shape[1]
    ok = j >= 0
    k_idx = jnp.broadcast_to(jnp.arange(K)[None, :], j.shape)
    matches = jnp.stack([jnp.where(ok, k_idx, -1), j], axis=-1)
    return matches.astype(jnp.int32), jnp.sum(ok, axis=1)


@functools.partial(jax.jit,
                   static_argnames=("max_ratio", "max_distance",
                                    "interpret"))
def pallas_match(d1: jax.Array, d2: jax.Array, m1: jax.Array,
                 m2: jax.Array, max_ratio: float = 0.8,
                 max_distance: float = 0.7, interpret: bool = False):
    """Full ratio-test + cross-check matcher on the Pallas top-2 kernel.

    Same contract as features.matching.match_pair_batch but for ONE pair
    (no leading batch dim). Returns (matches (K1, 2) int32 with -1 pads,
    num_matches).
    """
    neg = jnp.float32(-1e9)
    d1m = jnp.where(m1[:, None], d1, 0.0)
    d2m = jnp.where(m2[:, None], d2, neg / 1e3)  # invalid cols sink sim
    best, second, idx = pallas_top2(d1m, d2m, interpret=interpret)
    rev_best, _, rev_idx = pallas_top2(d2m, d1m, interpret=interpret)

    d_best = jnp.sqrt(jnp.maximum(2.0 - 2.0 * best, 0.0))
    d_second = jnp.sqrt(jnp.maximum(2.0 - 2.0 * second, 1e-12))
    ok = (d_best < max_ratio * d_second) & (d_best < max_distance) & m1
    mutual = rev_idx[idx] == jnp.arange(d1.shape[0])
    ok = ok & mutual & m2[idx]
    matches = jnp.stack([jnp.where(ok, jnp.arange(d1.shape[0]), -1),
                         jnp.where(ok, idx, -1)], axis=-1)
    return matches.astype(jnp.int32), jnp.sum(ok)
