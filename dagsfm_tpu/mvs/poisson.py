"""Poisson surface reconstruction, TPU-native (FFT on a dense grid).

Counterpart of the reference's PoissonRecon wiring
(/root/reference/src/mvs/meshing.h:106 + lib/PoissonRecon): oriented
fused points -> watertight iso-surface. The reference vendors the
octree/FEM PoissonRecon implementation (GUI-only in that fork); here the
indicator function is solved SPECTRALLY on a regular grid — the entire
hot path (normal-field splat, divergence, 3D FFT Poisson solve,
trilinear iso-level sampling) is one jitted program of dense
batched ops, which is the shape a TPU wants, instead of a pointer-chasing
octree. Resolution is bounded by the grid (G^3 cells) rather than
adaptive, which is the standard tradeoff of spectral Poisson solvers.

Pipeline (Kazhdan-style, periodic boundary via padding):
  1. splat oriented normals into a (G,G,G,3) vector field V
     (trilinear, 8-corner scatter-add),
  2. div V by central differences,
  3. solve (Laplacian - screen) chi = div V in Fourier space — the DFT
     diagonalizes the periodic Laplacian, so the solve is one fftn,
     one elementwise divide, one ifftn,
  4. iso level = density-weighted mean of chi at the input samples,
  5. marching TETRAHEDRA (host numpy, vectorized; 6 tets/cell) extracts
     the triangle mesh at that level.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp


class PoissonOptions(NamedTuple):
    grid: int = 128          # G: grid cells per side
    padding: float = 0.1     # fraction of bbox added per side
    screen: float = 4.0      # screening weight (0 = pure Poisson)
    smooth_sigma: float = 1.0  # Gaussian pre-smoothing of V, in cells
    min_density: float = 0.05  # cells with splat density below this
    #                            fraction of the mean carry no surface
    #                            (suppresses far-from-data membranes)


def _trilinear_scatter(grid_shape, pts, vals):
    """Scatter-add vals (N, C) into a (G,G,G,C) grid at fractional pts."""
    G = grid_shape[0]
    i0 = jnp.floor(pts).astype(jnp.int32)
    f = pts - i0
    out = jnp.zeros(grid_shape, vals.dtype)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = (jnp.where(dx, f[:, 0], 1 - f[:, 0])
                     * jnp.where(dy, f[:, 1], 1 - f[:, 1])
                     * jnp.where(dz, f[:, 2], 1 - f[:, 2]))
                idx = jnp.clip(i0 + jnp.array([dx, dy, dz]), 0, G - 1)
                out = out.at[idx[:, 0], idx[:, 1], idx[:, 2]].add(
                    vals * w[:, None])
    return out


def _trilinear_sample(vol, pts):
    """Sample (G,G,G) vol at fractional pts (N, 3)."""
    G = vol.shape[0]
    i0 = jnp.floor(pts).astype(jnp.int32)
    f = pts - i0
    acc = 0.0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = (jnp.where(dx, f[:, 0], 1 - f[:, 0])
                     * jnp.where(dy, f[:, 1], 1 - f[:, 1])
                     * jnp.where(dz, f[:, 2], 1 - f[:, 2]))
                idx = jnp.clip(i0 + jnp.array([dx, dy, dz]), 0, G - 1)
                acc = acc + w * vol[idx[:, 0], idx[:, 1], idx[:, 2]]
    return acc


@functools.partial(jax.jit, static_argnames=("G",))
def _poisson_field(pts_g, normals, G: int, screen, sigma):
    """pts_g (N,3) in grid coords + unit normals -> (chi (G,G,G), iso,
    density (G,G,G)). One fused program: splat, smooth, div, FFT solve,
    iso sampling."""
    V = _trilinear_scatter((G, G, G, 3), pts_g, normals)
    density = _trilinear_scatter((G, G, G, 1), pts_g,
                                 jnp.ones_like(normals[:, :1]))[..., 0]

    # Gaussian smoothing of the splatted field in Fourier space (the
    # octree method's B-spline support plays this role)
    k = jnp.fft.fftfreq(G) * G                       # integer frequencies
    kx, ky, kz = jnp.meshgrid(k, k, k, indexing="ij")
    gauss = jnp.exp(-2.0 * (jnp.pi * sigma / G) ** 2
                    * (kx ** 2 + ky ** 2 + kz ** 2))

    Vf = jnp.fft.fftn(V, axes=(0, 1, 2)) * gauss[..., None]
    # divergence and Laplacian as spectral operators (unit cell size)
    two_pi_i = 2j * jnp.pi / G
    divf = two_pi_i * (kx * Vf[..., 0] + ky * Vf[..., 1] + kz * Vf[..., 2])
    lap = -(2 * jnp.pi / G) ** 2 * (kx ** 2 + ky ** 2 + kz ** 2)
    denom = lap - screen / (G * G)
    chif = divf / denom
    chi = jnp.real(jnp.fft.ifftn(chif, axes=(0, 1, 2)))

    dens_s = jnp.real(jnp.fft.ifftn(
        jnp.fft.fftn(density) * gauss))
    w = _trilinear_sample(dens_s, pts_g)
    iso = jnp.sum(_trilinear_sample(chi, pts_g) * w) / jnp.maximum(
        jnp.sum(w), 1e-12)
    return chi, iso, dens_s


# marching-tetrahedra decomposition: 6 tets per cube sharing the main
# diagonal 0-7; corner index c = dx | dy<<1 | dz<<2. Each tet is
# (0, a, b, 7) where 0 -> a -> b -> 7 walks one axis permutation.
_TETS = np.array([
    [0, 1, 3, 7], [0, 1, 5, 7], [0, 2, 3, 7],
    [0, 2, 6, 7], [0, 4, 5, 7], [0, 4, 6, 7]], np.int32)
_CORNER = np.array([[x, y, z] for z in (0, 1) for y in (0, 1)
                    for x in (0, 1)], np.int32)  # corner bit = x|y<<1|z<<2


def _marching_tets(chi: np.ndarray, iso: float, mask: np.ndarray):
    """Triangulate the chi == iso surface (host numpy, vectorized).

    mask (G,G,G) bool: cells allowed to carry surface (density gate).
    Returns (verts (V,3) grid coords, tris (M,3) int)."""
    G = chi.shape[0]
    base = np.stack(np.meshgrid(np.arange(G - 1), np.arange(G - 1),
                                np.arange(G - 1), indexing="ij"),
                    axis=-1).reshape(-1, 3)                 # (C,3)
    cell_ok = mask[base[:, 0], base[:, 1], base[:, 2]]
    base = base[cell_ok]
    if len(base) == 0:
        return np.zeros((0, 3)), np.zeros((0, 3), np.int64)
    # corner values/positions per cell
    cpos = base[:, None, :] + _CORNER[None]                 # (C,8,3)
    cval = chi[cpos[..., 0], cpos[..., 1], cpos[..., 2]] - iso

    verts = []
    tris = []
    vcount = 0
    for tet in _TETS:
        v = cval[:, tet]                                    # (C,4)
        p = cpos[:, tet].astype(np.float64)                 # (C,4,3)
        inside = v > 0
        code = (inside[:, 0].astype(int) | (inside[:, 1] << 1)
                | (inside[:, 2] << 2) | (inside[:, 3] << 3))

        def edge_pt(sel, a, b):
            va, vb = v[sel, a], v[sel, b]
            t = va / np.where(np.abs(va - vb) < 1e-30, 1e-30, va - vb)
            return p[sel, a] + t[:, None] * (p[sel, b] - p[sel, a])

        # single-corner cases (1 triangle) and two-corner cases (2)
        for c_in, flip in (((1,), False), ((2,), False), ((4,), False),
                           ((8,), False), ((14,), True), ((13,), True),
                           ((11,), True), ((7,), True)):
            cc = c_in[0]
            sel = np.nonzero(code == cc)[0]
            if not len(sel):
                continue
            corner = int(np.log2(cc if not flip else (15 ^ cc)))
            others = [i for i in range(4) if i != corner]
            pa = edge_pt(sel, corner, others[0])
            pb = edge_pt(sel, corner, others[1])
            pc = edge_pt(sel, corner, others[2])
            tri_v = np.stack([pa, pb, pc], axis=1)          # (S,3,3)
            verts.append(tri_v.reshape(-1, 3))
            n = len(sel)
            tris.append(vcount + np.arange(3 * n).reshape(n, 3))
            vcount += 3 * n
        for ab in ((3,), (5,), (9,), (6,), (10,), (12,)):
            cc = ab[0]
            sel = np.nonzero(code == cc)[0]
            if not len(sel):
                continue
            ins = [i for i in range(4) if cc & (1 << i)]
            outs = [i for i in range(4) if not cc & (1 << i)]
            p00 = edge_pt(sel, ins[0], outs[0])
            p01 = edge_pt(sel, ins[0], outs[1])
            p10 = edge_pt(sel, ins[1], outs[0])
            p11 = edge_pt(sel, ins[1], outs[1])
            quad1 = np.stack([p00, p01, p11], axis=1)
            quad2 = np.stack([p00, p11, p10], axis=1)
            verts.append(quad1.reshape(-1, 3))
            verts.append(quad2.reshape(-1, 3))
            n = len(sel)
            tris.append(vcount + np.arange(3 * n).reshape(n, 3))
            vcount += 3 * n
            tris.append(vcount + np.arange(3 * n).reshape(n, 3))
            vcount += 3 * n

    if not verts:
        return np.zeros((0, 3)), np.zeros((0, 3), np.int64)
    verts = np.concatenate(verts)
    tris = np.concatenate(tris)
    # weld duplicate vertices (edges shared between tets/cells)
    key = np.round(verts * 1024).astype(np.int64)
    _, uniq_idx, inv = np.unique(key, axis=0, return_index=True,
                                 return_inverse=True)
    return verts[uniq_idx], inv[tris]


def poisson_mesh(xyz: np.ndarray, normals: np.ndarray,
                 opts: PoissonOptions = PoissonOptions()) -> tuple:
    """Oriented point cloud -> (vertices (V,3) world, triangles (M,3)).

    Ref: mvs/meshing.h:106 PoissonMeshing (PoissonRecon octree solver);
    here the spectral grid solver above.
    """
    xyz = np.asarray(xyz, np.float64)
    normals = np.asarray(normals, np.float64)
    nn = np.linalg.norm(normals, axis=1, keepdims=True)
    normals = normals / np.maximum(nn, 1e-12)
    G = opts.grid

    lo = xyz.min(0)
    hi = xyz.max(0)
    span = float((hi - lo).max())
    pad = opts.padding * span
    origin = lo - pad
    scale = (span + 2 * pad) / (G - 1)
    pts_g = (xyz - origin) / scale

    chi, iso, dens = _poisson_field(
        jnp.asarray(pts_g), jnp.asarray(normals), G,
        jnp.asarray(float(opts.screen)),
        jnp.asarray(float(opts.smooth_sigma)))
    chi = np.asarray(chi)
    iso = float(iso)
    dens = np.asarray(dens)
    mask = dens > opts.min_density * max(dens.mean(), 1e-12)
    # a cell carries surface if any of its 8 corners is near data
    m = mask
    for ax in (0, 1, 2):
        m = m | np.roll(m, -1, axis=ax)
    verts_g, tris = _marching_tets(chi, iso, m)
    verts = verts_g * scale + origin
    return verts, tris
