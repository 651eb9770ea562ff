"""Surface meshing from fused dense points.

Counterpart of /root/reference/src/mvs/meshing.{h,cc}: the reference wires
PoissonRecon (lib/PoissonRecon, GUI-only in this fork) and CGAL Delaunay
(sparse + dense, meshing.h:123-126). Here: Delaunay meshing via
scipy.spatial (host; meshing is not a device workload) with the reference's
long-edge/visibility-style filtering — a 3D Delaunay tetrahedralization's
surface triangles filtered by edge length relative to local point spacing.
PoissonRecon is intentionally not replicated (vendored 30k-LoC GUI-only
path; SURVEY.md §2.13 marks it optional).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class MeshingOptions(NamedTuple):
    max_edge_factor: float = 3.0   # edge <= factor * median point spacing
    min_triangles: int = 1


def delaunay_mesh(xyz: np.ndarray,
                  opts: MeshingOptions = MeshingOptions()) -> tuple:
    """Point cloud -> (vertices (N, 3), triangles (M, 3) int).

    3D Delaunay -> boundary faces of the tet mesh, dropping faces with
    edges much longer than the local sampling density (the same role as
    meshing.h's sparse Delaunay filtering)."""
    from scipy.spatial import Delaunay, cKDTree

    xyz = np.asarray(xyz, np.float64)
    if len(xyz) < 4:
        return xyz, np.zeros((0, 3), np.int64)
    tri = Delaunay(xyz)
    # surface = faces appearing in exactly one tetrahedron
    faces = {}
    for tet in tri.simplices:
        for f in ((0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)):
            key = tuple(sorted(tet[list(f)]))
            faces[key] = faces.get(key, 0) + 1
    surface = np.asarray([k for k, v in faces.items() if v == 1],
                         np.int64).reshape(-1, 3)

    # median nearest-neighbor spacing
    tree = cKDTree(xyz)
    d, _ = tree.query(xyz, k=2)
    spacing = np.median(d[:, 1])
    lim = opts.max_edge_factor * spacing
    a, b, c = xyz[surface[:, 0]], xyz[surface[:, 1]], xyz[surface[:, 2]]
    emax = np.maximum(np.linalg.norm(a - b, axis=1),
                      np.maximum(np.linalg.norm(b - c, axis=1),
                                 np.linalg.norm(a - c, axis=1)))
    surface = surface[emax <= lim]
    return xyz, surface


def write_ply_mesh(path: str, vertices: np.ndarray,
                   triangles: np.ndarray) -> None:
    """Mesh -> binary PLY (ref WritePlyMesh)."""
    import os
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    v = np.asarray(vertices, "<f4")
    t = np.asarray(triangles, "<i4")
    header = ("ply\nformat binary_little_endian 1.0\n"
              f"element vertex {len(v)}\n"
              "property float x\nproperty float y\nproperty float z\n"
              f"element face {len(t)}\n"
              "property list uchar int vertex_index\nend_header\n")
    with open(path, "wb") as f:
        f.write(header.encode())
        f.write(v.tobytes())
        rows = bytearray()
        for row in t:
            rows += bytes([3]) + row.tobytes()
        f.write(bytes(rows))
