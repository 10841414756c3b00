"""Synthetic unstructured-mesh generator.

The reference ships/downloads the DLR F6 aircraft mesh plus a small test mesh
(SURVEY.md §3 "Datasets").  This sandbox has no network access, so the rebuild
generates meshes of comparable size and structure instead (SURVEY.md §7 hard
part 5): a jittered 3-D grid whose edges form the face graph (the median-dual
view an edge-based CFD solver like TAU uses: one "face" per point-pair), with

- optional random diagonal edges to skew point valence (unstructured-like
  degree distribution rather than a constant 6),
- optional random permutation of point ids to destroy structured banding
  (so coloring/reordering is exercised the way a real mesh would),
- geometrically consistent axis-edge normals and dual volumes, so that on the
  unjittered grid the Green-Gauss gradient of a linear field is exact at
  interior points (a semantic anchor test).

Faces are stored with p0 < p1 (normal flips sign on swap, so orientation
semantics `+into p0 / −into p1` are preserved).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from cfd_proxy_tpu.utils.errors import check


@dataclass
class GlobalMesh:
    """Unpartitioned mesh: the generator/partitioner interchange format."""

    coords: np.ndarray   # (N, 3) f64
    faces: np.ndarray    # (F, 2) i32, global point ids, p0 < p1
    normals: np.ndarray  # (F, 3) f64
    volume: np.ndarray   # (N,) f64

    @property
    def npoint(self) -> int:
        return int(self.coords.shape[0])

    @property
    def nface(self) -> int:
        return int(self.faces.shape[0])


def generate_mesh(
    nx: int,
    ny: int,
    nz: int,
    *,
    spacing: float = 1.0,
    jitter: float = 0.0,
    diag_frac: float = 0.0,
    shuffle: bool = True,
    seed: int = 0,
) -> GlobalMesh:
    """Generate an edge-based mesh on an nx×ny×nz point grid.

    diag_frac: fraction of cells that additionally get a body-diagonal edge
    (valence skew).  jitter: coordinate noise in units of `spacing`.
    """
    check(nx >= 2 and ny >= 2 and nz >= 2, "need at least 2 points per axis")
    rng = np.random.default_rng(seed)
    N = nx * ny * nz
    h = float(spacing)

    ii, jj, kk = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz), indexing="ij")
    coords = np.stack([ii, jj, kk], axis=-1).reshape(N, 3).astype(np.float64) * h
    if jitter:
        coords = coords + rng.uniform(-jitter * h, jitter * h, size=coords.shape)

    def gid(i, j, k):
        return (i * ny + j) * nz + k

    # axis-aligned edges; dual-face area vector per axis
    edges = []
    norms = []
    areas = (h * h, h * h, h * h)
    # x-edges
    e0 = gid(ii[:-1, :, :], jj[:-1, :, :], kk[:-1, :, :]).ravel()
    e1 = gid(ii[:-1, :, :] + 1, jj[:-1, :, :], kk[:-1, :, :]).ravel()
    edges.append(np.stack([e0, e1], axis=1))
    n = np.zeros((e0.size, 3)); n[:, 0] = areas[0]
    norms.append(n)
    # y-edges
    e0 = gid(ii[:, :-1, :], jj[:, :-1, :], kk[:, :-1, :]).ravel()
    e1 = gid(ii[:, :-1, :], jj[:, :-1, :] + 1, kk[:, :-1, :]).ravel()
    edges.append(np.stack([e0, e1], axis=1))
    n = np.zeros((e0.size, 3)); n[:, 1] = areas[1]
    norms.append(n)
    # z-edges
    e0 = gid(ii[:, :, :-1], jj[:, :, :-1], kk[:, :, :-1]).ravel()
    e1 = gid(ii[:, :, :-1], jj[:, :, :-1], kk[:, :, :-1] + 1).ravel()
    edges.append(np.stack([e0, e1], axis=1))
    n = np.zeros((e0.size, 3)); n[:, 2] = areas[2]
    norms.append(n)

    if diag_frac > 0:
        ci, cj, ck = np.meshgrid(
            np.arange(nx - 1), np.arange(ny - 1), np.arange(nz - 1), indexing="ij"
        )
        ncell = ci.size
        pick = rng.random(ncell) < diag_frac
        d0 = gid(ci, cj, ck).ravel()[pick]
        d1 = gid(ci + 1, cj + 1, ck + 1).ravel()[pick]
        edges.append(np.stack([d0, d1], axis=1))
        # small geometric normal along the diagonal; keeps the sweep's
        # arithmetic shape, contributes zero net area in expectation
        dvec = coords[d1] - coords[d0]
        dlen = np.linalg.norm(dvec, axis=1, keepdims=True)
        norms.append(0.05 * h * h * dvec / np.maximum(dlen, 1e-300))

    faces = np.concatenate(edges, axis=0).astype(np.int64)
    normals = np.concatenate(norms, axis=0)
    volume = np.full(N, h * h * h, dtype=np.float64)

    if shuffle:
        perm = rng.permutation(N)          # new id of old point i is perm[i]
        inv = np.empty(N, dtype=np.int64)
        inv[perm] = np.arange(N)
        coords = coords[inv]
        volume = volume[inv]
        faces = perm[faces]

    # canonical orientation p0 < p1; flip normal when swapping
    swap = faces[:, 0] > faces[:, 1]
    faces[swap] = faces[swap][:, ::-1]
    normals[swap] = -normals[swap]

    # deterministic face order: sort by (p0, p1)
    order = np.lexsort((faces[:, 1], faces[:, 0]))
    faces = faces[order]
    normals = normals[order]

    check(int(faces.max()) < N and int(faces.min()) >= 0, "face index out of range")
    return GlobalMesh(
        coords=coords,
        faces=faces.astype(np.int32),
        normals=normals,
        volume=volume,
    )


def make_state(npoint: int, nvar: int, *, seed: int = 0, dtype=np.float64) -> np.ndarray:
    """Random per-point state `var[npoint, nvar]` (the reference's var array)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((npoint, nvar)).astype(dtype)
