"""Surface meshing from fused depth: TSDF integration + surface nets.

Capability parity with ref: src/mvs/meshing.{h,cc} (`PoissonMeshing`,
`DelaunayMeshing` meshing.h:40,70 over lib/PoissonRecon / CGAL) — the
capability is "depth maps / dense points -> surface mesh". The octree
multigrid Poisson solver is a host-serial algorithm with no TPU mapping;
instead the mesh comes from the volumetric pipeline that IS TPU-shaped:

1. TSDF fusion: every voxel center projects into every depth map in one
   batched program (truncated signed distance, weighted average) — the
   classic KinectFusion integration, dense array ops end to end.
2. Surface nets: one vertex per zero-crossing cell (centroid of edge
   crossings), quads across the four cells around each crossing edge —
   fully vectorizable, no 256-entry case tables, watertight on closed
   surfaces.

Outputs a triangle mesh (vertices [V, 3], faces [F, 3]) + PLY export.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sba_tpu.geometry.quaternions import quat_to_rotmat, np_quat_to_rotmat


@dataclass(frozen=True)
class TSDFOptions:
    voxel_size: float = 0.05
    truncation: float = 0.15       # truncation distance (world units)
    min_weight: float = 1.0        # voxels below are empty
    space_carving: bool = False


class Mesh(NamedTuple):
    vertices: np.ndarray  # [V, 3]
    faces: np.ndarray     # [F, 3] int
    normals: Optional[np.ndarray] = None


def tsdf_fuse(depths, Ks, qvecs, tvecs, origin, dims,
              options: Optional[TSDFOptions] = None):
    """Fuse [N, H, W] depth maps into a TSDF volume.

    origin: [3] world position of voxel (0,0,0) center; dims: (X, Y, Z)
    voxel counts. Returns (tsdf [X,Y,Z], weight [X,Y,Z]).
    """
    opt = options or TSDFOptions()
    depths = jnp.asarray(depths)
    N, H, W = depths.shape
    Ks = jnp.asarray(Ks)
    Rs = jnp.asarray(np.stack([np_quat_to_rotmat(q) for q in qvecs]))
    ts = jnp.asarray(tvecs)
    X, Y, Z = dims
    vx = jnp.arange(X) * opt.voxel_size + origin[0]
    vy = jnp.arange(Y) * opt.voxel_size + origin[1]
    vz = jnp.arange(Z) * opt.voxel_size + origin[2]
    gx, gy, gz = jnp.meshgrid(vx, vy, vz, indexing="ij")
    pts = jnp.stack([gx, gy, gz], -1).reshape(-1, 3) \
        .astype(depths.dtype)  # [V, 3]
    Ks = Ks.astype(depths.dtype)
    Rs = Rs.astype(depths.dtype)
    ts = ts.astype(depths.dtype)

    def integrate(carry, i):
        tsdf, wsum = carry
        pc = pts @ Rs[i].T + ts[i]
        z = pc[:, 2]
        uv = pc @ Ks[i].T
        xy = uv[:, :2] / jnp.where(jnp.abs(uv[:, 2:]) > 1e-9,
                                   uv[:, 2:], 1e-9)
        xi = jnp.clip((xy[:, 0] - 0.5).astype(jnp.int32), 0, W - 1)
        yi = jnp.clip((xy[:, 1] - 0.5).astype(jnp.int32), 0, H - 1)
        d = depths[i][yi, xi]
        inb = ((xy[:, 0] >= 0) & (xy[:, 0] < W)
               & (xy[:, 1] >= 0) & (xy[:, 1] < H) & (z > 0) & (d > 0))
        sdf = d - z
        valid = inb & (sdf > -opt.truncation)
        tsdf_new = jnp.clip(sdf / opt.truncation, -1.0, 1.0)
        w = valid.astype(tsdf.dtype)
        tsdf = (tsdf * wsum + tsdf_new * w) / jnp.maximum(wsum + w, 1e-9)
        return (tsdf, wsum + w), None

    tsdf0 = jnp.zeros(pts.shape[0], depths.dtype)
    w0 = jnp.zeros(pts.shape[0], depths.dtype)
    (tsdf, wsum), _ = jax.lax.scan(integrate, (tsdf0, w0), jnp.arange(N))
    return (np.asarray(tsdf).reshape(X, Y, Z),
            np.asarray(wsum).reshape(X, Y, Z))


def surface_nets(tsdf: np.ndarray, weight: np.ndarray, origin,
                 voxel_size: float, min_weight: float = 1.0) -> Mesh:
    """Extract the zero isosurface with naive surface nets (host numpy —
    vertex/face lists are inherently variable-size)."""
    X, Y, Z = tsdf.shape
    valid = weight >= min_weight
    sdf = np.where(valid, tsdf, np.nan)

    # Cells: [X-1, Y-1, Z-1] with 8 corner samples each.
    corners = np.empty((8,) + tuple(np.array([X, Y, Z]) - 1))
    idx = 0
    corner_offsets = [(dx, dy, dz) for dx in (0, 1) for dy in (0, 1)
                      for dz in (0, 1)]
    for (dx, dy, dz) in corner_offsets:
        corners[idx] = sdf[dx:X - 1 + dx, dy:Y - 1 + dy, dz:Z - 1 + dz]
        idx += 1
    all_valid = ~np.isnan(corners).any(axis=0)
    smin = np.nanmin(corners, axis=0)
    smax = np.nanmax(corners, axis=0)
    crossing = all_valid & (smin < 0) & (smax > 0)
    cells = np.argwhere(crossing)           # [C, 3]
    if len(cells) == 0:
        return Mesh(np.zeros((0, 3)), np.zeros((0, 3), int))

    # Vertex per crossing cell: centroid of sign-change edge crossings.
    cell_vertex_index = -np.ones((X - 1, Y - 1, Z - 1), int)
    cell_vertex_index[tuple(cells.T)] = np.arange(len(cells))

    edges = []
    for a in range(8):
        for b in range(a + 1, 8):
            da = np.array(corner_offsets[a])
            db = np.array(corner_offsets[b])
            if np.abs(da - db).sum() == 1:
                edges.append((a, b))
    cs = corners[:, crossing]               # [8, C]
    verts = np.zeros((len(cells), 3))
    wsum = np.zeros(len(cells))
    for (a, b) in edges:
        sa, sb = cs[a], cs[b]
        cross = (sa < 0) != (sb < 0)
        t = np.where(cross, sa / np.where(np.abs(sa - sb) > 1e-12,
                                          sa - sb, 1e-12), 0.0)
        pa = np.array(corner_offsets[a], float)
        pb = np.array(corner_offsets[b], float)
        pos = pa[None, :] + t[:, None] * (pb - pa)[None, :]
        verts += np.where(cross[:, None], pos, 0.0)
        wsum += cross
    verts = cells + verts / np.maximum(wsum[:, None], 1.0)
    verts = verts * voxel_size + np.asarray(origin)[None, :]

    # Faces: for each SDF edge along axis k crossing zero, connect the 4
    # cells sharing that edge (two triangles, winding by sign).
    faces = []
    for axis in range(3):
        # Edge between sample (i,j,k) and +1 along `axis`.
        s0 = sdf
        s1 = np.roll(sdf, -1, axis=axis)
        sl = [slice(0, X - 1), slice(0, Y - 1), slice(0, Z - 1)]
        sl[axis] = slice(0, [X, Y, Z][axis] - 1)
        # Edge grid points: need the 4 adjacent cells to exist -> interior.
        inner = [slice(1, X - 1), slice(1, Y - 1), slice(1, Z - 1)]
        inner[axis] = slice(0, [X, Y, Z][axis] - 1)
        e0 = s0[tuple(inner)]
        e1 = s1[tuple(inner)]
        cross = (~np.isnan(e0)) & (~np.isnan(e1)) & ((e0 < 0) != (e1 < 0))
        pts_e = np.argwhere(cross)
        if len(pts_e) == 0:
            continue
        # Convert back to absolute sample coords.
        offs = np.array([1, 1, 1])
        offs[axis] = 0
        pe = pts_e + offs[None, :]
        # The 4 cells around the edge: subtract 1 along the two other axes.
        o1, o2 = [ax for ax in range(3) if ax != axis]
        quads = []
        for (d1, d2) in ((0, 0), (1, 0), (1, 1), (0, 1)):
            c = pe.copy()
            c[:, o1] -= d1
            c[:, o2] -= d2
            quads.append(cell_vertex_index[tuple(c.T)])
        quads = np.stack(quads, -1)          # [E, 4]
        ok = (quads >= 0).all(axis=1)
        quads = quads[ok]
        flip = (e0[tuple(pts_e[ok].T)] > 0)
        # Two triangles per quad; flip winding by edge sign.
        t1 = np.where(flip[:, None], quads[:, [0, 1, 2]],
                      quads[:, [0, 2, 1]])
        t2 = np.where(flip[:, None], quads[:, [0, 2, 3]],
                      quads[:, [0, 3, 2]])
        faces.append(t1)
        faces.append(t2)
    faces = np.concatenate(faces) if faces else np.zeros((0, 3), int)

    # Vertex normals from the SDF gradient.
    gx, gy, gz = np.gradient(np.nan_to_num(sdf, nan=1.0))
    vi = np.clip(np.round((verts - np.asarray(origin)) / voxel_size)
                 .astype(int), 0, np.array([X, Y, Z]) - 1)
    normals = np.stack([gx[tuple(vi.T)], gy[tuple(vi.T)],
                        gz[tuple(vi.T)]], -1)
    # SDF increases outward (positive = empty space in front), so the
    # outward surface normal is +gradient.
    n = np.linalg.norm(normals, axis=1, keepdims=True)
    normals = normals / np.maximum(n, 1e-9)
    return Mesh(vertices=verts, faces=faces, normals=normals)


def mesh_from_depth_maps(depths, Ks, qvecs, tvecs,
                         options: Optional[TSDFOptions] = None,
                         margin: float = 0.2) -> Mesh:
    """Full pipeline: depth maps -> TSDF -> mesh. Voxel grid bounds from
    the backprojected depth samples (strided)."""
    opt = options or TSDFOptions()
    depths_np = np.asarray(depths)
    N, H, W = depths_np.shape
    pts = []
    for i in range(N):
        R = np_quat_to_rotmat(qvecs[i])
        Kinv = np.linalg.inv(np.asarray(Ks[i]))
        ys, xs = np.nonzero(depths_np[i, ::4, ::4] > 0)
        if len(ys) == 0:
            continue
        d = depths_np[i, ::4, ::4][ys, xs]
        xh = np.stack([xs * 4 + 0.5, ys * 4 + 0.5, np.ones_like(d)], -1)
        pc = (xh @ Kinv.T) * d[:, None]
        pts.append((pc - np.asarray(tvecs[i])) @ R)
    if not pts:
        return Mesh(np.zeros((0, 3)), np.zeros((0, 3), int))
    pts = np.concatenate(pts)
    lo = pts.min(0) - margin
    hi = pts.max(0) + margin
    dims = tuple(np.maximum(np.ceil((hi - lo) / opt.voxel_size)
                            .astype(int) + 1, 4))
    tsdf, wts = tsdf_fuse(depths, Ks, qvecs, tvecs, lo, dims, opt)
    return surface_nets(tsdf, wts, lo, opt.voxel_size, opt.min_weight)


def write_mesh_ply(mesh: Mesh, path):
    """PLY export (ref: PoissonMeshing output format)."""
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(mesh.vertices)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(mesh.faces)}\n")
        f.write("property list uchar int vertex_indices\n")
        f.write("end_header\n")
        for v in mesh.vertices:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")
        for t in mesh.faces:
            f.write(f"3 {t[0]} {t[1]} {t[2]}\n")
