"""Meshing tests: TSDF fusion + surface nets recover a known surface
(ref capability: mvs/meshing.{h,cc}; the reference has no meshing tests)."""

import numpy as np
import pytest

from sba_tpu.mvs.meshing import (
    Mesh,
    TSDFOptions,
    mesh_from_depth_maps,
    surface_nets,
    tsdf_fuse,
    write_mesh_ply,
)


def _sphere_sdf_volume(r=1.0, n=32, extent=1.5):
    xs = np.linspace(-extent, extent, n)
    gx, gy, gz = np.meshgrid(xs, xs, xs, indexing="ij")
    sdf = np.sqrt(gx ** 2 + gy ** 2 + gz ** 2) - r
    return sdf.astype(np.float32), xs[1] - xs[0], np.array([-extent] * 3)


def test_surface_nets_sphere():
    sdf, voxel, origin = _sphere_sdf_volume()
    w = np.full_like(sdf, 10.0)
    mesh = surface_nets(sdf, w, origin, voxel)
    assert len(mesh.vertices) > 200
    assert len(mesh.faces) > 200
    radii = np.linalg.norm(mesh.vertices, axis=1)
    assert np.abs(radii - 1.0).max() < 0.15
    assert np.abs(radii - 1.0).mean() < 0.05
    # Faces index valid vertices.
    assert mesh.faces.min() >= 0 and mesh.faces.max() < len(mesh.vertices)
    # Normals point outward for a sphere centered at the origin.
    vn = mesh.vertices / np.maximum(radii[:, None], 1e-9)
    agree = np.sum(vn * mesh.normals, axis=1)
    assert (agree > 0).mean() > 0.95


def test_tsdf_fuse_plane():
    """Depth maps of a fronto-parallel plane fuse into a TSDF whose zero
    crossing sits at the plane depth."""
    H, W, f = 40, 50, 40.0
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
    depth0 = 2.0
    depths = np.full((3, H, W), depth0, np.float32)
    qvecs = np.tile([1.0, 0, 0, 0], (3, 1))
    tvecs = np.array([[0.0, 0, 0], [0.2, 0, 0], [-0.2, 0, 0]])
    opt = TSDFOptions(voxel_size=0.05, truncation=0.2)
    origin = np.array([-0.5, -0.5, 1.5])
    dims = (20, 20, 20)
    tsdf, wts = tsdf_fuse(depths, [K] * 3, qvecs, tvecs, origin, dims, opt)
    # Along z: voxels in front of the plane (z < 2) have positive sdf,
    # behind negative.
    zc = origin[2] + np.arange(dims[2]) * opt.voxel_size
    center = tsdf[10, 10, :]
    wcenter = wts[10, 10, :]
    seen = wcenter > 0
    assert (center[seen & (zc < depth0 - 0.06)] > 0.2).all()
    assert (center[seen & (zc > depth0 + 0.06)] < -0.2).all()


def test_mesh_from_depth_maps_plane(tmp_path):
    H, W, f = 40, 50, 40.0
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
    depths = np.full((3, H, W), 2.0, np.float32)
    qvecs = np.tile([1.0, 0, 0, 0], (3, 1))
    tvecs = np.array([[0.0, 0, 0], [0.3, 0, 0], [-0.3, 0, 0]])
    mesh = mesh_from_depth_maps(depths, [K] * 3, qvecs, tvecs,
                                TSDFOptions(voxel_size=0.08,
                                            truncation=0.25))
    assert len(mesh.vertices) > 50
    assert len(mesh.faces) > 50
    # The reconstructed surface lies at z ~ 2.
    assert np.abs(mesh.vertices[:, 2] - 2.0).max() < 0.1

    p = str(tmp_path / "mesh.ply")
    write_mesh_ply(mesh, p)
    txt = open(p).read(300)
    assert "element face" in txt


def test_empty_volume():
    sdf = np.ones((8, 8, 8), np.float32)
    w = np.full_like(sdf, 10.0)
    mesh = surface_nets(sdf, w, np.zeros(3), 0.1)
    assert len(mesh.vertices) == 0 and len(mesh.faces) == 0
