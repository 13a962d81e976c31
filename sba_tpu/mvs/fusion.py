"""Stereo fusion: merge per-view depth/normal maps into a dense cloud.

Capability parity with ref: src/mvs/fusion.{h,cc} (`StereoFusion`
fusion.h:108): for each pixel of each view, check photometric/geometric
consistency against the other views (relative depth error, reprojection
error, normal agreement), fuse consistent samples into one 3D point.

TPU redesign: the reference traverses pixels with an explicit BFS queue
over consistent neighbors (fusion.cc). Here consistency is evaluated for
ALL pixels of a view against ALL other views as one batched program
(project -> sample other view's depth -> compare), and fusion is a
segment-mean over consistent samples — no queues, no visited flags.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sba_tpu.geometry.quaternions import quat_to_rotmat


@dataclass(frozen=True)
class StereoFusionOptions:
    """Mirrors ref: mvs/fusion.h:54 Options."""

    min_num_pixels: int = 3          # consistent views required (incl. self)
    max_reproj_error: float = 2.0    # px
    max_depth_error: float = 0.01    # relative
    max_normal_error: float = 10.0   # deg
    check_num_images: int = 50
    use_cache: bool = False          # obsolete (host-RAM bound in ref)


class FusedPointCloud(NamedTuple):
    xyz: np.ndarray       # [M, 3]
    normal: np.ndarray    # [M, 3]
    color: np.ndarray     # [M] grayscale in [0,1] (or [M,3] if rgb given)
    num_views: np.ndarray  # [M]
    # Per-point visibility (ragged, CSR-style): which views fused into
    # each point — written to fused.ply.vis (ref: mvs/fusion.cc
    # WriteVisibility / scripts/python/read_write_fused_vis.py format).
    vis_counts: np.ndarray = None   # [M] uint32
    vis_idxs: np.ndarray = None     # [sum(vis_counts)] uint32


def _cam_to_world(R, t, pts_cam):
    return (pts_cam - t) @ R


def fuse_depth_maps(
    depths,           # [N, H, W] (0 = invalid)
    normals,          # [N, H, W, 3] camera-frame normals
    images,           # [N, H, W] grayscale (colors for the cloud)
    Ks,               # [N, 3, 3]
    qvecs,            # [N, 4] world->cam
    tvecs,            # [N, 3]
    options: Optional[StereoFusionOptions] = None,
) -> FusedPointCloud:
    """Fuse all views. Device does the all-pairs consistency votes; host
    does the final variable-size compaction."""
    opt = options or StereoFusionOptions()
    depths = jnp.asarray(depths)
    normals = jnp.asarray(normals)
    images = jnp.asarray(images)
    N, H, W = depths.shape
    Ks = jnp.asarray(Ks)
    Rs = jnp.stack([quat_to_rotmat(jnp.asarray(q)) for q in qvecs])
    ts = jnp.asarray(tvecs)

    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=depths.dtype) + 0.5,
                          jnp.arange(W, dtype=depths.dtype) + 0.5,
                          indexing="ij")

    def backproject(i):
        """Pixels of view i -> world points + world normals."""
        Kinv = jnp.linalg.inv(Ks[i])
        xh = jnp.stack([xx, yy, jnp.ones_like(xx)], -1)
        ray = jnp.einsum("ij,hwj->hwi", Kinv, xh)
        p_cam = ray * depths[i][..., None]
        p_world = jnp.einsum("ji,hwj->hwi", Rs[i], p_cam - ts[i][None, None])
        n_world = jnp.einsum("ji,hwj->hwi", Rs[i], normals[i])
        return p_world, n_world

    cos_thr = jnp.cos(jnp.radians(opt.max_normal_error))

    def consistency(i):
        """[H, W] count of views consistent with view i's pixels, plus
        accumulated world positions/normals for averaging."""
        p_world, n_world = backproject(i)
        votes = jnp.ones((H, W), jnp.int32)
        acc_p = p_world
        acc_n = n_world
        acc_c = images[i]
        vis_bits = [None] * N   # per-view consistency masks [H, W]
        vis_bits[i] = depths[i] > 0
        for j in range(N):
            if j == i:
                continue
            p_j = jnp.einsum("ij,hwj->hwi", Rs[j], p_world) + ts[j]
            z_j = p_j[..., 2]
            uv = jnp.einsum("ij,hwj->hwi", Ks[j], p_j)
            xy_j = uv[..., :2] / jnp.where(jnp.abs(uv[..., 2:]) > 1e-9,
                                           uv[..., 2:], 1e-9)
            xi = jnp.clip((xy_j[..., 0] - 0.5).astype(jnp.int32), 0, W - 1)
            yi = jnp.clip((xy_j[..., 1] - 0.5).astype(jnp.int32), 0, H - 1)
            d_j = depths[j][yi, xi]
            nrm_j = normals[j][yi, xi]
            inb = ((xy_j[..., 0] >= 0) & (xy_j[..., 0] < W)
                   & (xy_j[..., 1] >= 0) & (xy_j[..., 1] < H))
            depth_ok = jnp.abs(d_j - z_j) \
                < opt.max_depth_error * jnp.maximum(z_j, 1e-6)
            # Normal agreement in world frame.
            n_j_world = jnp.einsum("ji,hwj->hwi", Rs[j], nrm_j)
            dotp = jnp.sum(n_world * n_j_world, -1)
            normal_ok = dotp > cos_thr
            ok = inb & (z_j > 0) & (d_j > 0) & depth_ok & normal_ok \
                & (depths[i] > 0)
            vis_bits[j] = ok
            votes = votes + ok.astype(jnp.int32)
            # Accumulate the consistent sample's world position.
            Kinv_j = jnp.linalg.inv(Ks[j])
            xh_j = jnp.concatenate(
                [xy_j, jnp.ones_like(xy_j[..., :1])], -1)
            p_j_cam = jnp.einsum("ij,hwj->hwi", Kinv_j, xh_j) \
                * d_j[..., None]
            p_j_world = jnp.einsum(
                "ji,hwj->hwi", Rs[j], p_j_cam - ts[j][None, None])
            acc_p = acc_p + jnp.where(ok[..., None], p_j_world, 0.0)
            acc_n = acc_n + jnp.where(ok[..., None], n_j_world, 0.0)
            acc_c = acc_c + jnp.where(ok, images[j][yi, xi], 0.0)
        cnt = votes.astype(depths.dtype)[..., None]
        return (votes, acc_p / cnt, acc_n / cnt, acc_c / cnt[..., 0],
                jnp.stack(vis_bits))

    # Device pass per view; host compaction (variable-size output).
    all_xyz, all_n, all_c, all_v = [], [], [], []
    all_vis_cnt, all_vis_idx = [], []
    used = np.zeros((N, H, W), bool)  # avoid duplicating fused pixels
    consistency_jit = jax.jit(consistency, static_argnums=0)
    for i in range(N):
        votes, p_avg, n_avg, c_avg, vis = consistency_jit(i)
        votes = np.asarray(votes)
        keep = (votes >= opt.min_num_pixels) \
            & (np.asarray(depths[i]) > 0) & ~used[i]
        ys, xs = np.nonzero(keep)
        if len(ys) == 0:
            continue
        all_xyz.append(np.asarray(p_avg)[ys, xs])
        nn = np.asarray(n_avg)[ys, xs]
        nn /= np.maximum(np.linalg.norm(nn, axis=-1, keepdims=True), 1e-9)
        all_n.append(nn)
        all_c.append(np.asarray(c_avg)[ys, xs])
        all_v.append(votes[ys, xs])
        # Visibility lists (CSR): views whose samples fused into the point.
        okk = np.asarray(vis)[:, ys, xs]          # [N, M_i] bool
        all_vis_cnt.append(okk.sum(0).astype(np.uint32))
        all_vis_idx.append(np.nonzero(okk.T)[1].astype(np.uint32))
        # Mark source pixels of other views as consumed: project fused
        # points into each later view and invalidate hits.
        pts = all_xyz[-1]
        for j in range(i + 1, N):
            Rj = np.asarray(Rs[j])
            tj = np.asarray(ts[j])
            Kj = np.asarray(Ks[j])
            pc = pts @ Rj.T + tj
            z = pc[:, 2]
            uv = pc @ Kj.T
            xyj = uv[:, :2] / np.where(np.abs(uv[:, 2:]) > 1e-9,
                                       uv[:, 2:], 1e-9)
            xi = np.clip((xyj[:, 0] - 0.5).astype(int), 0, W - 1)
            yi = np.clip((xyj[:, 1] - 0.5).astype(int), 0, H - 1)
            dj = np.asarray(depths[j])[yi, xi]
            hit = (z > 0) & (np.abs(dj - z)
                             < opt.max_depth_error * np.maximum(z, 1e-6))
            used[j, yi[hit], xi[hit]] = True

    if not all_xyz:
        return FusedPointCloud(np.zeros((0, 3)), np.zeros((0, 3)),
                               np.zeros(0), np.zeros(0, int),
                               np.zeros(0, np.uint32),
                               np.zeros(0, np.uint32))
    return FusedPointCloud(
        xyz=np.concatenate(all_xyz),
        normal=np.concatenate(all_n),
        color=np.concatenate(all_c),
        num_views=np.concatenate(all_v),
        vis_counts=np.concatenate(all_vis_cnt),
        vis_idxs=np.concatenate(all_vis_idx))


def write_fused_ply(cloud: FusedPointCloud, path):
    """PLY export of the fused cloud (ref: fusion.cc WritePlyText /
    util/ply.cc)."""
    xyz = cloud.xyz
    nrm = cloud.normal
    col = cloud.color
    if col.ndim == 1:
        col = np.stack([col] * 3, -1)
    col8 = np.clip(col * 255, 0, 255).astype(np.uint8)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(xyz)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("property float nx\nproperty float ny\nproperty float nz\n")
        f.write("property uchar red\nproperty uchar green\n"
                "property uchar blue\n")
        f.write("end_header\n")
        for p, n, c in zip(xyz, nrm, col8):
            f.write(f"{p[0]} {p[1]} {p[2]} {n[0]} {n[1]} {n[2]} "
                    f"{c[0]} {c[1]} {c[2]}\n")


def write_fused_vis(cloud: FusedPointCloud, path):
    """Binary fused.ply.vis: uint64 num_points, then per point a uint32
    count followed by count uint32 image indices (format of
    ref: scripts/python/read_write_fused_vis.py write_fused_ply_vis /
    mvs/fusion.cc visibility output)."""
    import struct

    counts = cloud.vis_counts
    idxs = cloud.vis_idxs
    if counts is None:
        counts = np.asarray(cloud.num_views, np.uint32) * 0
        idxs = np.zeros(0, np.uint32)
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(cloud.xyz)))
        off = 0
        for c in counts:
            c = int(c)
            f.write(struct.pack("<I", c))
            f.write(np.asarray(idxs[off:off + c], "<u4").tobytes())
            off += c


def read_fused_vis(path):
    """-> (counts [M] uint32, idxs flat uint32) from a fused.ply.vis."""
    import struct

    with open(path, "rb") as f:
        (m,) = struct.unpack("<Q", f.read(8))
        counts = np.empty(m, np.uint32)
        idxs = []
        for i in range(m):
            (c,) = struct.unpack("<I", f.read(4))
            counts[i] = c
            idxs.append(np.frombuffer(f.read(4 * c), "<u4"))
    return counts, (np.concatenate(idxs) if idxs
                    else np.zeros(0, np.uint32))
