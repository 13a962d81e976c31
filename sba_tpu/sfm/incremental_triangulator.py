"""Incremental track triangulation: create / continue / merge / complete.

Capability parity with ref: src/sfm/incremental_triangulator.{h,cc}
(`IncrementalTriangulator` — TriangulateImage :61, CompleteImage :232,
CompleteTracks :261, MergeTracks :290, Retriangulate :421, CreateTrack,
ContinueTrack, angle/error checks throughout).

Design: the registration bookkeeping (which feature belongs to which
track) stays host-side in the `Reconstruction` dicts — it is sparse,
sequential, and tiny. The geometry (multi-view DLT triangulation,
reprojection / angle checks) is batched numpy/LA over all candidate
features of an image at once, instead of the reference's per-feature
recursion. Device offload is unnecessary here: per image the work is
O(features x track length) small; the hot math lives in BA.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Set, Tuple

import numpy as np

from sba_tpu.geometry import camera_models
from sba_tpu.io.colmap_models import INVALID_POINT3D


@dataclass
class TriangulatorOptions:
    """Mirrors ref: sfm/incremental_triangulator.h Options."""

    max_transitivity: int = 1
    create_max_angle_error: float = 2.0     # deg
    continue_max_angle_error: float = 2.0   # deg
    merge_max_reproj_error: float = 4.0     # px
    complete_max_reproj_error: float = 4.0  # px
    re_max_angle_error: float = 5.0         # deg (retriangulation)
    re_min_ratio: float = 0.2
    re_max_trials: int = 1
    min_angle: float = 1.5                  # deg, min triangulation angle
    ignore_two_view_tracks: bool = True
    min_focal_length_ratio: float = 0.1
    max_focal_length_ratio: float = 10.0
    max_extra_param: float = 1.0


def _rotmat(qvec):
    w, x, y, z = qvec
    return np.array([
        [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * z * w, 2 * x * z + 2 * y * w],
        [2 * x * y + 2 * z * w, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * x * w],
        [2 * x * z - 2 * y * w, 2 * y * z + 2 * x * w, 1 - 2 * x * x - 2 * y * y]])


def _projection_center(qvec, tvec):
    return -_rotmat(qvec).T @ tvec


def _image_to_normalized(camera, xy):
    """Pixel -> normalized camera coords via the camera model's
    image_to_world, on the CPU backend: these are tiny per-track batches
    called thousands of times per mapper run — dispatching them to the
    accelerator costs a host sync each (utils/host.py)."""
    import jax.numpy as jnp
    from sba_tpu.utils.host import on_host

    with on_host():
        uv = camera_models.image_to_world(
            camera.model_id, jnp.asarray(camera.params, jnp.float64),
            jnp.asarray(np.atleast_2d(xy), jnp.float64))
        return np.asarray(uv)


def _project(camera, qvec, tvec, xyz):
    """World point(s) -> pixel + depth (host; see _image_to_normalized)."""
    import jax.numpy as jnp
    from sba_tpu.utils.host import on_host

    R = _rotmat(qvec)
    pc = (np.atleast_2d(xyz) @ R.T) + tvec
    z = pc[:, 2]
    uv = pc[:, :2] / np.where(np.abs(z) > 1e-12, z, 1e-12)[:, None]
    with on_host():
        xy = camera_models.world_to_image(
            camera.model_id, jnp.asarray(camera.params, jnp.float64),
            jnp.asarray(uv, jnp.float64))
        return np.asarray(xy), z


def _triangulate_dlt(proj_mats, norm_xys):
    """Multi-view DLT from [M, 3, 4] projection matrices and [M, 2]
    normalized coords (ref: base/triangulation.cc TriangulateMultiViewPoint)."""
    A = np.zeros((2 * len(proj_mats), 4))
    for i, (P, xy) in enumerate(zip(proj_mats, norm_xys)):
        A[2 * i] = xy[0] * P[2] - P[0]
        A[2 * i + 1] = xy[1] * P[2] - P[1]
    _, _, Vt = np.linalg.svd(A)
    X = Vt[-1]
    if abs(X[3]) < 1e-12:
        return None
    return X[:3] / X[3]


def _tri_angle(center1, center2, xyz):
    b1 = xyz - center1
    b2 = xyz - center2
    c = np.dot(b1, b2) / (np.linalg.norm(b1) * np.linalg.norm(b2) + 1e-18)
    return np.degrees(np.arccos(np.clip(c, -1.0, 1.0)))


class IncrementalTriangulator:
    """Ref: sfm/incremental_triangulator.h:55."""

    def __init__(self, correspondence_graph, reconstruction, cameras=None):
        self.graph = correspondence_graph
        self.rec = reconstruction
        self._re_num_trials: Dict[int, int] = {}
        self._camera_ok_cache: Dict[int, bool] = {}

    # -- helpers ------------------------------------------------------------

    def _camera(self, image):
        return self.rec.cameras[image.camera_id]

    def _has_good_camera(self, image) -> bool:
        """Bogus-intrinsics gate (ref: incremental_triangulator.cc
        HasCameraBogusParams)."""
        cam = self._camera(image)
        cid = cam.camera_id
        if cid in self._camera_ok_cache:
            return self._camera_ok_cache[cid]
        spec = camera_models.model_by_id(cam.model_id)
        ok = True
        for i in spec.focal_idxs:
            r = cam.params[i] / max(cam.width, cam.height)
            if not (0.1 <= r <= 10.0):
                ok = False
        self._camera_ok_cache[cid] = ok
        return ok

    def _proj_matrix(self, image):
        R = _rotmat(image.qvec)
        return np.hstack([R, image.tvec.reshape(3, 1)])

    # -- main entry points --------------------------------------------------

    def triangulate_image(self, image_id: int,
                          options: Optional[TriangulatorOptions] = None
                          ) -> int:
        """Create/continue tracks from all features of a registered image.
        Returns number of observations added
        (ref: incremental_triangulator.cc:61 TriangulateImage)."""
        opt = options or TriangulatorOptions()
        image = self.rec.images[image_id]
        if not self.rec.is_registered(image_id) or \
                not self._has_good_camera(image):
            return 0
        cam = self._camera(image)
        num_tris = 0
        nf = len(image.xys)
        for f in range(nf):
            num_tris += self._triangulate_feature(image_id, f, opt)
        return num_tris

    def _triangulate_feature(self, image_id: int, feature_idx: int,
                             opt: TriangulatorOptions) -> int:
        image = self.rec.images[image_id]
        if image.point3D_ids[feature_idx] != INVALID_POINT3D:
            return 0  # already in a track

        corrs = self.graph.find_transitive_correspondences(
            image_id, feature_idx, opt.max_transitivity)
        if len(corrs) == 0:
            return 0

        # Partition correspondences: continuation candidates (tracked
        # features in registered images) vs creation partners.
        cont_points: List[int] = []
        create_partners: List[Tuple[int, int]] = []
        for oim, oft in corrs:
            oim, oft = int(oim), int(oft)
            if oim not in self.rec.images or \
                    not self.rec.is_registered(oim):
                continue
            other = self.rec.images[oim]
            if not self._has_good_camera(other):
                continue
            pid = int(other.point3D_ids[oft])
            if pid != INVALID_POINT3D:
                cont_points.append(pid)
            else:
                create_partners.append((oim, oft))

        # ContinueTrack: attach to the most common existing point if the
        # reprojection is consistent (ref: ContinueTrack .cc:~700).
        if cont_points:
            pid = int(np.bincount(np.asarray(cont_points)).argmax()) \
                if len(set(cont_points)) > 1 else cont_points[0]
            if self._try_add_observation(
                    image_id, feature_idx, pid,
                    opt.continue_max_angle_error):
                return 1

        # CreateTrack: two-view triangulation against the best partner.
        added = 0
        if create_partners:
            added = self._create_track(image_id, feature_idx,
                                       create_partners, opt)
        return added

    def _try_add_observation(self, image_id, feature_idx, point3D_id,
                             max_angle_error_deg) -> bool:
        """Angle-based consistency: reprojection error in pixels scaled to
        an angular threshold via focal length (the reference uses
        `HasPointPositiveDepth` + reproj checks)."""
        if point3D_id not in self.rec.points3D:
            return False
        image = self.rec.images[image_id]
        cam = self._camera(image)
        pt = self.rec.points3D[point3D_id]
        xy_proj, z = _project(cam, image.qvec, image.tvec, pt.xyz)
        if z[0] <= 0:
            return False
        err = np.linalg.norm(xy_proj[0] - image.xys[feature_idx])
        focal = cam.mean_focal_length()
        max_err_px = np.tan(np.radians(max_angle_error_deg)) * focal
        if err > max_err_px:
            return False
        self.rec.add_observation(point3D_id, image_id, feature_idx)
        return True

    def _create_track(self, image_id, feature_idx, partners, opt) -> int:
        image = self.rec.images[image_id]
        cam = self._camera(image)
        center0 = _projection_center(image.qvec, image.tvec)
        P0 = self._proj_matrix(image)
        xy0n = _image_to_normalized(cam, image.xys[feature_idx])[0]

        best = None  # (angle, xyz, partner)
        for (oim, oft) in partners:
            other = self.rec.images[oim]
            ocam = self._camera(other)
            P1 = self._proj_matrix(other)
            xy1n = _image_to_normalized(ocam, other.xys[oft])[0]
            xyz = _triangulate_dlt([P0, P1], [xy0n, xy1n])
            if xyz is None:
                continue
            # Cheirality both views.
            z0 = (_rotmat(image.qvec) @ xyz + image.tvec)[2]
            z1 = (_rotmat(other.qvec) @ xyz + other.tvec)[2]
            if z0 <= 0 or z1 <= 0:
                continue
            center1 = _projection_center(other.qvec, other.tvec)
            ang = _tri_angle(center0, center1, xyz)
            if ang < opt.min_angle:
                continue
            # Reprojection check in both views at create_max_angle_error.
            ok = True
            for (im, ft, cm_, xyz_px) in ((image, feature_idx, cam, None),
                                          (other, oft, ocam, None)):
                xy_p, _ = _project(cm_, im.qvec, im.tvec, xyz)
                err = np.linalg.norm(xy_p[0] - im.xys[ft])
                max_err = np.tan(np.radians(opt.create_max_angle_error)) \
                    * cm_.mean_focal_length()
                if err > max_err:
                    ok = False
                    break
            if not ok:
                continue
            if best is None or ang > best[0]:
                best = (ang, xyz, (oim, oft))

        if best is None:
            return 0
        ang, xyz, (oim, oft) = best
        track = [(image_id, feature_idx), (oim, int(oft))]
        # Pull in remaining partners that agree with the new point.
        for (pim, pft) in partners:
            if (pim, pft) == (oim, oft):
                continue
            other = self.rec.images[pim]
            ocam = self._camera(other)
            xy_p, z = _project(ocam, other.qvec, other.tvec, xyz)
            if z[0] <= 0:
                continue
            err = np.linalg.norm(xy_p[0] - other.xys[pft])
            max_err = np.tan(np.radians(opt.create_max_angle_error)) \
                * ocam.mean_focal_length()
            if err <= max_err and \
                    other.point3D_ids[pft] == INVALID_POINT3D:
                track.append((pim, int(pft)))
        if opt.ignore_two_view_tracks and len(track) < 2:
            return 0
        self.rec.add_point3d(xyz, track)
        return len(track)

    # -- track maintenance --------------------------------------------------

    def complete_image(self, image_id: int,
                       options: Optional[TriangulatorOptions] = None) -> int:
        """Attach untracked features of a registered image to existing
        tracks (ref: CompleteImage .cc:232)."""
        opt = options or TriangulatorOptions()
        if not self.rec.is_registered(image_id):
            return 0
        image = self.rec.images[image_id]
        n = 0
        for f in range(len(image.xys)):
            if image.point3D_ids[f] != INVALID_POINT3D:
                continue
            corrs = self.graph.find_transitive_correspondences(
                image_id, f, opt.max_transitivity)
            pids = []
            for oim, oft in corrs:
                oim = int(oim)
                if oim in self.rec.images and self.rec.is_registered(oim):
                    pid = int(self.rec.images[oim].point3D_ids[int(oft)])
                    if pid != INVALID_POINT3D:
                        pids.append(pid)
            for pid in sorted(set(pids)):
                if self._try_add_observation(
                        image_id, f, pid, opt.continue_max_angle_error):
                    n += 1
                    break
        return n

    def complete_tracks(self, point3D_ids: Sequence[int],
                        options: Optional[TriangulatorOptions] = None) -> int:
        """Grow given tracks transitively (ref: CompleteTracks .cc:261)."""
        opt = options or TriangulatorOptions()
        n = 0
        for pid in list(point3D_ids):
            if pid not in self.rec.points3D:
                continue
            n += self._complete_track(pid, opt)
        return n

    def _complete_track(self, point3D_id: int,
                        opt: TriangulatorOptions) -> int:
        pt = self.rec.points3D[point3D_id]
        n = 0
        queue = list(zip(pt.image_ids, pt.point2D_idxs))
        seen: Set[Tuple[int, int]] = set(
            (int(a), int(b)) for a, b in queue)
        while queue:
            im, ft = queue.pop()
            for oim, oft in self.graph.find_correspondences(int(im), int(ft)):
                kk = (int(oim), int(oft))
                if kk in seen:
                    continue
                seen.add(kk)
                oim, oft = kk
                if oim not in self.rec.images or \
                        not self.rec.is_registered(oim):
                    continue
                other = self.rec.images[oim]
                if other.point3D_ids[oft] != INVALID_POINT3D:
                    continue
                if self._try_add_observation(
                        oim, oft, point3D_id,
                        np.degrees(np.arctan(
                            opt.complete_max_reproj_error /
                            self._camera(other).mean_focal_length()))):
                    n += 1
                    queue.append((oim, oft))
        return n

    def merge_tracks(self, point3D_ids: Sequence[int],
                     options: Optional[TriangulatorOptions] = None) -> int:
        """Merge tracks linked by correspondences when the merged point
        keeps all reprojections small (ref: MergeTracks .cc:290)."""
        opt = options or TriangulatorOptions()
        n = 0
        for pid in list(point3D_ids):
            if pid not in self.rec.points3D:
                continue
            n += self._merge_track(pid, opt)
        return n

    def _merge_track(self, point3D_id: int, opt: TriangulatorOptions) -> int:
        pt = self.rec.points3D.get(point3D_id)
        if pt is None:
            return 0
        # Find candidate partner tracks via correspondences.
        partners: Dict[int, int] = {}
        for im, ft in zip(pt.image_ids, pt.point2D_idxs):
            for oim, oft in self.graph.find_correspondences(int(im), int(ft)):
                oim = int(oim)
                if oim not in self.rec.images:
                    continue
                pid2 = int(self.rec.images[oim].point3D_ids[int(oft)])
                if pid2 != INVALID_POINT3D and pid2 != point3D_id:
                    partners[pid2] = partners.get(pid2, 0) + 1
        merged = 0
        for pid2, _cnt in sorted(partners.items(), key=lambda kv: -kv[1]):
            if pid2 not in self.rec.points3D or \
                    point3D_id not in self.rec.points3D:
                break
            p1 = self.rec.points3D[point3D_id]
            p2 = self.rec.points3D[pid2]
            w1, w2 = len(p1.image_ids), len(p2.image_ids)
            xyz = (w1 * p1.xyz + w2 * p2.xyz) / (w1 + w2)
            ok = True
            for p in (p1, p2):
                for im, ft in zip(p.image_ids, p.point2D_idxs):
                    image = self.rec.images[int(im)]
                    cam = self._camera(image)
                    xy_p, z = _project(cam, image.qvec, image.tvec, xyz)
                    if z[0] <= 0 or np.linalg.norm(
                            xy_p[0] - image.xys[int(ft)]) \
                            > opt.merge_max_reproj_error:
                        ok = False
                        break
                if not ok:
                    break
            if ok:
                self.rec.merge_points(point3D_id, pid2)
                merged += 1
                if point3D_id not in self.rec.points3D:
                    break
        return merged

    def retriangulate(self,
                      options: Optional[TriangulatorOptions] = None) -> int:
        """Re-triangulate under-reconstructed image pairs
        (ref: Retriangulate .cc:421). Returns new observations."""
        opt = options or TriangulatorOptions()
        n = 0
        relaxed = TriangulatorOptions(
            **{**opt.__dict__, "create_max_angle_error": opt.re_max_angle_error})
        for (i1, i2), m in self.graph.image_pairs.items():
            if i1 not in self.rec.images or i2 not in self.rec.images:
                continue
            if not (self.rec.is_registered(i1) and self.rec.is_registered(i2)):
                continue
            im1, im2 = self.rec.images[i1], self.rec.images[i2]
            tri = sum(1 for a, b in m
                      if im1.point3D_ids[int(a)] != INVALID_POINT3D
                      and im1.point3D_ids[int(a)] == im2.point3D_ids[int(b)])
            ratio = tri / max(len(m), 1)
            if ratio >= opt.re_min_ratio:
                continue
            trials = self._re_num_trials.get((i1, i2), 0)
            if trials >= opt.re_max_trials:
                continue
            self._re_num_trials[(i1, i2)] = trials + 1
            for a, b in m:
                a = int(a)
                if im1.point3D_ids[a] == INVALID_POINT3D:
                    n += self._triangulate_feature(i1, a, relaxed)
        return n
