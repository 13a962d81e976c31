"""Scene model: host `Reconstruction` container + dense `SceneArrays` view.

Capability parity with ref: src/base/reconstruction.{h,cc} (register /
deregister images, add/merge/delete observations, filtering by negative
depth / reprojection error / triangulation angle, statistics, binary/text
serialization, PLY export).

TPU-first split:
- `Reconstruction` is a thin host-side dict container (ids are sparse and
  mutate during incremental mapping — that's host work).
- `SceneArrays` is the dense struct-of-arrays pytree the device code uses:
  poses ``[N,4]+[N,3]``, camera params ``[C,12]`` (zero-padded), points
  ``[P,3]``, observations as a COO table ``(obs_image, obs_point, obs_xy)``.
  All heavy ops (filters, stats, BA) run on these arrays in one launch,
  replacing the reference's per-point C++ loops.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from sba_tpu.geometry import camera_models
from sba_tpu.io import colmap_models as cm
from sba_tpu.io.colmap_models import Camera, Image, Point3D


@dataclass
class SceneArrays:
    """Dense SoA view of a reconstruction (numpy on host; upload as needed).

    Index spaces: images 0..N-1, cameras 0..C-1, points 0..P-1 are dense
    re-indexings of the sparse COLMAP ids (mapping kept alongside).
    """

    image_ids: np.ndarray        # [N] original ids
    qvecs: np.ndarray            # [N, 4] w-first, world->camera
    tvecs: np.ndarray            # [N, 3]
    image_camera_idx: np.ndarray  # [N] -> camera row
    camera_ids: np.ndarray       # [C]
    camera_model_ids: np.ndarray  # [C]
    camera_params: np.ndarray    # [C, MAX_NUM_PARAMS]
    point_ids: np.ndarray        # [P]
    points: np.ndarray           # [P, 3]
    obs_image: np.ndarray        # [O] image row index
    obs_point: np.ndarray        # [O] point row index
    obs_xy: np.ndarray           # [O, 2]
    image_names: List[str] = field(default_factory=list)

    @property
    def num_images(self):
        return len(self.image_ids)

    @property
    def num_points(self):
        return len(self.point_ids)

    @property
    def num_observations(self):
        return len(self.obs_image)

    def obs_camera_idx(self):
        return self.image_camera_idx[self.obs_image]


class Reconstruction:
    """Host scene container with COLMAP-compatible IO.

    ref: src/base/reconstruction.h:64. Mutating operations used by the
    incremental mapper live here; batch math lives in `SceneArrays` +
    the optim/ modules.
    """

    def __init__(self):
        self.cameras: Dict[int, Camera] = {}
        self.images: Dict[int, Image] = {}
        self.points3D: Dict[int, Point3D] = {}
        self.registered_image_ids: List[int] = []
        self._next_point3D_id = 1

    # -- construction ------------------------------------------------------

    def add_camera(self, camera: Camera):
        assert camera.camera_id not in self.cameras
        self.cameras[camera.camera_id] = camera

    def add_image(self, image: Image, registered: bool = False):
        assert image.image_id not in self.images
        self.images[image.image_id] = image
        if registered:
            self.register_image(image.image_id)

    def register_image(self, image_id: int):
        if image_id not in self.registered_image_ids:
            self.registered_image_ids.append(image_id)

    def deregister_image(self, image_id: int):
        """Remove all observations of an image and unregister it
        (ref: reconstruction.cc DeRegisterImage)."""
        im = self.images[image_id]
        for idx, pid in enumerate(im.point3D_ids):
            if pid != -1:
                self._remove_observation(int(pid), image_id, idx)
        im.point3D_ids = np.full_like(im.point3D_ids, -1)
        if image_id in self.registered_image_ids:
            self.registered_image_ids.remove(image_id)

    def is_registered(self, image_id: int) -> bool:
        return image_id in self.registered_image_ids

    def add_point3d(self, xyz, track: Sequence[Tuple[int, int]], rgb=(0, 0, 0), error=-1.0) -> int:
        pid = self._next_point3D_id
        self._next_point3D_id += 1
        image_ids = np.array([t[0] for t in track], dtype=np.int32)
        p2d = np.array([t[1] for t in track], dtype=np.int32)
        self.points3D[pid] = Point3D(pid, np.asarray(xyz, dtype=np.float64),
                                     np.asarray(rgb, dtype=np.uint8), error, image_ids, p2d)
        for image_id, idx in track:
            self.images[image_id].point3D_ids[idx] = pid
        return pid

    def add_observation(self, point3D_id: int, image_id: int, point2D_idx: int):
        p = self.points3D[point3D_id]
        p.image_ids = np.append(p.image_ids, np.int32(image_id))
        p.point2D_idxs = np.append(p.point2D_idxs, np.int32(point2D_idx))
        self.images[image_id].point3D_ids[point2D_idx] = point3D_id

    def _remove_observation(self, point3D_id: int, image_id: int, point2D_idx: int):
        p = self.points3D.get(point3D_id)
        if p is None:
            return
        keep = ~((p.image_ids == image_id) & (p.point2D_idxs == point2D_idx))
        p.image_ids = p.image_ids[keep]
        p.point2D_idxs = p.point2D_idxs[keep]
        if len(p.image_ids) == 0:
            del self.points3D[point3D_id]

    def delete_observation(self, image_id: int, point2D_idx: int):
        pid = int(self.images[image_id].point3D_ids[point2D_idx])
        if pid == -1:
            return
        self.images[image_id].point3D_ids[point2D_idx] = -1
        self._remove_observation(pid, image_id, point2D_idx)
        # As the reference: tracks of length < 2 after removal get deleted.
        p = self.points3D.get(pid)
        if p is not None and len(p.image_ids) < 2:
            self.delete_point3d(pid)

    def delete_point3d(self, point3D_id: int):
        p = self.points3D.pop(point3D_id, None)
        if p is None:
            return
        for image_id, idx in zip(p.image_ids, p.point2D_idxs):
            self.images[int(image_id)].point3D_ids[int(idx)] = -1

    def merge_points(self, pid1: int, pid2: int) -> Optional[int]:
        """Merge two 3D points, track-length-weighted mean position
        (ref: reconstruction.cc MergePoints3D)."""
        p1 = self.points3D.get(pid1)
        p2 = self.points3D.get(pid2)
        if p1 is None or p2 is None:
            return None
        n1, n2 = len(p1.image_ids), len(p2.image_ids)
        xyz = (n1 * p1.xyz + n2 * p2.xyz) / (n1 + n2)
        rgb = ((n1 * p1.xyz.astype(np.float64) * 0 + n1 * p1.rgb + n2 * p2.rgb) / (n1 + n2)).astype(np.uint8)
        track = [(int(i), int(j)) for i, j in zip(p1.image_ids, p1.point2D_idxs)]
        track += [(int(i), int(j)) for i, j in zip(p2.image_ids, p2.point2D_idxs)]
        self.delete_point3d(pid1)
        self.delete_point3d(pid2)
        return self.add_point3d(xyz, track, rgb=rgb)

    # -- statistics (ref: reconstruction.cc ComputeMean*) ------------------

    def num_points3d(self) -> int:
        return len(self.points3D)

    def num_registered_images(self) -> int:
        return len(self.registered_image_ids)

    def compute_num_observations(self) -> int:
        return sum(len(p.image_ids) for p in self.points3D.values())

    def compute_mean_track_length(self) -> float:
        if not self.points3D:
            return 0.0
        return self.compute_num_observations() / len(self.points3D)

    def compute_mean_observations_per_reg_image(self) -> float:
        n = self.num_registered_images()
        return self.compute_num_observations() / n if n else 0.0

    def update_point_errors(self) -> None:
        """Set every Point3D.error to its track's mean reprojection error
        (the reference maintains this during track ops; batch recompute
        is cheaper here)."""
        from sba_tpu.geometry.projection import project_points

        for p in self.points3D.values():
            errs = []
            for image_id, idx in zip(p.image_ids, p.point2D_idxs):
                im = self.images[int(image_id)]
                cam = self.cameras[im.camera_id]
                xy, z = project_points(im.qvec, im.tvec, p.xyz,
                                       cam.model_id, cam.params)
                errs.append(float(np.linalg.norm(
                    np.asarray(xy) - im.xys[int(idx)])))
            p.error = float(np.mean(errs)) if errs else -1.0

    def compute_mean_reprojection_error(self) -> float:
        if any(p.error < 0 for p in self.points3D.values()):
            self.update_point_errors()
        errs = [p.error for p in self.points3D.values() if p.error >= 0]
        return float(np.mean(errs)) if errs else 0.0

    # -- filtering (vectorized; ref: reconstruction.cc FilterPoints3D,
    #    FilterObservationsWithNegativeDepth) --------------------------------

    def filter_observations_with_negative_depth(self) -> int:
        """Delete observations whose point is behind the camera — the gauge
        step SBA/GSBA controllers apply before solving
        (ref: src/controllers/semantic_bundle_adjustment.cc:96-101)."""
        from sba_tpu.geometry.quaternions import quat_rotate

        num_filtered = 0
        for image_id in list(self.registered_image_ids):
            im = self.images[image_id]
            tri = np.nonzero(im.point3D_ids != -1)[0]
            if len(tri) == 0:
                continue
            xyz = np.stack([self.points3D[int(im.point3D_ids[i])].xyz for i in tri])
            p_cam = np.asarray(quat_rotate(im.qvec, xyz)) + im.tvec
            bad = tri[p_cam[:, 2] <= 0]
            for idx in bad:
                self.delete_observation(image_id, int(idx))
                num_filtered += 1
        return num_filtered

    def filter_points_large_reprojection_error(self, max_error_px: float) -> int:
        """Delete observations with reprojection error above threshold;
        drop short tracks (ref: reconstruction.cc FilterPoints3DWithLargeReprojectionError)."""
        from sba_tpu.geometry.projection import project_points

        num_filtered = 0
        max_sq = max_error_px * max_error_px
        for pid in list(self.points3D.keys()):
            p = self.points3D.get(pid)
            if p is None:
                continue
            bad_obs = []
            for image_id, idx in zip(p.image_ids, p.point2D_idxs):
                im = self.images[int(image_id)]
                cam = self.cameras[im.camera_id]
                xy, z = project_points(im.qvec, im.tvec, p.xyz, cam.model_id, cam.params)
                err = float(np.sum((np.asarray(xy) - im.xys[int(idx)]) ** 2))
                if z <= 0 or err > max_sq:
                    bad_obs.append((int(image_id), int(idx)))
            for image_id, idx in bad_obs:
                self.delete_observation(image_id, idx)
                num_filtered += 1
        return num_filtered

    def filter_points_min_tri_angle(self, min_tri_angle_deg: float) -> int:
        """Delete points whose maximum pairwise triangulation angle over
        the track is below the threshold
        (ref: reconstruction.cc FilterPoints3DWithSmallTriangulationAngle)."""
        from sba_tpu.geometry.quaternions import quat_rotate

        centers = {}
        for iid in self.registered_image_ids:
            im = self.images[iid]
            q_inv = np.array([im.qvec[0], -im.qvec[1], -im.qvec[2],
                              -im.qvec[3]])
            centers[iid] = -np.asarray(quat_rotate(q_inv, im.tvec))
        min_cos = np.cos(np.deg2rad(min_tri_angle_deg))
        num_filtered = 0
        for pid in list(self.points3D.keys()):
            p = self.points3D.get(pid)
            if p is None:
                continue
            rays = []
            for image_id in p.image_ids:
                c = centers.get(int(image_id))
                if c is None:
                    continue
                r = p.xyz - c
                n = np.linalg.norm(r)
                if n > 1e-12:
                    rays.append(r / n)
            ok = False
            for i in range(len(rays)):
                for j in range(i + 1, len(rays)):
                    if abs(float(rays[i] @ rays[j])) < min_cos:
                        ok = True
                        break
                if ok:
                    break
            if not ok:
                num_filtered += len(p.image_ids)
                self.delete_point3d(pid)
        return num_filtered

    def filter_images(self, min_focal_length_ratio: float = 0.1,
                      max_focal_length_ratio: float = 10.0,
                      max_extra_param: float = 100.0) -> list:
        """Deregister images with degenerate intrinsics
        (ref: reconstruction.cc FilterImages / camera HasBogusParams)."""
        from sba_tpu.geometry import camera_models

        filtered = []
        for iid in list(self.registered_image_ids):
            im = self.images[iid]
            cam = self.cameras[im.camera_id]
            spec = camera_models.model_by_id(cam.model_id)
            ratio_ok = True
            for fi in spec.focal_idxs:
                ratio = cam.params[fi] / max(cam.width, cam.height)
                if not (min_focal_length_ratio < ratio
                        < max_focal_length_ratio):
                    ratio_ok = False
            extra_ok = all(abs(cam.params[i]) <= max_extra_param
                           for i in spec.extra_idxs)
            if not (ratio_ok and extra_ok):
                self.deregister_image(iid)
                filtered.append(iid)
        return filtered

    def compute_bounding_box(self, p0: float = 0.0, p1: float = 1.0):
        """Percentile bounding box over the 3D points
        (ref: reconstruction.cc ComputeBoundingBox)."""
        if not self.points3D:
            return np.zeros(3), np.zeros(3)
        pts = np.stack([p.xyz for p in self.points3D.values()])
        lo = np.quantile(pts, p0, axis=0)
        hi = np.quantile(pts, p1, axis=0)
        return lo, hi

    def crop(self, bbox) -> "Reconstruction":
        """New reconstruction containing the points inside bbox
        = (lo [3], hi [3]) and the images observing them; images keep
        their pose, registration limited to images with >= 1 surviving
        point (ref: reconstruction.cc Crop)."""
        import copy

        lo, hi = np.asarray(bbox[0]), np.asarray(bbox[1])
        out = Reconstruction()
        out.cameras = copy.deepcopy(self.cameras)
        for iid, im in self.images.items():
            im2 = copy.deepcopy(im)
            im2.point3D_ids = np.full_like(im.point3D_ids, -1)
            out.images[iid] = im2
        reg = set()
        for pid, p in self.points3D.items():
            if np.all(p.xyz >= lo) and np.all(p.xyz <= hi):
                track = [(int(i), int(ix))
                         for i, ix in zip(p.image_ids, p.point2D_idxs)]
                new_pid = out.add_point3d(p.xyz.copy(), track,
                                          rgb=tuple(p.rgb),
                                          error=p.error)
                del new_pid
                reg.update(int(i) for i in p.image_ids)
        out.registered_image_ids = [i for i in self.registered_image_ids
                                    if i in reg]
        return out

    def extract_colors(self, image_path: str) -> int:
        """Mean RGB over the track's observations for every 3D point
        (ref: reconstruction.cc ExtractColorsForAllImages). Returns the
        number of colored points."""
        import os

        from PIL import Image as PILImage

        sums = {pid: np.zeros(3) for pid in self.points3D}
        counts = {pid: 0 for pid in self.points3D}
        for iid in self.registered_image_ids:
            im = self.images[iid]
            path = os.path.join(image_path, im.name)
            if not os.path.exists(path):
                continue
            with PILImage.open(path) as f:
                rgb = np.asarray(f.convert("RGB"), np.float64)
            h, w = rgb.shape[:2]
            tri = np.nonzero(im.point3D_ids != -1)[0]
            for idx in tri:
                x, y = im.xys[int(idx)]
                xi = int(np.clip(round(x - 0.5), 0, w - 1))
                yi = int(np.clip(round(y - 0.5), 0, h - 1))
                pid = int(im.point3D_ids[int(idx)])
                if pid in sums:
                    sums[pid] += rgb[yi, xi]
                    counts[pid] += 1
        colored = 0
        for pid, p in self.points3D.items():
            if counts[pid]:
                p.rgb = np.clip(sums[pid] / counts[pid], 0,
                                255).astype(np.uint8)
                colored += 1
        return colored

    # -- IO ----------------------------------------------------------------

    @classmethod
    def read(cls, path, ext: Optional[str] = None) -> "Reconstruction":
        rec = cls()
        cameras, images, points = cm.read_model(path, ext)
        rec.cameras = cameras
        rec.images = images
        rec.points3D = points
        # All images with a pose in the model are considered registered.
        rec.registered_image_ids = list(images.keys())
        rec._next_point3D_id = (max(points.keys()) + 1) if points else 1
        return rec

    def write(self, path, ext=".bin") -> None:
        # Only registered images are serialized (ref: reconstruction.cc
        # WriteImagesBinary/Text skip !IsRegistered()).
        reg = set(self.registered_image_ids)
        images = {iid: im for iid, im in self.images.items() if iid in reg}
        cm.write_model(self.cameras, images, self.points3D, path, ext)

    def export_ply(self, path) -> None:
        cm.export_ply(self.points3D, path)

    # -- dense view --------------------------------------------------------

    def to_arrays(self, image_ids: Optional[Sequence[int]] = None) -> SceneArrays:
        """Build the dense SoA view over the given (default: registered)
        images and every 3D point they observe."""
        if image_ids is None:
            image_ids = list(self.registered_image_ids)
        image_ids = list(image_ids)
        image_row = {iid: i for i, iid in enumerate(image_ids)}

        cam_ids = sorted({self.images[i].camera_id for i in image_ids})
        cam_row = {cid: i for i, cid in enumerate(cam_ids)}

        qvecs = np.stack([self.images[i].qvec for i in image_ids]) if image_ids else np.zeros((0, 4))
        tvecs = np.stack([self.images[i].tvec for i in image_ids]) if image_ids else np.zeros((0, 3))
        image_cam = np.array([cam_row[self.images[i].camera_id] for i in image_ids], dtype=np.int32)

        cam_model_ids = np.array([self.cameras[c].model_id for c in cam_ids], dtype=np.int32)
        cam_params = np.zeros((len(cam_ids), camera_models.MAX_NUM_PARAMS))
        for c in cam_ids:
            p = self.cameras[c].params
            cam_params[cam_row[c], : len(p)] = p

        # Points observed by the selected images.
        pid_set = set()
        for iid in image_ids:
            for pid in self.images[iid].point3D_ids:
                if pid != -1:
                    pid_set.add(int(pid))
        point_ids = sorted(pid_set)
        point_row = {pid: i for i, pid in enumerate(point_ids)}
        points = (np.stack([self.points3D[p].xyz for p in point_ids])
                  if point_ids else np.zeros((0, 3)))

        obs_image, obs_point, obs_xy = [], [], []
        for iid in image_ids:
            im = self.images[iid]
            tri = np.nonzero(im.point3D_ids != -1)[0]
            for idx in tri:
                pid = int(im.point3D_ids[idx])
                if pid in point_row:
                    obs_image.append(image_row[iid])
                    obs_point.append(point_row[pid])
                    obs_xy.append(im.xys[idx])

        return SceneArrays(
            image_ids=np.array(image_ids, dtype=np.int64),
            qvecs=np.asarray(qvecs, dtype=np.float64),
            tvecs=np.asarray(tvecs, dtype=np.float64),
            image_camera_idx=image_cam,
            camera_ids=np.array(cam_ids, dtype=np.int64),
            camera_model_ids=cam_model_ids,
            camera_params=cam_params,
            point_ids=np.array(point_ids, dtype=np.int64),
            points=np.asarray(points, dtype=np.float64),
            obs_image=np.array(obs_image, dtype=np.int32),
            obs_point=np.array(obs_point, dtype=np.int32),
            obs_xy=(np.stack(obs_xy) if obs_xy else np.zeros((0, 2))).astype(np.float64),
            image_names=[self.images[i].name for i in image_ids],
        )

    def update_from_arrays(self, arrays: SceneArrays, qvecs=None, tvecs=None,
                           points=None, camera_params=None) -> None:
        """Write optimized values back into the sparse containers."""
        if qvecs is not None:
            for row, iid in enumerate(arrays.image_ids):
                self.images[int(iid)].qvec = np.asarray(qvecs[row], dtype=np.float64)
        if tvecs is not None:
            for row, iid in enumerate(arrays.image_ids):
                self.images[int(iid)].tvec = np.asarray(tvecs[row], dtype=np.float64)
        if points is not None:
            for row, pid in enumerate(arrays.point_ids):
                self.points3D[int(pid)].xyz = np.asarray(points[row], dtype=np.float64)
        if camera_params is not None:
            for row, cid in enumerate(arrays.camera_ids):
                k = len(self.cameras[int(cid)].params)
                self.cameras[int(cid)].params = np.asarray(camera_params[row][:k], dtype=np.float64)
