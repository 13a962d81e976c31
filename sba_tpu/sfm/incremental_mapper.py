"""Incremental mapper core: init-pair, register-next, local/global BA.

Capability parity with ref: src/sfm/incremental_mapper.{h,cc}
(`IncrementalMapper` incremental_mapper.h:64): FindInitialImagePair :146,
EstimateInitialTwoViewGeometry :1142, RegisterInitialImagePair :258,
FindNextImages :202 (visibility-pyramid ranking), RegisterNextImage :344
(2D-3D gathering :368-416, P3P LORANSAC :435-492, pose refinement :502,
track continuation :512-526), FindLocalBundle :942, AdjustLocalBundle,
AdjustGlobalBundle :668, FilterImages/FilterPoints :749-783.

TPU-first split: registration ORDER is inherently sequential and
data-dependent -> host Python loop; each step's inner math (RANSAC
hypothesis batches, pose refinement, triangulation, BA) is a batched
device program from estimators/, optim/ba. The reference's per-focal-
sample ThreadPool (estimators/pose.cc:105) becomes one vmapped RANSAC
whose data includes the focal scaling.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sba_tpu.estimators.pose import (
    estimate_absolute_pose,
    refine_absolute_pose,
)
from sba_tpu.estimators.two_view_geometry import (
    TwoViewConfig,
    TwoViewGeometryOptions,
    estimate_two_view_geometry,
)
from sba_tpu.geometry import camera_models
from sba_tpu.geometry.quaternions import (
    quat_multiply,
    quat_rotate,
    quat_to_rotmat,
)
from sba_tpu.io.colmap_models import INVALID_POINT3D, Camera, Image
from sba_tpu.models.reconstruction import Reconstruction
from sba_tpu.optim.ba import BAOptions, build_problem, bundle_adjust, \
    pad_problem_pow2
from sba_tpu.sfm.incremental_triangulator import (
    IncrementalTriangulator,
    TriangulatorOptions,
    _image_to_normalized,
    _project,
    _projection_center,
    _rotmat,
    _tri_angle,
)
from sba_tpu.sfm.visibility_pyramid import VisibilityPyramid


@dataclass
class IncrementalMapperOptions:
    """Mirrors ref: sfm/incremental_mapper.h:66-134 Options."""

    init_min_num_inliers: int = 100
    init_max_error: float = 4.0
    init_max_forward_motion: float = 0.95
    init_min_tri_angle: float = 16.0       # deg
    init_max_reg_trials: int = 2
    abs_pose_max_error: float = 12.0       # px
    abs_pose_min_num_inliers: int = 30
    abs_pose_min_inlier_ratio: float = 0.25
    abs_pose_refine_focal_length: bool = True
    abs_pose_refine_extra_params: bool = True
    local_ba_num_images: int = 6
    local_ba_min_tri_angle: float = 6.0    # deg
    min_tri_angle: float = 1.5             # deg (point filtering)
    filter_max_reproj_error: float = 4.0   # px
    min_focal_length_ratio: float = 0.1
    max_focal_length_ratio: float = 10.0
    max_extra_param: float = 1.0
    max_reg_trials: int = 3
    num_threads: int = -1                  # obsolete on TPU; kept for parity


class IncrementalMapper:
    """Host driver over device kernels (ref: incremental_mapper.h:64)."""

    def __init__(self, database_cache):
        self.cache = database_cache
        self.rec: Optional[Reconstruction] = None
        self.triangulator: Optional[IncrementalTriangulator] = None
        self._num_reg_trials: Dict[int, int] = {}
        self._init_pair_tested: Set[Tuple[int, int]] = {}
        self._init_pair_tested = set()
        self._filtered_images: Set[int] = set()
        self._existing_image_ids: Set[int] = set()
        self._visibility: Dict[int, VisibilityPyramid] = {}
        self._prng = np.random.default_rng(0)
        self._seed_counter = 0

    # ------------------------------------------------------------------
    # lifecycle
    # ------------------------------------------------------------------

    def begin_reconstruction(self, reconstruction: Reconstruction):
        """Attach to a (possibly pre-seeded) reconstruction
        (ref: IncrementalMapper::BeginReconstruction)."""
        self.rec = reconstruction
        # Import DB images/cameras not yet in the reconstruction.
        for cid, cam in self.cache.cameras.items():
            if cid not in reconstruction.cameras:
                reconstruction.add_camera(Camera(
                    camera_id=cid, model_id=cam.model_id, width=cam.width,
                    height=cam.height,
                    params=np.asarray(cam.params, np.float64)))
        for iid, img in self.cache.images.items():
            if iid not in reconstruction.images:
                reconstruction.add_image(Image(
                    image_id=iid, qvec=np.array([1.0, 0, 0, 0]),
                    tvec=np.zeros(3), camera_id=img.camera_id,
                    name=img.name,
                    xys=np.asarray(img.keypoints[:, :2], np.float64),
                    point3D_ids=np.full(len(img.keypoints),
                                        INVALID_POINT3D, np.int64)))
        self._existing_image_ids = set(
            i for i in reconstruction.images if reconstruction.is_registered(i))
        self.triangulator = IncrementalTriangulator(
            self.cache.correspondence_graph, reconstruction)

    def _next_seed(self) -> int:
        self._seed_counter += 1
        return self._seed_counter

    # ------------------------------------------------------------------
    # initialization
    # ------------------------------------------------------------------

    def find_initial_image_pair(self, options: IncrementalMapperOptions
                                ) -> Optional[Tuple[int, int, dict]]:
        """Rank image pairs by correspondence count; verify two-view
        geometry with cheirality + triangulation-angle gates
        (ref: FindInitialImagePair :146 + EstimateInitialTwoViewGeometry
        :1142)."""
        g = self.cache.correspondence_graph
        ranked = sorted(g.image_pairs.items(),
                        key=lambda kv: -len(kv[1]))
        for (i1, i2), matches in ranked:
            if (i1, i2) in self._init_pair_tested:
                continue
            self._init_pair_tested.add((i1, i2))
            info = self._estimate_initial_two_view(i1, i2, matches, options)
            if info is not None:
                return i1, i2, info
        return None

    def _camera_fxycxy(self, image_id):
        cam = self.rec.cameras[self.rec.images[image_id].camera_id]
        spec = camera_models.model_by_id(cam.model_id)
        f_idx = spec.focal_idxs
        fx = cam.params[f_idx[0]]
        fy = cam.params[f_idx[-1]]
        cx, cy = cam.params[spec.principal_idxs[0]], \
            cam.params[spec.principal_idxs[1]]
        return (fx, fy, cx, cy)

    def _estimate_initial_two_view(self, i1, i2, matches, options
                                   ) -> Optional[dict]:
        im1, im2 = self.rec.images[i1], self.rec.images[i2]
        cam1 = self.rec.cameras[im1.camera_id]
        cam2 = self.rec.cameras[im2.camera_id]
        xy1 = im1.xys[matches[:, 0]]
        xy2 = im2.xys[matches[:, 1]]
        # Power-of-two bucket + mask: init-pair search tries MANY pairs,
        # each with a distinct match count — padding makes them share
        # compiled RANSAC programs (same discipline as registration).
        n_real = len(xy1)
        bucket = 1 << int(np.ceil(np.log2(max(n_real, 32))))
        pad = bucket - n_real
        xy1 = np.concatenate([xy1, np.zeros((pad, 2))])
        xy2 = np.concatenate([xy2, np.zeros((pad, 2))])
        vmask = np.concatenate([np.ones(n_real, bool),
                                np.zeros(pad, bool)])
        res = estimate_two_view_geometry(
            xy1, xy2, self._camera_fxycxy(i1), self._camera_fxycxy(i2),
            image_size1=(cam1.width, cam1.height),
            image_size2=(cam2.width, cam2.height),
            options=TwoViewGeometryOptions(
                max_error=options.init_max_error,
                min_num_inliers=options.init_min_num_inliers),
            seed=self._next_seed(), mask=vmask)
        # CALIBRATED pairs take pose from E; PLANAR pairs from the
        # homography decomposition (estimate_two_view_geometry resolves
        # PLANAR_OR_PANORAMIC to PLANAR/PANORAMIC via |t|). PANORAMIC
        # (pure rotation) cannot initialize — the reference reaches the
        # same rejection through its init_min_tri_angle check
        # (ref: sfm/incremental_mapper.cc:1188-1190).
        if res.config not in (int(TwoViewConfig.CALIBRATED),
                              int(TwoViewConfig.PLANAR)) or \
                res.num_inliers < options.init_min_num_inliers:
            return None
        # Cheirality + angle: triangulate inliers with the relative pose.
        from sba_tpu.geometry.quaternions import np_quat_to_rotmat
        R = np_quat_to_rotmat(res.qvec)
        t = res.tvec
        inl = res.inlier_mask
        n1 = _image_to_normalized(cam1, xy1[inl])
        n2 = _image_to_normalized(cam2, xy2[inl])
        pts = _triangulate_two_view(np.eye(3), np.zeros(3), R, t, n1, n2)
        z1 = pts[:, 2]
        z2 = (pts @ R.T + t)[:, 2]
        ok = (z1 > 0) & (z2 > 0)
        if ok.sum() < options.init_min_num_inliers:
            return None
        c1 = np.zeros(3)
        c2 = -R.T @ t
        angles = np.array([_tri_angle(c1, c2, p) for p in pts[ok]])
        if np.median(angles) < options.init_min_tri_angle:
            return None
        # Forward-motion degeneracy gate (ref: init_max_forward_motion).
        baseline = c2 / (np.linalg.norm(c2) + 1e-12)
        if abs(baseline[2]) > options.init_max_forward_motion:
            return None
        return dict(qvec=res.qvec, tvec=t,
                    inlier_matches=matches[inl[:n_real]])

    def register_initial_image_pair(self, i1: int, i2: int, info: dict,
                                    options: IncrementalMapperOptions) -> bool:
        """Ref: RegisterInitialImagePair :258."""
        im1, im2 = self.rec.images[i1], self.rec.images[i2]
        im1.qvec = np.array([1.0, 0, 0, 0])
        im1.tvec = np.zeros(3)
        im2.qvec = np.asarray(info["qvec"], np.float64)
        im2.tvec = np.asarray(info["tvec"], np.float64)
        self.rec.register_image(i1)
        self.rec.register_image(i2)
        self._update_visibility_on_register(i1)
        self._update_visibility_on_register(i2)
        topt = TriangulatorOptions(min_angle=options.init_min_tri_angle / 8)
        self.triangulator.triangulate_image(i1, topt)
        self.triangulator.triangulate_image(i2, topt)
        return self.rec.num_points3d() >= options.init_min_num_inliers // 2

    # ------------------------------------------------------------------
    # next-view selection + registration
    # ------------------------------------------------------------------

    def _update_visibility_on_register(self, image_id):
        cam = self.rec.cameras[self.rec.images[image_id].camera_id]
        if image_id not in self._visibility:
            self._visibility[image_id] = VisibilityPyramid(
                6, cam.width, cam.height)

    def find_next_images(self, options: IncrementalMapperOptions
                         ) -> List[int]:
        """Rank unregistered images by visible-point count + spatial
        spread (ref: FindNextImages :202)."""
        scores = []
        for iid, image in self.rec.images.items():
            if self.rec.is_registered(iid):
                continue
            if self._num_reg_trials.get(iid, 0) >= options.max_reg_trials:
                continue
            cam = self.rec.cameras[image.camera_id]
            pyr = VisibilityPyramid(6, cam.width, cam.height)
            num_vis = 0
            g = self.cache.correspondence_graph
            if not g.exists_image(iid):
                continue
            off = g.offsets[iid]
            for f in range(len(image.xys)):
                a, b = off[f], off[f + 1]
                if a == b:
                    continue
                for oim, oft in zip(g.corr_images[iid][a:b],
                                    g.corr_features[iid][a:b]):
                    oim = int(oim)
                    if oim in self.rec.images and \
                            self.rec.is_registered(oim) and \
                            self.rec.images[oim].point3D_ids[int(oft)] \
                            != INVALID_POINT3D:
                        num_vis += 1
                        pyr.set_point(*image.xys[f])
                        break
            if num_vis > 0:
                scores.append((pyr.score, num_vis, iid))
        scores.sort(key=lambda s: (-s[0], -s[1], s[2]))
        return [iid for _, _, iid in scores]

    def register_next_image(self, image_id: int,
                            options: IncrementalMapperOptions) -> bool:
        """2D-3D gather -> P3P LORANSAC -> pose refinement -> continue
        tracks (ref: RegisterNextImage :344)."""
        self._num_reg_trials[image_id] = \
            self._num_reg_trials.get(image_id, 0) + 1
        image = self.rec.images[image_id]
        cam = self.rec.cameras[image.camera_id]
        g = self.cache.correspondence_graph

        # 2D-3D correspondences via the correspondence graph
        # (ref: :368-416; dedup by (feature, point)).
        p2d_idx: List[int] = []
        p3d_ids: List[int] = []
        seen: Set[Tuple[int, int]] = set()
        off = g.offsets.get(image_id)
        if off is None:
            return False
        for f in range(len(image.xys)):
            a, b = off[f], off[f + 1]
            for oim, oft in zip(g.corr_images[image_id][a:b],
                                g.corr_features[image_id][a:b]):
                oim = int(oim)
                if oim not in self.rec.images or \
                        not self.rec.is_registered(oim):
                    continue
                pid = int(self.rec.images[oim].point3D_ids[int(oft)])
                if pid == INVALID_POINT3D:
                    continue
                if (f, pid) in seen:
                    continue
                seen.add((f, pid))
                p2d_idx.append(f)
                p3d_ids.append(pid)
        if len(p3d_ids) < options.abs_pose_min_num_inliers:
            return False

        xys = image.xys[p2d_idx]
        xyzs = np.stack([self.rec.points3D[p].xyz for p in p3d_ids])

        # Normalized coords for P3P (undistort via camera model).
        xyn = _image_to_normalized(cam, xys)
        # Bucket to the next power of two so repeated registrations reuse
        # ONE compiled RANSAC program per bucket instead of recompiling
        # for every distinct correspondence count (XLA static shapes).
        n_real = len(p3d_ids)
        bucket = 1 << int(np.ceil(np.log2(max(n_real, 32))))
        pad = bucket - n_real
        xyzs_p = np.concatenate([xyzs, np.zeros((pad, 3))])
        xyn_p = np.concatenate([np.asarray(xyn), np.zeros((pad, 2))])
        valid = np.concatenate([np.ones(n_real), np.zeros(pad)])
        from sba_tpu.estimators.pose import AbsolutePoseOptions
        from sba_tpu.optim.ransac import RANSACOptions
        report = estimate_absolute_pose(
            jax.random.PRNGKey(self._next_seed()),
            jnp.asarray(xyzs_p), jnp.asarray(xyn_p),
            options=AbsolutePoseOptions(ransac=RANSACOptions(
                max_error=options.abs_pose_max_error
                / cam.mean_focal_length(),
                min_inlier_ratio=options.abs_pose_min_inlier_ratio)),
            mask=jnp.asarray(valid))
        num_inliers = int(report.num_inliers)
        if num_inliers < options.abs_pose_min_num_inliers:
            return False

        qvec = np.asarray(report.model[0])
        tvec = np.asarray(report.model[1])
        inlier_mask = np.asarray(report.inlier_mask)[:n_real]

        # Refine pose on inliers (ref: RefineAbsolutePose at :502-506);
        # padded rows carry weight 0, same bucketed program shape.
        q_r, t_r, _ = refine_absolute_pose(
            jnp.asarray(qvec), jnp.asarray(tvec),
            jnp.asarray(xyzs_p), jnp.asarray(xyn_p),
            weights=jnp.asarray(
                np.concatenate([inlier_mask, np.zeros(pad)]), jnp.float64))
        image.qvec = np.asarray(q_r, np.float64)
        image.tvec = np.asarray(t_r, np.float64)
        self.rec.register_image(image_id)
        self._update_visibility_on_register(image_id)

        # Continue tracks with verified 2D-3D inliers (ref: :512-526).
        for k in np.nonzero(inlier_mask)[0]:
            f, pid = p2d_idx[int(k)], p3d_ids[int(k)]
            if image.point3D_ids[f] == INVALID_POINT3D and \
                    pid in self.rec.points3D:
                track_imgs = self.rec.points3D[pid].image_ids
                if image_id not in track_imgs:
                    self.rec.add_observation(pid, image_id, f)
        return True

    def triangulate_image(self, image_id: int,
                          tri_options: Optional[TriangulatorOptions] = None
                          ) -> int:
        return self.triangulator.triangulate_image(
            image_id, tri_options or TriangulatorOptions())

    # ------------------------------------------------------------------
    # bundle adjustment
    # ------------------------------------------------------------------

    def find_local_bundle(self, image_id: int,
                          options: IncrementalMapperOptions) -> List[int]:
        """Most-connected registered images by shared 3D points
        (ref: FindLocalBundle :942; the full version also checks viewing
        angles — connection count is the dominant criterion)."""
        image = self.rec.images[image_id]
        shared: Dict[int, int] = {}
        for f in range(len(image.xys)):
            pid = int(image.point3D_ids[f])
            if pid == INVALID_POINT3D or pid not in self.rec.points3D:
                continue
            for oim in self.rec.points3D[pid].image_ids:
                oim = int(oim)
                if oim != image_id:
                    shared[oim] = shared.get(oim, 0) + 1
        ranked = sorted(shared.items(), key=lambda kv: -kv[1])
        return [image_id] + [i for i, _ in
                             ranked[:options.local_ba_num_images - 1]]

    def _ba_options_with_model(self, base: BAOptions) -> BAOptions:
        """Pin BAOptions.model_id to the scene's camera model.

        The BA residual evaluates the STATIC opt.model_id camera head
        (kernel specialization); leaving the default SIMPLE_PINHOLE on a
        SIMPLE_RADIAL scene silently ignores the distortion params — the
        default-ingest recovery path (ref: incremental_mapper.cc:435-506)
        then can never refine k1. Mixed-model scenes fall back to the
        most common model (single-model is the overwhelmingly common
        ingest; per-obs model switching is a dense-dispatch cost the
        kernels avoid)."""
        import dataclasses

        ids = [cam.model_id for cam in self.rec.cameras.values()]
        if not ids:
            return base
        mid = max(set(ids), key=ids.count)
        if mid == base.model_id:
            return base
        return dataclasses.replace(base, model_id=int(mid))

    def adjust_local_bundle(self, image_id: int,
                            options: IncrementalMapperOptions,
                            ba_options: Optional[BAOptions] = None) -> dict:
        """Local BA over the connected set; other poses fixed
        (ref: AdjustLocalBundle :1000-1109)."""
        local = self.find_local_bundle(image_id, options)
        reg = [i for i in self.rec.images if self.rec.is_registered(i)]
        arrays = self.rec.to_arrays(image_ids=reg)
        row_of = {iid: r for r, iid in enumerate(arrays.image_ids)}
        const_rows = [row_of[i] for i in reg if i not in set(local)]
        # Gauge: if everything is local, fix the two first registered.
        if len(const_rows) == 0:
            const_rows = [row_of[i] for i in sorted(local)[:2]]
        # Cameras stay FREE: which intrinsic components move is governed
        # by BAOptions.refine_* (the reference's ba_refine_focal_length /
        # _extra_params flags apply to local and global BA alike —
        # SIMPLE_RADIAL ingest recovers focal/k1 through these solves,
        # ref: sfm/incremental_mapper.cc:435-506).
        opt = self._ba_options_with_model(
            ba_options or BAOptions(
                max_iterations=25, loss="cauchy", loss_scale=1.0))
        problem = pad_problem_pow2(build_problem(
            arrays, constant_pose_rows=const_rows))
        out, summary = bundle_adjust(problem, opt)
        self.rec.update_from_arrays(
            arrays, qvecs=np.asarray(out.qvecs),
            tvecs=np.asarray(out.tvecs),
            points=np.asarray(out.points),
            camera_params=np.asarray(out.cam_params))
        return dict(summary=summary, local_images=local)

    def adjust_global_bundle(self, options: IncrementalMapperOptions,
                             ba_options: Optional[BAOptions] = None) -> dict:
        """Ref: AdjustGlobalBundle :668 (fix gauge with 2 poses)."""
        reg = [i for i in self.rec.images if self.rec.is_registered(i)]
        if len(reg) < 2:
            raise ValueError("need >= 2 registered images for global BA")
        arrays = self.rec.to_arrays(image_ids=reg)
        # Cameras free; BAOptions.refine_* gates the components (see
        # adjust_local_bundle).
        problem = pad_problem_pow2(build_problem(
            arrays, constant_pose_rows=[0],
            constant_tvec_rows={1: [0]}))
        opt = self._ba_options_with_model(
            ba_options or BAOptions(max_iterations=50))
        out, summary = bundle_adjust(problem, opt)
        self.rec.update_from_arrays(
            arrays, qvecs=np.asarray(out.qvecs),
            tvecs=np.asarray(out.tvecs),
            points=np.asarray(out.points),
            camera_params=np.asarray(out.cam_params))
        return dict(summary=summary)

    # ------------------------------------------------------------------
    # filtering
    # ------------------------------------------------------------------

    def filter_points(self, options: IncrementalMapperOptions) -> int:
        """Reprojection error + triangulation angle filters
        (ref: FilterPoints :749 -> Reconstruction::FilterPoints3D)."""
        n = self.rec.filter_points_large_reprojection_error(
            options.filter_max_reproj_error)
        n += self._filter_small_angle_points(options.min_tri_angle)
        return n

    def _filter_small_angle_points(self, min_angle_deg: float) -> int:
        """Vectorized max-pairwise-triangulation-angle filter: the
        per-point Python double loop cost grew linearly with map size
        PER REGISTRATION (called after every local BA) and dominated
        the host loop at 50+ images."""
        pids = list(self.rec.points3D)
        if not pids:
            return 0
        # Camera centers once per call.
        centers = {iid: _projection_center(img.qvec, img.tvec)
                   for iid, img in self.rec.images.items()
                   if self.rec.is_registered(iid)}
        K = max(len(self.rec.points3D[p].image_ids) for p in pids)
        P = len(pids)
        dirs = np.zeros((P, K, 3))
        valid = np.zeros((P, K), bool)
        xyz = np.zeros((P, 3))
        for r, pid in enumerate(pids):
            pt = self.rec.points3D[pid]
            xyz[r] = pt.xyz
            for c, im in enumerate(pt.image_ids):
                ctr = centers.get(int(im))
                if ctr is None:
                    continue
                dirs[r, c] = ctr
                valid[r, c] = True
        d = dirs - xyz[:, None, :]
        n = np.linalg.norm(d, axis=-1)
        d = d / np.maximum(n, 1e-12)[..., None]
        cosang = np.einsum("pkc,plc->pkl", d, d)
        pair_ok = valid[:, :, None] & valid[:, None, :]
        cosang = np.where(pair_ok, np.clip(cosang, -1.0, 1.0), 1.0)
        max_ang = np.degrees(np.arccos(cosang.min(axis=(1, 2))))
        removed = 0
        for r, pid in enumerate(pids):
            if max_ang[r] < min_angle_deg:
                self.rec.delete_point3d(pid)
                removed += 1
        return removed

    def filter_images(self, options: IncrementalMapperOptions) -> List[int]:
        """Deregister images with bogus intrinsics or too few points
        (ref: FilterImages :764 -> Reconstruction::FilterImages)."""
        bad = []
        for iid in [i for i in self.rec.images
                    if self.rec.is_registered(i)]:
            image = self.rec.images[iid]
            cam = self.rec.cameras[image.camera_id]
            spec = camera_models.model_by_id(cam.model_id)
            ok = True
            for i in spec.focal_idxs:
                r = cam.params[i] / max(cam.width, cam.height)
                if not (options.min_focal_length_ratio <= r
                        <= options.max_focal_length_ratio):
                    ok = False
            for i in spec.extra_idxs:
                if abs(cam.params[i]) > options.max_extra_param:
                    ok = False
            if image.num_points3d() == 0:
                ok = False
            if not ok:
                self.rec.deregister_image(iid)
                bad.append(iid)
        return bad

    # ------------------------------------------------------------------
    # stats
    # ------------------------------------------------------------------

    def num_registered_images(self) -> int:
        return self.rec.num_registered_images()


def _triangulate_two_view(R1, t1, R2, t2, n1, n2) -> np.ndarray:
    """Batch DLT for calibrated two-view (host numpy)."""
    P1 = np.hstack([R1, np.reshape(t1, (3, 1))])
    P2 = np.hstack([R2, np.reshape(t2, (3, 1))])
    out = np.zeros((len(n1), 3))
    for i, (a, b) in enumerate(zip(n1, n2)):
        A = np.stack([
            a[0] * P1[2] - P1[0],
            a[1] * P1[2] - P1[1],
            b[0] * P2[2] - P2[0],
            b[1] * P2[2] - P2[1]])
        _, _, Vt = np.linalg.svd(A)
        X = Vt[-1]
        out[i] = X[:3] / (X[3] if abs(X[3]) > 1e-12 else 1e-12)
    return out
