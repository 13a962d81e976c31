"""Tests for GPS transforms, scene clustering, hierarchical merge, and
the L1 ADMM solver (ref style: base/gps_test.cc,
base/scene_clustering_test.cc, optim/least_absolute_deviations_test.cc)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sba_tpu.geometry.gps import ell_to_enu, ell_to_xyz, enu_to_ell, \
    xyz_to_ell
from sba_tpu.optim.least_absolute_deviations import (
    LADOptions,
    solve_least_absolute_deviations,
)
from sba_tpu.sfm.scene_clustering import (
    SceneClustering,
    SceneClusteringOptions,
    normalized_min_cut,
)


# --- GPS -------------------------------------------------------------------


def test_ell_xyz_roundtrip():
    # Zurich-ish + equator + southern hemisphere points.
    lla = np.array([[47.37, 8.54, 408.0],
                    [0.0, 0.0, 0.0],
                    [-33.86, 151.21, 58.0],
                    [89.0, -120.0, 1000.0]])
    xyz = ell_to_xyz(lla)
    back = xyz_to_ell(xyz)
    np.testing.assert_allclose(back[:, :2], lla[:, :2], atol=1e-9)
    np.testing.assert_allclose(back[:, 2], lla[:, 2], atol=1e-5)


def test_ell_xyz_known_point():
    # Equator / prime meridian at sea level -> (a, 0, 0).
    xyz = ell_to_xyz([[0.0, 0.0, 0.0]])
    np.testing.assert_allclose(xyz[0], [6378137.0, 0, 0], atol=1e-6)
    # North pole -> (0, 0, b).
    xyz = ell_to_xyz([[90.0, 0.0, 0.0]])
    np.testing.assert_allclose(xyz[0, 2], 6356752.3142, atol=1e-3)


def test_enu_local_frame():
    ref = [47.0, 8.0, 400.0]
    # Small northward offset -> +north in ENU; eastward -> +east.
    lla = np.array([ref,
                    [47.001, 8.0, 400.0],
                    [47.0, 8.001, 400.0],
                    [47.0, 8.0, 410.0]])
    enu = ell_to_enu(lla, ref)
    np.testing.assert_allclose(enu[0], 0, atol=1e-9)
    assert enu[1, 1] > 100 and abs(enu[1, 0]) < 1  # north
    assert enu[2, 0] > 70 and abs(enu[2, 1]) < 1   # east
    assert abs(enu[3, 2] - 10.0) < 1e-4            # up
    back = enu_to_ell(enu, ref)
    np.testing.assert_allclose(back[:, :2], lla[:, :2], atol=1e-9)
    np.testing.assert_allclose(back[:, 2], lla[:, 2], atol=1e-5)


# --- scene clustering ------------------------------------------------------


def _two_community_edges(n=10, cross=1):
    """Two dense communities (0..n-1) and (n..2n-1) with weak bridges."""
    edges = {}
    for a in range(n):
        for b in range(a + 1, n):
            edges[(a, b)] = 10
            edges[(a + n, b + n)] = 10
    for k in range(cross):
        edges[(k, n + k)] = 1
    return edges


def test_normalized_min_cut_separates_communities():
    edges = _two_community_edges()
    ids = sorted({i for p in edges for i in p})
    labels = normalized_min_cut(ids, edges, 2)
    g0 = {i for i in ids if labels[i] == 0}
    g1 = {i for i in ids if labels[i] == 1}
    assert {frozenset(g0), frozenset(g1)} == \
        {frozenset(range(10)), frozenset(range(10, 20))}


def test_scene_clustering_tree_and_overlap():
    edges = _two_community_edges()
    sc = SceneClustering(SceneClusteringOptions(
        leaf_max_num_images=12, image_overlap=2))
    root = sc.partition(edges)
    leaves = sc.leaf_clusters()
    assert len(leaves) == 2
    # Overlap duplicates bridge images across leaves.
    all_imgs = [set(l.image_ids) for l in leaves]
    assert len(all_imgs[0] & all_imgs[1]) > 0
    # Small scene -> single leaf.
    sc2 = SceneClustering(SceneClusteringOptions(leaf_max_num_images=100))
    root2 = sc2.partition(edges)
    assert len(sc2.leaf_clusters()) == 1


# --- hierarchical merge ----------------------------------------------------


def test_merge_reconstructions_aligns_and_merges():
    from sba_tpu.io.colmap_models import Camera, Image
    from sba_tpu.models.reconstruction import Reconstruction
    from sba_tpu.sfm.hierarchical_mapper import merge_reconstructions
    from sba_tpu.geometry.quaternions import rotmat_to_quat

    rng = np.random.default_rng(0)

    def make_rec(names, transform=None):
        rec = Reconstruction()
        rec.add_camera(Camera(camera_id=1, model_id=0, width=100,
                              height=100,
                              params=np.array([100.0, 50, 50])))
        for k, name in enumerate(names):
            qv = np.array([1.0, 0, 0, 0])
            tv = np.array([k * 1.0, 0.0, -5.0])
            if transform is not None:
                s, R, t = transform
                Rc = np.eye(3) @ R.T
                qv = np.asarray(rotmat_to_quat(jnp.asarray(Rc)))
                tv = s * tv - Rc @ t
            rec.add_image(Image(
                image_id=k + 1, qvec=qv, tvec=tv, camera_id=1, name=name,
                xys=rng.uniform(0, 100, (10, 2)),
                point3D_ids=np.full(10, -1, np.int64)), registered=True)
        return rec

    rec1 = make_rec(["a", "b", "c", "d", "e"])
    # rec2 shares c, d, e and adds f, g — in a rotated/scaled/shifted frame.
    th = 0.3
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
    s, t = 2.0, np.array([1.0, -2.0, 0.5])
    rec2_names = ["c", "d", "e", "f", "g"]
    rec2 = Reconstruction()
    rec2.add_camera(Camera(camera_id=1, model_id=0, width=100, height=100,
                           params=np.array([100.0, 50, 50])))
    for k, name in enumerate(rec2_names):
        # Ground-truth world pose of these cameras in rec1 frame:
        k_global = {"c": 2, "d": 3, "e": 4, "f": 5, "g": 6}[name]
        tv1 = np.array([k_global * 1.0, 0.0, -5.0])
        # rec2 frame: world2 = s R world1 + t => cam pose transforms as
        Rc2 = np.eye(3) @ R.T
        tv2 = s * tv1 - Rc2 @ t
        rec2.add_image(Image(
            image_id=k + 1,
            qvec=np.asarray(rotmat_to_quat(jnp.asarray(Rc2))),
            tvec=tv2, camera_id=1, name=name,
            xys=rng.uniform(0, 100, (10, 2)),
            point3D_ids=np.full(10, -1, np.int64)), registered=True)

    # Sanity: 2 common images -> refuse.
    rec2_small = Reconstruction()
    rec2_small.add_camera(rec2.cameras[1])
    assert merge_reconstructions(rec1, rec2_small) is False

    assert merge_reconstructions(rec1, rec2) is True
    names = {rec1.images[i].name for i in rec1.images
             if rec1.is_registered(i)}
    assert names == {"a", "b", "c", "d", "e", "f", "g"}
    # Merged camera 'e' must land at its ground-truth rec1-frame center.
    from sba_tpu.sfm.incremental_triangulator import _projection_center

    by_name = {rec1.images[i].name: i for i in rec1.images}
    c_f = _projection_center(rec1.images[by_name["f"]].qvec,
                             rec1.images[by_name["f"]].tvec)
    np.testing.assert_allclose(c_f, [-5.0, 0, 5.0], atol=1e-6)


# --- L1 ADMM ---------------------------------------------------------------


def test_lad_robust_to_outliers():
    """L1 regression ignores a gross outlier that wrecks L2."""
    rng = np.random.default_rng(0)
    n, m = 5, 60
    x_true = rng.standard_normal(n)
    A = rng.standard_normal((m, n))
    b = A @ x_true
    b_out = b.copy()
    b_out[::7] += 50.0  # gross outliers in ~14% of rows

    res = solve_least_absolute_deviations(
        jnp.asarray(A), jnp.asarray(b_out),
        options=LADOptions(max_num_iterations=2000))
    x_l1 = np.asarray(res.x)
    x_l2 = np.linalg.lstsq(A, b_out, rcond=None)[0]
    err_l1 = np.abs(x_l1 - x_true).max()
    err_l2 = np.abs(x_l2 - x_true).max()
    assert err_l1 < 0.05, f"L1 error {err_l1}"
    assert err_l1 < err_l2 / 10


def test_lad_exact_solution():
    A = jnp.asarray(np.eye(4))
    b = jnp.asarray([1.0, -2.0, 3.0, 0.0])
    res = solve_least_absolute_deviations(A, b)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(b), atol=1e-3)


def test_relax_merged_model_repairs_seam_error():
    """Pose-graph relaxation of a merged model: partials carry accurate
    intra-cluster relative poses; artificial seam error injected into
    the merged model's cluster-2 poses must relax back out."""
    from sba_tpu.sfm.hierarchical_mapper import relax_merged_model
    from sba_tpu.utils.synthetic import make_synthetic_reconstruction
    from sba_tpu.geometry.quaternions import (angle_axis_to_quat,
                                              quat_multiply, quat_normalize)

    rng = np.random.default_rng(4)
    base = make_synthetic_reconstruction(num_images=8, num_points=160,
                                         seed=5)
    truth = {i: (base.images[i].qvec.copy(), base.images[i].tvec.copy())
             for i in base.registered_image_ids}

    # Partials = exact-truth sub-reconstructions (already in base frame,
    # as merge_reconstructions leaves them): images 1-5 and 4-8.
    def sub(rec, ids):
        from sba_tpu.models.reconstruction import Reconstruction
        out = Reconstruction()
        for cid, cam in rec.cameras.items():
            out.add_camera(cam)
        from sba_tpu.io.colmap_models import Image as CImage
        for iid in ids:
            im = rec.images[iid]
            out.add_image(CImage(
                image_id=iid, qvec=im.qvec.copy(), tvec=im.tvec.copy(),
                camera_id=im.camera_id, name=im.name, xys=im.xys.copy(),
                point3D_ids=np.full(len(im.xys), -1, np.int64)),
                registered=True)
        for pid, p in rec.points3D.items():
            track = [(int(i), int(f)) for i, f in
                     zip(p.image_ids, p.point2D_idxs) if int(i) in ids]
            if len(track) >= 2:
                out.add_point3d(p.xyz, track)
        return out

    part1 = sub(base, set(range(1, 6)))
    part2 = sub(base, set(range(4, 9)))

    # Inject seam error: perturb the merged model's poses for images 6-8.
    for iid in (6, 7, 8):
        im = base.images[iid]
        daa = rng.normal(size=3) * 0.05
        im.qvec = np.asarray(quat_normalize(quat_multiply(
            angle_axis_to_quat(jnp.asarray(daa)), jnp.asarray(im.qvec))))
        im.tvec = im.tvec + rng.normal(size=3) * 0.1

    pre_err = max(np.linalg.norm(base.images[i].tvec - truth[i][1])
                  for i in (6, 7, 8))
    assert pre_err > 0.05

    assert relax_merged_model(base, [part1, part2],
                              min_common_points=5) is True
    for i in base.registered_image_ids:
        np.testing.assert_allclose(base.images[i].tvec, truth[i][1],
                                   atol=1e-3)
