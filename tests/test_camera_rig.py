"""Camera rig tests (ref style: base/camera_rig_test.cc +
optim/bundle_adjustment_test.cc rig cases)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sba_tpu.geometry.quaternions import (
    angle_axis_to_quat,
    pose_product,
    quat_rotate,
)
from sba_tpu.models.camera_rig import (
    CameraRig,
    compose_rig_poses,
    rig_bundle_adjust,
)


def test_compose_rig_poses():
    # Rig at identity; camera offset by tvec (0.5, 0, 0).
    sq = jnp.asarray([[1.0, 0, 0, 0]])
    st = jnp.asarray([[0.0, 0, 0]])
    cq = jnp.asarray([[1.0, 0, 0, 0]])
    ct = jnp.asarray([[0.5, 0, 0]])
    iq, it = compose_rig_poses(sq, st, cq, ct)
    np.testing.assert_allclose(np.asarray(it[0]), [0.5, 0, 0], atol=1e-12)

    # Rotated rig composes correctly: x_img = cam(rig(x)).
    q_rig = angle_axis_to_quat(jnp.asarray([0.0, 0.0, np.pi / 2]))
    sq = q_rig[None]
    st = jnp.asarray([[1.0, 0, 0]])
    iq, it = compose_rig_poses(sq, st, cq, ct)
    x = jnp.asarray([2.0, 0.0, 0.0])
    via_compose = quat_rotate(iq[0], x) + it[0]
    step1 = quat_rotate(q_rig, x) + st[0]
    step2 = quat_rotate(cq[0], step1) + ct[0]
    np.testing.assert_allclose(np.asarray(via_compose), np.asarray(step2),
                               atol=1e-12)


def test_compute_rig_from_reconstruction():
    from sba_tpu.io.colmap_models import Camera, Image
    from sba_tpu.models.reconstruction import Reconstruction

    rng = np.random.default_rng(0)
    rec = Reconstruction()
    for cid in (1, 2):
        rec.add_camera(Camera(camera_id=cid, model_id=0, width=100,
                              height=100, params=np.array([100.0, 50, 50])))
    # Fixed relative pose camera2-from-camera1.
    q_rel = np.asarray(angle_axis_to_quat(jnp.asarray([0.1, -0.05, 0.2])))
    t_rel = np.array([0.3, 0.0, -0.1])
    rig = CameraRig(ref_camera_id=1)
    rig.add_camera(1)
    rig.add_camera(2)
    iid = 1
    for snap in range(4):
        q1 = np.asarray(angle_axis_to_quat(
            jnp.asarray(rng.normal(0, 0.3, 3))))
        t1 = rng.normal(0, 1.0, 3)
        q2, t2 = pose_product(jnp.asarray(q_rel), jnp.asarray(t_rel),
                              jnp.asarray(q1), jnp.asarray(t1))
        rec.add_image(Image(image_id=iid, qvec=q1, tvec=t1, camera_id=1,
                            name=f"s{snap}_c1", xys=np.zeros((0, 2)),
                            point3D_ids=np.zeros(0, np.int64)),
                      registered=True)
        rec.add_image(Image(image_id=iid + 1, qvec=np.asarray(q2),
                            tvec=np.asarray(t2), camera_id=2,
                            name=f"s{snap}_c2", xys=np.zeros((0, 2)),
                            point3D_ids=np.zeros(0, np.int64)),
                      registered=True)
        rig.add_snapshot([iid, iid + 1])
        iid += 2

    rig.compute_rig_from_reconstruction(rec)
    q_est, t_est = rig.cams_from_rig[2]
    sign = np.sign(q_est[0] * q_rel[0] + np.dot(q_est[1:], q_rel[1:]))
    np.testing.assert_allclose(sign * q_est, q_rel, atol=1e-8)
    np.testing.assert_allclose(t_est, t_rel, atol=1e-8)
    # Reference camera stays identity.
    q_ref, t_ref = rig.cams_from_rig[1]
    np.testing.assert_allclose(q_ref, [1, 0, 0, 0], atol=1e-8)


def test_rig_bundle_adjust_improves_poses():
    """Perturbed snapshot poses recover under the rig constraint."""
    from sba_tpu.optim.ba import BAProblem, BAOptions, MAXP
    from sba_tpu.geometry.quaternions import quat_to_rotmat

    rng = np.random.default_rng(1)
    S = 4  # snapshots, 2 cameras each -> 8 images
    P = 60
    pts = rng.uniform(-1, 1, (P, 3)) + [0, 0, 6.0]
    q_rel = np.asarray(angle_axis_to_quat(jnp.asarray([0.0, 0.3, 0.0])))
    t_rel = np.array([0.5, 0.0, 0.0])

    img_q, img_t, snap_ids, cam_qs, cam_ts = [], [], [], [], []
    snap_true = []
    for s in range(S):
        q_s = np.asarray(angle_axis_to_quat(
            jnp.asarray([0.02 * s, -0.03 * s, 0.01])))
        t_s = np.array([0.4 * s - 0.8, 0.05 * s, 0.0])
        snap_true.append((q_s, t_s))
        for (cq, ct) in (([1.0, 0, 0, 0], [0.0, 0, 0]), (q_rel, t_rel)):
            q, t = pose_product(jnp.asarray(cq, jnp.float64),
                                jnp.asarray(ct, jnp.float64),
                                jnp.asarray(q_s), jnp.asarray(t_s))
            img_q.append(np.asarray(q))
            img_t.append(np.asarray(t))
            snap_ids.append(s)
            cam_qs.append(np.asarray(cq, np.float64))
            cam_ts.append(np.asarray(ct, np.float64))
    img_q = np.stack(img_q)
    img_t = np.stack(img_t)
    Nimg = len(img_q)

    obs_i, obs_p, obs_xy = [], [], []
    for i in range(Nimg):
        Rq = jnp.asarray(img_q[i])
        pc = np.asarray(quat_rotate(Rq[None], jnp.asarray(pts))) + img_t[i]
        uv = pc[:, :2] / pc[:, 2:]
        for p in range(P):
            obs_i.append(i)
            obs_p.append(p)
            obs_xy.append(uv[p])
    O = len(obs_i)

    # Perturb image poses consistently per snapshot? No — perturb
    # arbitrarily; the rig BA must pull them back onto the constraint.
    img_q_noisy = img_q + rng.normal(0, 0.01, img_q.shape)
    img_q_noisy /= np.linalg.norm(img_q_noisy, axis=1, keepdims=True)
    img_t_noisy = img_t + rng.normal(0, 0.05, img_t.shape)

    cam = np.zeros((1, MAXP))
    cam[0, 0] = 1.0
    problem = BAProblem(
        qvecs=jnp.asarray(img_q_noisy), tvecs=jnp.asarray(img_t_noisy),
        points=jnp.asarray(pts), cam_params=jnp.asarray(cam),
        obs_image=jnp.asarray(obs_i, jnp.int32),
        obs_point=jnp.asarray(obs_p, jnp.int32),
        obs_cam=jnp.zeros(O, jnp.int32),
        obs_xy=jnp.asarray(np.stack(obs_xy)),
        obs_mask=jnp.ones(O),
        free_rot=jnp.ones(Nimg), free_trans=jnp.ones((Nimg, 3)),
        free_points=jnp.zeros(P), free_cam=jnp.zeros((1, MAXP)))

    out = rig_bundle_adjust(
        problem, np.asarray(snap_ids), np.stack(cam_qs), np.stack(cam_ts),
        BAOptions(max_iterations=60, refine_focal_length=False,
                  refine_principal_point=False, refine_extra_params=False))
    # Rig-composed image poses must beat the noisy input.
    iq = np.asarray(out["image_qvecs"])
    it = np.asarray(out["image_tvecs"])

    def pose_err(qs, ts):
        qe = np.minimum(np.abs(qs - img_q), np.abs(qs + img_q)).max()
        return qe + np.abs(ts - img_t).max()

    err_before = pose_err(img_q_noisy, img_t_noisy)
    err_after = pose_err(iq, it)
    assert err_after < err_before * 0.2, (err_before, err_after)
