"""Photographic-texture scene renderer for end-to-end pipeline validation.

Renders perspective views of a fractal-textured heightfield from known
camera poses, producing imagery with photographic statistics (multi-scale
texture, shading, perspective foreshortening, optional lens distortion)
that exercises the REAL front end: SIFT must detect repeatable keypoints,
the matcher must survive viewpoint change, and the mapper must recover the
ground-truth trajectory — the workload the reference's
`automatic_reconstructor` runs on photographs
(ref: src/controllers/automatic_reconstruction.cc:139-167, judged via
src/exe/model.cc model_comparer).

Everything here is host-side numpy (no chip contact — see BASELINE.md
"sync tax"): rendering is test-fixture generation, not a compute path.
"""

from __future__ import annotations

import os

import numpy as np

from sba_tpu.utils.synthetic import _lookat_pose, _np_quat_rotate

__all__ = [
    "fractal_texture",
    "render_scene",
    "write_scene_images",
    "gt_reconstruction",
]


def _value_noise(size, persistence, seed, ridged=False):
    rng = np.random.default_rng(seed)
    tex = np.zeros((size, size), np.float64)
    amp = 1.0
    cells = 4
    while cells <= size:
        grid = rng.standard_normal((cells, cells))
        # Periodic bilinear upsample of the coarse grid to full resolution.
        idx = np.arange(size) * cells / size
        i0 = np.floor(idx).astype(np.int64)
        frac = idx - i0
        i1 = (i0 + 1) % cells
        g = (grid[np.ix_(i0, i0)] * np.outer(1 - frac, 1 - frac)
             + grid[np.ix_(i0, i1)] * np.outer(1 - frac, frac)
             + grid[np.ix_(i1, i0)] * np.outer(frac, 1 - frac)
             + grid[np.ix_(i1, i1)] * np.outer(frac, frac))
        if ridged:
            g = 1.0 - np.abs(g)  # sharp creases at the zero crossings
        tex += amp * g
        amp *= persistence
        cells *= 2
    tex -= tex.min()
    tex /= max(tex.max(), 1e-12)
    return tex


def fractal_texture(size: int = 1024, persistence: float = 0.75,
                    seed: int = 0) -> np.ndarray:
    """Photographic-like texture in [0,1]: high-persistence value noise
    (energy at every scale) blended with ridged noise (sharp creases and
    blob edges) — the multi-scale contrast DoG keypoint detection needs."""
    smooth = _value_noise(size, persistence, seed)
    ridge = _value_noise(size, persistence, seed + 9001, ridged=True)
    tex = 0.45 * smooth + 0.55 * ridge
    # Mild S-curve for local contrast.
    tex = np.clip(1.5 * (tex - 0.5) + 0.5, 0.0, 1.0)
    tex -= tex.min()
    tex /= max(tex.max(), 1e-12)
    return tex


def _bilinear_wrap(tex: np.ndarray, u: np.ndarray, v: np.ndarray):
    """Sample tex at continuous (u, v) in texel units, wrapping."""
    n = tex.shape[0]
    u0 = np.floor(u).astype(np.int64)
    v0 = np.floor(v).astype(np.int64)
    fu = u - u0
    fv = v - v0
    u0 %= n
    v0 %= n
    u1 = (u0 + 1) % n
    v1 = (v0 + 1) % n
    return (tex[v0, u0] * (1 - fu) * (1 - fv) + tex[v0, u1] * fu * (1 - fv)
            + tex[v1, u0] * (1 - fu) * fv + tex[v1, u1] * fu * fv)


class _Heightfield:
    """Aperiodic smooth relief z(x, y) = plane_z + sum_k a_k sin(.) sin(.),
    with analytic gradient for shading."""

    def __init__(self, plane_z: float, relief: float, seed: int,
                 num_waves: int = 6):
        rng = np.random.default_rng(seed + 77)
        self.plane_z = plane_z
        self.wx = rng.uniform(0.5, 1.9, num_waves)
        self.wy = rng.uniform(0.5, 1.9, num_waves)
        self.px = rng.uniform(0, 2 * np.pi, num_waves)
        self.py = rng.uniform(0, 2 * np.pi, num_waves)
        amp = rng.uniform(0.5, 1.0, num_waves)
        self.amp = amp * relief / amp.sum()

    def z(self, x, y):
        out = np.full_like(x, self.plane_z)
        for k in range(len(self.amp)):
            out = out + self.amp[k] * np.sin(self.wx[k] * x + self.px[k]) \
                * np.sin(self.wy[k] * y + self.py[k])
        return out

    def grad(self, x, y):
        gx = np.zeros_like(x)
        gy = np.zeros_like(y)
        for k in range(len(self.amp)):
            sx = np.sin(self.wx[k] * x + self.px[k])
            cx = np.cos(self.wx[k] * x + self.px[k])
            sy = np.sin(self.wy[k] * y + self.py[k])
            cy = np.cos(self.wy[k] * y + self.py[k])
            gx += self.amp[k] * self.wx[k] * cx * sy
            gy += self.amp[k] * self.wy[k] * sx * cy
        return gx, gy


def _ring_poses(num_images, plane_z, ring_radius, ring_height, jitter, seed):
    """Cameras on a jittered ring above the surface, converging on the
    scene center — the classic SfM capture pattern (good baselines, high
    overlap)."""
    rng = np.random.default_rng(seed + 31)
    qvecs = np.zeros((num_images, 4))
    tvecs = np.zeros((num_images, 3))
    centers = np.zeros((num_images, 3))
    for i in range(num_images):
        # ~200 degrees of arc: substantial viewpoint change end to end.
        ang = 2 * np.pi * (i / num_images) * 0.55
        c = np.array([ring_radius * np.cos(ang),
                      ring_radius * np.sin(ang),
                      ring_height])
        c += rng.normal(scale=jitter, size=3)
        target = np.array([0.0, 0.0, plane_z]) + rng.normal(
            scale=0.05 * ring_radius, size=3)
        q, t = _lookat_pose(c, target)
        qvecs[i], tvecs[i], centers[i] = q, t, c
    return qvecs, tvecs, centers


def render_scene(
    num_images: int = 8,
    image_size=(320, 240),
    focal: float | None = None,
    model_name: str = "SIMPLE_PINHOLE",
    extra_params=(),
    plane_z: float = 5.0,
    relief: float = 0.55,
    ring_radius: float = 1.6,
    ring_height: float = 0.0,
    jitter: float = 0.12,
    texture_scale: float = 0.55,
    noise_std: float = 0.008,
    seed: int = 0,
):
    """Render `num_images` grayscale views of a textured heightfield.

    model_name/extra_params select the LENS: rays are generated through the
    camera model's image_to_world (Newton undistortion), so the rendered
    images carry true radial/tangential distortion for SIMPLE_RADIAL /
    OPENCV etc. — the fixture for distorted-mapper end-to-end tests
    (ref ingest default: src/image_reader defaults to SIMPLE_RADIAL).

    Returns dict with images (uint8 [N,H,W]), qvecs [N,4], tvecs [N,3]
    (world->cam, COLMAP convention), camera dict(model, width, height,
    params), centers [N,3].
    """
    from sba_tpu.geometry.camera_models import model_by_name

    w, h = image_size
    if focal is None:
        focal = 1.1 * max(w, h)
    spec = model_by_name(model_name)
    if model_name == "SIMPLE_PINHOLE":
        params = np.array([focal, w / 2.0, h / 2.0], np.float64)
    elif model_name == "PINHOLE":
        params = np.array([focal, focal, w / 2.0, h / 2.0], np.float64)
    else:
        # f-first models with trailing distortion coefficients.
        base = spec.init_params(focal, w, h)
        params = np.asarray(base, np.float64)
        extra = np.asarray(extra_params, np.float64)
        if extra.size:
            params[-extra.size:] = extra

    # Per-pixel normalized ray directions through the lens model. The
    # Newton undistortion runs once per pixel grid (host CPU backend).
    xs, ys = np.meshgrid(np.arange(w, dtype=np.float64) + 0.5,
                         np.arange(h, dtype=np.float64) + 0.5)
    xy = np.stack([xs, ys], axis=-1).reshape(-1, 2)
    if model_name == "SIMPLE_PINHOLE":
        uv = (xy - params[1:3]) / params[0]
    else:
        from sba_tpu.utils.host import on_host
        import jax.numpy as jnp

        with on_host():
            uv = np.asarray(spec.image_to_world(
                jnp.asarray(params), jnp.asarray(xy)))
    dirs_cam = np.concatenate([uv, np.ones((len(uv), 1))], axis=-1)

    field = _Heightfield(plane_z, relief, seed)
    tex = fractal_texture(seed=seed)
    texn = tex.shape[0]
    qvecs, tvecs, centers = _ring_poses(
        num_images, plane_z, ring_radius, ring_height, jitter, seed)

    rng = np.random.default_rng(seed + 5)
    images = np.zeros((num_images, h, w), np.uint8)
    depths = np.zeros((num_images, h, w), np.float32)
    light = np.array([0.4, 0.25, -0.88])
    light /= np.linalg.norm(light)
    for i in range(num_images):
        qc = qvecs[i] * np.array([1.0, -1.0, -1.0, -1.0])
        d_world = _np_quat_rotate(
            np.broadcast_to(qc, (len(dirs_cam), 4)), dirs_cam)
        # Fixed-point ray march (converges: |grad z| * |d_xy/d_z| < 1 for
        # gentle relief and converging views).
        s = (plane_z - centers[i, 2]) / d_world[:, 2]
        for _ in range(30):
            hit = centers[i][None, :] + s[:, None] * d_world
            s = (field.z(hit[:, 0], hit[:, 1]) - centers[i, 2]) / d_world[:, 2]
        hit = centers[i][None, :] + s[:, None] * d_world
        u = hit[:, 0] / texture_scale * (texn / 16.0)
        v = hit[:, 1] / texture_scale * (texn / 16.0)
        albedo = _bilinear_wrap(tex, u, v)
        gx, gy = field.grad(hit[:, 0], hit[:, 1])
        normal = np.stack([-gx, -gy, np.ones_like(gx)], axis=-1)
        normal /= np.linalg.norm(normal, axis=-1, keepdims=True)
        shade = np.clip(-(normal @ light), 0.0, 1.0)
        img = albedo * (0.55 + 0.45 * shade)
        img = img + rng.normal(scale=noise_std, size=img.shape)
        images[i] = np.clip(img.reshape(h, w) * 255.0, 0, 255).astype(
            np.uint8)
        # Ground-truth depth: p_cam = s * (u, v, 1) so z_cam == s. The
        # MVS accuracy tests compare PatchMatch output against this.
        depths[i] = s.reshape(h, w).astype(np.float32)

    camera = dict(model=model_name, width=w, height=h, params=params)
    return dict(images=images, depths=depths, qvecs=qvecs, tvecs=tvecs,
                camera=camera, centers=centers)


def write_scene_images(scene: dict, image_dir: str, prefix: str = "view"):
    """Save rendered views as PNGs named <prefix><k>.png; returns names."""
    from PIL import Image as PILImage

    os.makedirs(image_dir, exist_ok=True)
    names = []
    for k in range(len(scene["images"])):
        name = f"{prefix}{k:03d}.png"
        PILImage.fromarray(scene["images"][k]).save(
            os.path.join(image_dir, name))
        names.append(name)
    return names


def gt_reconstruction(scene: dict, names):
    """Ground-truth Reconstruction (poses only) for model_aligner /
    model_comparer ATE evaluation (ref: src/exe/model.cc)."""
    from sba_tpu.geometry.camera_models import model_by_name
    from sba_tpu.models.reconstruction import Reconstruction
    from sba_tpu.io.colmap_models import Camera, Image

    rec = Reconstruction()
    cam = scene["camera"]
    rec.add_camera(Camera(camera_id=1,
                          model_id=model_by_name(cam["model"]).model_id,
                          width=cam["width"], height=cam["height"],
                          params=np.asarray(cam["params"], np.float64)))
    for k, name in enumerate(names):
        img = Image(image_id=k + 1, name=name, camera_id=1,
                    qvec=scene["qvecs"][k].copy(),
                    tvec=scene["tvecs"][k].copy(),
                    xys=np.zeros((0, 2)),
                    point3D_ids=np.zeros(0, np.int64))
        rec.add_image(img, registered=True)
    return rec
