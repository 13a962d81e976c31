"""HTML viewer export test (GUI-capability substitute, ref: src/ui)."""

import numpy as np

from sba_tpu.io.colmap_models import Camera, Image
from sba_tpu.models.reconstruction import Reconstruction
from sba_tpu.viewer import export_html_viewer


def test_export_html_viewer(tmp_path):
    rec = Reconstruction()
    rec.add_camera(Camera(camera_id=1, model_id=0, width=64, height=48,
                          params=np.array([50.0, 32, 24])))
    rng = np.random.default_rng(0)
    for k in range(3):
        rec.add_image(Image(
            image_id=k + 1, qvec=np.array([1.0, 0, 0, 0]),
            tvec=np.array([k * 1.0, 0, 0]), camera_id=1, name=f"i{k}",
            xys=np.zeros((10, 2)),
            point3D_ids=np.full(10, -1, np.int64)), registered=True)
    for p in range(20):
        rec.add_point3d(rng.uniform(-1, 1, 3), [(1, p % 10), (2, p % 10)],
                        rgb=(100, 150, 200))

    out = str(tmp_path / "viewer.html")
    export_html_viewer(rec, out)
    html = open(out).read()
    assert "<canvas" in html and "PTS" in html
    assert "20 points, 3 cameras" in html
    assert "rgb(100,150,200)" in html
    # No external asset references (self-contained requirement).
    assert "http://" not in html and "https://" not in html


def test_export_empty_model(tmp_path):
    rec = Reconstruction()
    out = str(tmp_path / "empty.html")
    export_html_viewer(rec, out)
    assert "0 points" in open(out).read()


def test_viewer_render_options(tmp_path):
    """Render-options parity with the reference GUI's dialog (point
    size, background, coloring, orbit animation = movie-grabber)."""
    from sba_tpu.utils.synthetic import make_synthetic_reconstruction
    from sba_tpu.viewer import export_html_viewer

    rec = make_synthetic_reconstruction(num_images=3, num_points=40)
    p = str(tmp_path / "v.html")
    export_html_viewer(rec, p, point_size=5.0, background="#202030",
                       color_mode="height", animate=True)
    html = open(p).read()
    assert "const PS = 5.0" in html
    assert "#202030" in html
    assert "let spinning = true" in html
    assert "orbit movie" in html

    export_html_viewer(rec, p, color_mode="uniform")
    html = open(p).read()
    assert "rgb(220,220,220)" in html
    assert "let spinning = false" in html
