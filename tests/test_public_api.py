"""Top-level package surface: lazy exports mirror the reference's
(/root/reference/terran/__init__.py:1-9)."""

import pytest

import terran_tpu


REFERENCE_SURFACE = [
    "default_device", "extract_features", "face_detection",
    "pose_estimation", "open_image", "open_video", "display_image",
    "vis_faces", "vis_poses",
]


def test_reference_surface_present():
    for name in REFERENCE_SURFACE:
        assert callable(getattr(terran_tpu, name)), name


def test_extended_surface():
    for name in ("Detection", "Recognition", "Estimation", "Keypoint",
                 "write_video", "resolve_images", "face_tracking"):
        assert getattr(terran_tpu, name) is not None


def test_unknown_attribute_raises():
    with pytest.raises(AttributeError):
        terran_tpu.not_a_thing


def test_import_is_cheap():
    """Importing the package must not pull jax/flax (lazy surface)."""
    import subprocess
    import sys

    # Note: a sitecustomize hook may import jax at interpreter start, so
    # test laziness via the framework's own heavy modules instead.
    code = (
        "import sys\n"
        "import terran_tpu\n"
        "for mod in ('terran_tpu.models', 'terran_tpu.pipeline',\n"
        "            'terran_tpu.face', 'cv2'):\n"
        "    assert mod not in sys.modules, f'{mod} imported eagerly'\n"
        "print('lazy ok')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd="/root/repo",
    )
    assert "lazy ok" in out.stdout, out.stderr
