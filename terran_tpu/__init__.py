"""terran-tpu: a TPU-native human-perception inference framework.

Public API mirrors the reference library's top level
(/root/reference/terran/__init__.py:1-9): ``default_device``,
``extract_features``, ``face_detection``, ``pose_estimation``,
``open_image``, ``open_video``, ``display_image``, ``vis_faces``,
``vis_poses`` — implemented on JAX/XLA/Flax/Pallas instead of PyTorch/CUDA.

Imports are lazy (PEP 562) so ``import terran_tpu`` stays cheap and never
touches the checkpoint store or the accelerator.
"""

__version__ = "0.1.0"

_LAZY = {
    "default_device": ("terran_tpu.runtime", "default_device"),
    "face_detection": ("terran_tpu.face.detection", "face_detection"),
    "Detection": ("terran_tpu.face.detection", "Detection"),
    "extract_features": ("terran_tpu.face.recognition", "extract_features"),
    "Recognition": ("terran_tpu.face.recognition", "Recognition"),
    "pose_estimation": ("terran_tpu.pose", "pose_estimation"),
    "Estimation": ("terran_tpu.pose", "Estimation"),
    "Keypoint": ("terran_tpu.pose", "Keypoint"),
    "open_image": ("terran_tpu.io", "open_image"),
    "resolve_images": ("terran_tpu.io", "resolve_images"),
    "open_video": ("terran_tpu.io", "open_video"),
    "write_video": ("terran_tpu.io", "write_video"),
    "display_image": ("terran_tpu.vis", "display_image"),
    "vis_faces": ("terran_tpu.vis", "vis_faces"),
    "vis_poses": ("terran_tpu.vis", "vis_poses"),
    "face_tracking": ("terran_tpu.tracking", "face_tracking"),
}

__all__ = list(_LAZY)


def __getattr__(name):
    if name in _LAZY:
        import importlib

        module_path, attr = _LAZY[name]
        return getattr(importlib.import_module(module_path), attr)
    raise AttributeError(f"module 'terran_tpu' has no attribute '{name}'")
