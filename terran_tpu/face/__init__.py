"""Face tasks: detection and recognition (ref: /root/reference/terran/face/)."""

from terran_tpu.face.detection import Detection, face_detection  # noqa

try:  # Recognition requires the alignment ops; keep import robust.
    from terran_tpu.face.recognition import Recognition, extract_features  # noqa
except ImportError:  # pragma: no cover
    pass
