"""Face tasks: detection and recognition (ref: /root/reference/terran/face/)."""

from terran_tpu.face.detection import Detection, face_detection  # noqa
from terran_tpu.face.recognition import Recognition, extract_features  # noqa
