from terran_tpu.tracking.face import (  # noqa
    FaceTracking, KalmanTracker, Sort, face_tracking,
)
