from terran_tpu.models.retinaface import RetinaFace  # noqa
from terran_tpu.models.arcface import FaceResNet100  # noqa
from terran_tpu.models.openpose import BodyPoseModel  # noqa
