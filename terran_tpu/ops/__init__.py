from terran_tpu.ops.nms import nms_fixed, iou_matrix  # noqa
