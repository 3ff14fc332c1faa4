"""Meta-test: every component PARITY.md claims exists actually imports.

Keeps the parity checklist honest as the codebase evolves — a renamed or
deleted module/symbol fails here before the documentation rots.
"""

import importlib

import pytest

# (module, required attributes) for each SURVEY §2 component.
COMPONENTS = [
    ("terran_tpu.runtime", ["default_device", "Policy", "bucket_shape",
                            "enable_compilation_cache"]),
    ("terran_tpu.checkpoint", ["CHECKPOINTS", "get_checkpoint_path",
                               "get_class_for_checkpoint", "checkpoint_cmd"]),
    ("terran_tpu.utils.convert", ["convert_retinaface", "convert_arcface",
                                  "convert_openpose", "save_params",
                                  "load_params"]),
    ("terran_tpu.cli", ["cli"]),
    ("terran_tpu.io.image", ["open_image", "resolve_images"]),
    ("terran_tpu.io.video.reader", ["Video", "open_video", "ffmpeg_probe"]),
    ("terran_tpu.io.video.writer", ["VideoWriter", "write_video"]),
    ("terran_tpu.io.video.synthetic", ["SyntheticVideo"]),
    ("terran_tpu.io.video.parallel", ["ParallelVideo",
                                      "open_video_parallel"]),
    ("terran_tpu.io.video.prefetch", ["device_prefetch",
                                      "fixed_shape_batches"]),
    ("terran_tpu.io.streams", ["StreamMultiplexer", "MultiStreamPerception"]),
    ("terran_tpu.models.retinaface", ["RetinaFace", "anchors_for_shape",
                                      "decode_outputs", "make_detect_fn",
                                      "unpack_detections"]),
    ("terran_tpu.models.arcface", ["FaceResNet100", "normalize_embeddings",
                                   "apply_int8", "quantize_params"]),
    ("terran_tpu.models.openpose", ["BodyPoseModel", "Int8BodyPoseModel",
                                    "apply_int8", "quantize_params"]),
    ("terran_tpu.models.quant", ["quantize_conv_kernels", "quant_conv"]),
    ("terran_tpu.ops.nms", ["nms_fixed", "iou_matrix", "make_sharded_nms"]),
    ("terran_tpu.ops.warp", ["umeyama", "umeyama_jax", "alignment_matrix",
                             "warp_affine", "warp_affine_batch",
                             "ARCFACE_TEMPLATE"]),
    ("terran_tpu.ops.upsample", ["upsample_bicubic"]),
    ("terran_tpu.ops.resize", ["resize_bilinear", "resize_bilinear_u8_numpy",
                               "resize_bilinear_u8_torch", "resized_shape"]),
    ("terran_tpu.ops.pose_decode", ["find_peaks", "limb_scores",
                                    "limb_scores_sampled",
                                    "make_pose_decode",
                                    "unpack_pose_outputs", "LIMBSEQ",
                                    "MAP_IDX"]),
    ("terran_tpu.ops.tiling", ["TiledDetector", "tile_layout",
                               "extract_tiles"]),
    ("terran_tpu.ops.fused_peaks", ["find_peaks_fused",
                                    "fused_peaks_enabled"]),
    ("terran_tpu.face.detection", ["Detection", "RetinaFaceDetector",
                                   "face_detection"]),
    ("terran_tpu.face.recognition", ["Recognition", "ArcFaceRecognizer",
                                     "extract_features",
                                     "preprocess_face_no_landmarks"]),
    ("terran_tpu.pose", ["Estimation", "Keypoint", "pose_estimation"]),
    ("terran_tpu.pose.openpose", ["OpenPoseEstimator"]),
    ("terran_tpu.pose.assembly", ["assemble_humans", "greedy_connections",
                                  "get_keypoints"]),
    ("terran_tpu.native", ["native_available", "assemble_humans_native",
                           "greedy_connections_native"]),
    ("terran_tpu.tracking.face", ["Sort", "KalmanTracker", "FaceTracking",
                                  "face_tracking",
                                  "associate_detections_to_trackers"]),
    ("terran_tpu.tracking.kalman", ["KalmanFilter"]),
    ("terran_tpu.vis", ["vis_faces", "vis_poses", "display_image",
                        "FACE_COLORMAP", "POSE_CONNECTIONS",
                        "POSE_CONNECTION_COLORS", "POSE_KEYPOINT_COLORS",
                        "MARKER_SCALES"]),
    ("terran_tpu.vis.pillow", ["vis_faces", "vis_poses", "PillowCanvas"]),
    ("terran_tpu.vis.scene", ["face_markers", "pose_limbs", "pose_dots",
                              "marker_scale"]),
    ("terran_tpu.parallel.mesh", ["create_mesh", "shard_batch",
                                  "shard_params", "batch_sharding",
                                  "replicated_sharding",
                                  "initialize_multi_host"]),
    ("terran_tpu.pipeline", ["PerceptionPipeline"]),
    ("terran_tpu.config", ["Config", "get_config", "load_config"]),
    ("terran_tpu.utils.profiling", ["trace", "StageTimer", "get_logger",
                                    "start_trace", "stop_trace"]),
]


@pytest.mark.parametrize("module_path,symbols", COMPONENTS,
                         ids=[m for m, _ in COMPONENTS])
def test_component_exists(module_path, symbols):
    module = importlib.import_module(module_path)
    for symbol in symbols:
        assert hasattr(module, symbol), f"{module_path}.{symbol}"


def test_pipeline_methods():
    from terran_tpu.pipeline import PerceptionPipeline

    for method in ("process_batch", "process_stream", "dispatch_batch",
                   "advance_batch", "collect_batch",
                   "finalize_batch", "faces_from", "put_frames"):
        assert callable(getattr(PerceptionPipeline, method))
