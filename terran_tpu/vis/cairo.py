"""Cairo visualization backend (ref: /root/reference/terran/vis/cairo.py).

Optional extra — selected automatically when pycairo is importable
(vis/__init__.py falls back to the Pillow backend otherwise). Rounded-box +
crosshair face markers; bezier-ribbon limbs with keypoint dots.
"""

import math

import cairo
import numpy as np
from cairo import Context, ImageSurface
from functools import wraps

from terran_tpu.pose import Keypoint
from terran_tpu.vis import (
    FACE_COLORMAP, MARKER_SCALES, POSE_CONNECTIONS, POSE_CONNECTION_COLORS,
    POSE_KEYPOINT_COLORS,
)


def with_cairo(vis_func):
    """Prepare a BGRA cairo surface around an RGB array (ref cairo.py:15-76)."""

    @wraps(vis_func)
    def func(image, objects, *args, **kwargs):
        if not isinstance(objects, (list, tuple)):
            objects = [objects]

        area = image.shape[1] * image.shape[0]
        for ref_area, scale in MARKER_SCALES:
            if area >= ref_area:
                break

        with_alpha = np.concatenate(
            [
                image[..., ::-1],
                255 * np.ones(
                    (image.shape[0], image.shape[1], 1), dtype=np.uint8
                ),
            ],
            axis=2,
        )
        surface = ImageSurface.create_for_data(
            with_alpha, cairo.Format.RGB24, image.shape[1], image.shape[0]
        )
        ctx = Context(surface)
        ctx.select_font_face(
            "DejaVuSans-Bold", cairo.FONT_SLANT_NORMAL,
            cairo.FONT_WEIGHT_NORMAL,
        )
        ctx.set_font_size(int(16 * scale))

        vis_func(ctx, objects, scale=scale, *args, **kwargs)

        return with_alpha[..., :-1][..., ::-1]

    return func


def draw_marker(ctx, coords, color=(255, 0, 0), scale=1):
    """Rounded-corner box with dashed crosshair (ref cairo.py:79-125)."""
    x_min, y_min, x_max, y_max = coords
    width = x_max - x_min
    height = y_max - y_min
    degrees = math.pi / 180.0
    radius = 10.0 * scale

    ctx.set_source_rgba(*color, 1.0)
    ctx.set_line_width(3.0 * scale)
    ctx.set_dash([])

    ctx.new_sub_path()
    ctx.arc(x_min + width - radius, y_min + radius, radius,
            -90 * degrees, 0 * degrees)
    ctx.arc(x_min + width - radius, y_min + height - radius, radius,
            0 * degrees, 90 * degrees)
    ctx.arc(x_min + radius, y_min + height - radius, radius,
            90 * degrees, 180 * degrees)
    ctx.arc(x_min + radius, y_min + radius, radius,
            180 * degrees, 270 * degrees)
    ctx.close_path()
    ctx.stroke()

    ctx.set_dash([10.0 * scale])
    ctx.set_line_width(1.0 * scale)
    ctx.move_to((x_min + x_max) / 2, y_min)
    ctx.line_to((x_min + x_max) / 2, y_max)
    ctx.move_to(x_min, (y_min + y_max) / 2)
    ctx.line_to(x_max, (y_min + y_max) / 2)
    ctx.stroke()


@with_cairo
def vis_faces(ctx, faces, scale=1.0):
    """Draw face markers + labels (ref cairo.py:128-171)."""
    for face in faces:
        face_name = face.get("name") or face.get("track")
        if face.get("text") is not None:
            face_text = face["text"]
        elif face.get("track") is not None:
            face_text = f"#{face['track']}"
        else:
            face_text = None

        color = map(lambda x: x / 255, FACE_COLORMAP(face_name))
        draw_marker(ctx, face["bbox"], color=color, scale=scale)

        if face_text is not None:
            ctx.move_to(
                face["bbox"][0] + 3 * scale, face["bbox"][1] + 15 * scale
            )
            ctx.show_text(face_text)


def draw_keypoints(ctx, keypoints, scale=1.0):
    """Filled keypoint dots (ref cairo.py:174-188)."""
    for keypoint in keypoints:
        for idx, (x, y, is_present) in enumerate(keypoint["keypoints"]):
            if not is_present:
                continue
            color = map(lambda v: v / 255, POSE_KEYPOINT_COLORS[Keypoint(idx)])
            ctx.set_source_rgba(*color, 0.9)
            ctx.arc(x, y, 3 * scale, 0, 2 * math.pi)
            ctx.fill()
            ctx.stroke()


def draw_limbs(ctx, keypoints, scale=1.0):
    """Bezier-ribbon limbs (ref cairo.py:191-234)."""
    for keypoint in keypoints:
        kps = keypoint["keypoints"]
        for idx, (conn_src, conn_dst) in enumerate(POSE_CONNECTIONS):
            x_src, y_src, src_present = kps[conn_src.value]
            x_dst, y_dst, dst_present = kps[conn_dst.value]
            if not (src_present and dst_present):
                continue

            color = map(lambda v: v / 255, POSE_CONNECTION_COLORS[idx])
            ctx.set_source_rgba(*color, 0.7)
            ctx.set_line_width(1.0)

            width = 4 * scale
            if abs(y_dst - y_src) > 0:
                normal = -(x_dst - x_src) / (y_dst - y_src)
                x_base = width / math.sqrt(normal ** 2 + 1)
                y_base = x_base * normal
            else:
                x_base = 0
                y_base = width

            ctx.move_to(x_src, y_src)
            ctx.curve_to(
                int(x_src + x_base), int(y_src + y_base),
                int(x_dst + x_base), int(y_dst + y_base),
                x_dst, y_dst,
            )
            ctx.curve_to(
                int(x_dst - x_base), int(y_dst - y_base),
                int(x_src - x_base), int(y_src - y_base),
                x_src, y_src,
            )
            ctx.fill()
            ctx.stroke()


@with_cairo
def vis_poses(ctx, poses, scale=1.0):
    """Draw poses (ref cairo.py:237-256)."""
    draw_limbs(ctx, poses, scale=scale)
    draw_keypoints(ctx, poses, scale=scale)
