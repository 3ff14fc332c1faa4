"""Pillow visualization backend (ref: /root/reference/terran/vis/pillow.py).

Default backend. Same drawing semantics: rectangle face markers with label
boxes, line limbs and ellipse keypoints for poses.
"""

import sys

import numpy as np
from PIL import Image, ImageDraw, ImageFont

from terran_tpu.pose import Keypoint
from terran_tpu.vis import (
    FACE_COLORMAP, POSE_CONNECTIONS, POSE_CONNECTION_COLORS,
    POSE_KEYPOINT_COLORS,
)


def get_font():
    """Best-effort system TTF lookup (ref pillow.py:13-34)."""
    if sys.platform == "win32":
        font_names = ["Arial"]
    elif sys.platform in ("linux", "linux2"):
        font_names = ["DejaVuSans-Bold", "DroidSans-Bold"]
    elif sys.platform == "darwin":
        font_names = ["Menlo", "Helvetica"]
    else:
        font_names = []

    for font_name in font_names:
        try:
            return ImageFont.truetype(font_name)
        except IOError:
            continue
    return None


SYSTEM_FONT = get_font()


def _text_size(font, text):
    """Pillow>=10 removed ``getsize``; measure via getbbox."""
    left, top, right, bottom = font.getbbox(str(text))
    return right - left, bottom - top


def draw_label(draw, coords, text, color, scale=1):
    """Filled label box + text at the top-left corner (ref pillow.py:40-75)."""
    if SYSTEM_FONT:
        label_font = SYSTEM_FONT.font_variant(size=round(16 * scale))
    else:
        label_font = ImageFont.load_default()

    text = str(text)
    text_w, _ = _text_size(label_font, text)
    margin_w, _ = _text_size(label_font, "M")
    margin_w *= 0.2
    _, full_line_height = _text_size(label_font, "Mq")

    background_coords = [
        float(coords[0]),
        float(coords[1]),
        float(coords[0]) + text_w + 3 * margin_w,
        float(coords[1]) + full_line_height * 1.15,
    ]
    draw.rectangle(background_coords, fill=tuple(color) + (255,))
    draw.text(
        [coords[0] + margin_w, coords[1]], text, font=label_font
    )


def draw_marker(draw, coords, color=(255, 0, 0), scale=1):
    """Rectangle face marker (ref pillow.py:78-85). Corners are normalised —
    degenerate sub-pixel detections can arrive inverted, which PIL rejects."""
    x1, y1, x2, y2 = (float(c) for c in coords)
    box = [min(x1, x2), min(y1, y2), max(x1, x2), max(y1, y2)]
    width = int(3 * scale)
    draw.rectangle(box, outline=tuple(color) + (255,), width=width)


def vis_faces(image, faces, scale=1.0):
    """Draw face boxes (+ optional labels) on a copy of ``image``
    (ref pillow.py:88-136)."""
    if not isinstance(faces, (list, tuple)):
        faces = [faces]

    image = Image.fromarray(image)
    draw = ImageDraw.Draw(image, "RGBA")

    for face in faces:
        face_name = face.get("name") or face.get("track")
        if face.get("text") is not None:
            face_text = face["text"]
        elif face.get("track") is not None:
            face_text = f"#{face['track']}"
        else:
            face_text = None

        color = tuple(FACE_COLORMAP(face_name))
        draw_marker(draw, face["bbox"], color=color, scale=scale)
        if face_text is not None:
            draw_label(draw, face["bbox"][:2], face_text, color, scale=scale)

    return np.asarray(image)


def draw_keypoints(draw, keypoints, scale=1.0):
    """Ellipse keypoints (ref pillow.py:139-151)."""
    scale = int(scale * 4)
    for keypoint in keypoints:
        for idx, (x, y, is_present) in enumerate(keypoint["keypoints"]):
            if not is_present:
                continue
            color = tuple(POSE_KEYPOINT_COLORS[Keypoint(idx)]) + (225,)
            radius = int(3 * scale / 2)
            draw.ellipse(
                [x - radius, y - radius, x + radius, y + radius], fill=color
            )


def draw_limbs(draw, keypoints, scale=1.0):
    """Line limbs (ref pillow.py:154-168)."""
    scale = int(scale * 8)
    for keypoint in keypoints:
        kps = keypoint["keypoints"]
        for idx, (conn_src, conn_dst) in enumerate(POSE_CONNECTIONS):
            x_src, y_src, src_present = kps[conn_src.value]
            x_dst, y_dst, dst_present = kps[conn_dst.value]
            if not (src_present and dst_present):
                continue
            color = tuple(POSE_CONNECTION_COLORS[idx]) + (180,)
            draw.line(
                [int(x_src), int(y_src), int(x_dst), int(y_dst)],
                fill=color, width=scale,
            )


def vis_poses(image, poses, scale=1.0):
    """Draw poses on a copy of ``image`` (ref pillow.py:171-197)."""
    if not isinstance(poses, (list, tuple)):
        poses = [poses]

    image = Image.fromarray(image)
    draw = ImageDraw.Draw(image, "RGBA")
    draw_limbs(draw, poses, scale=scale)
    draw_keypoints(draw, poses, scale=scale)
    return np.asarray(image)
