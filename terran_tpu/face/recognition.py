"""Face-recognition task API and the TPU ArcFace wrapper.

Mirrors the reference layer (/root/reference/terran/face/recognition/
__init__.py and arcface/wrapper.py:102-184): faces from all images are
flattened into one batch for the embedding network and re-split per image
via cumulative sums, empty inputs return (0, 512) arrays, and outputs are
L2-normalised float32 embeddings.

TPU-first changes:
- The per-face similarity-alignment warp — the reference's host hot loop
  (skimage estimate + PIL AFFINE per face, wrapper.py:137-147) — becomes a
  tiny host-side 5-point Umeyama solve plus a vmapped on-device bilinear
  warp (``terran_tpu.ops.warp``).
- Face counts and batch sizes are bucketed to powers of two so jitted
  programs are reused across frames instead of recompiling per face count.
- Embeddings are L2-normalised on device.
"""

import numpy as np
import jax
import jax.numpy as jnp

from terran_tpu.checkpoint import get_class_for_checkpoint, load_checkpoint_params
from terran_tpu.config import get_config
from terran_tpu.models.arcface import (
    FaceResNet100, apply_int8, normalize_embeddings, quantize_params,
)
from terran_tpu.ops.warp import alignment_matrices, warp_affine_batch
from terran_tpu.runtime import (
    PARAMS_KEEP_F32, cast_params_for_compute, default_policy,
)

TASK_NAME = "face-recognition"

EMBEDDING_DIM = 512


def _next_pow2(n):
    p = 1
    while p < n:
        p *= 2
    return p


def preprocess_face_no_landmarks(image, image_side=112):
    """Resize-to-side + centre pad fallback when no landmarks are available
    (reference wrapper.py:75-99); returns RGB HWC uint8."""
    from PIL import Image

    face = Image.fromarray(image)
    scale = image_side / max(face.size[0], face.size[1])
    face = face.resize((int(face.size[0] * scale), int(face.size[1] * scale)))

    x_min = int((image_side - face.size[0]) / 2)
    y_min = int((image_side - face.size[1]) / 2)

    out = np.zeros((image_side, image_side, 3), dtype=np.uint8)
    out[y_min: y_min + face.size[1], x_min: x_min + face.size[0]] = (
        np.asarray(face)
    )
    return out


class ArcFaceRecognizer:
    """Jitted ArcFace embedding wrapper with on-device alignment."""

    CHECKPOINT_CLASS = "terran_tpu.face.recognition.ArcFaceRecognizer"

    def __init__(self, params=None, compute_dtype=None, device=None,
                 image_side=None, embed_precision=None):
        if image_side is None:
            image_side = get_config().recognition_crop_side
        if params is None:
            params = load_checkpoint_params(self.CHECKPOINT_CLASS)
        # Keep weights device-resident: converted params arrive as host numpy
        # arrays, and feeding them to a jitted call re-uploads them over the
        # host->HBM link every invocation (~2s/call for the larger models).
        # ``device`` (a jax.Device) selects the chip, like the reference's
        # torch device kwarg; default is the first accelerator.
        import jax
        dtype = compute_dtype or default_policy().compute_dtype
        self.embed_precision = (
            get_config().embed_precision if embed_precision is None
            else embed_precision
        )
        if self.embed_precision == "int8":
            # Opt-in int8 trunk (models.arcface.apply_int8): quantise
            # from the f32 masters; 2x MXU rate, off for parity runs.
            params = quantize_params(params, dtype)
        else:
            # Pre-cast f32 weights to the compute dtype (bit-identical,
            # minus the per-execution HBM read of the 65 MB f32 copy);
            # the f32-accumulated 'embed' Dense stays f32
            # (PARAMS_KEEP_F32).
            params = cast_params_for_compute(
                params, dtype, keep_f32=PARAMS_KEEP_F32["arcface"]
            )
        self.params = (
            jax.device_put(params, device) if device is not None
            else jax.device_put(params)
        )
        self.device = device
        self.image_side = image_side
        self.model = FaceResNet100(compute_dtype=dtype)
        self._embed_fns = {}
        self._align_embed_fns = {}

    def _apply(self, params, crops):
        """Unnormalised features via the configured precision."""
        if self.embed_precision == "int8":
            return apply_int8(
                params, crops, compute_dtype=self.model.compute_dtype
            )
        return self.model.apply(
            {"params": params},
            crops.astype(self.model.compute_dtype),
        )

    def _embed(self, crops):
        """Embed (K, S, S, 3) float crops, bucketing K to a power of two."""
        k = crops.shape[0]
        kb = _next_pow2(k)
        if kb != k:
            crops = np.concatenate(
                [crops, np.zeros((kb - k,) + crops.shape[1:], crops.dtype)]
            )
        if kb not in self._embed_fns:
            @jax.jit
            def fn(params, x):
                feats = self._apply(params, x)
                return normalize_embeddings(feats.astype(jnp.float32))
            self._embed_fns[kb] = fn
        feats = self._embed_fns[kb](self.params, crops)
        return np.asarray(feats, dtype=np.float32)[:k]

    def _alignment_mats(self, faces):
        """(K, 2, 3) alignment matrices for one image's faces, padded to a
        power-of-two face count so jitted programs are reused."""
        mats = alignment_matrices(np.stack([
            np.asarray(face["landmarks"], dtype=np.float32)
            for face in faces
        ]))
        k = mats.shape[0]
        kb = _next_pow2(k)
        if kb != k:
            mats = np.concatenate(
                [mats, np.tile(np.eye(2, 3, dtype=np.float32), (kb - k, 1, 1))]
            )
        return mats, k

    def align(self, image, faces):
        """Warp every face of one image to aligned 112x112 RGB crops."""
        mats, k = self._alignment_mats(faces)
        crops = warp_affine_batch(
            np.asarray(image), jnp.asarray(mats),
            out_h=self.image_side, out_w=self.image_side,
        )
        # The reference's PIL warp rounds to uint8 (wrapper.py:63-71); round
        # for bitwise-closer parity before the network's /128 normalisation.
        return np.asarray(jnp.round(crops))[:k]

    def _align_embed(self, image, mats):
        """Fused on-device align + embed for one image: the crops never
        return to the host (the reference's alignment is a per-face host
        loop feeding a separate device batch, wrapper.py:137-174)."""
        key = (image.shape, mats.shape[0])
        if key not in self._align_embed_fns:
            side = self.image_side

            @jax.jit
            def fn(params, image, mats):
                crops = warp_affine_batch(image, mats, out_h=side, out_w=side)
                crops = jnp.round(crops)  # reference warps to uint8
                feats = self._apply(params, crops)
                return normalize_embeddings(feats.astype(jnp.float32))

            self._align_embed_fns[key] = fn
        return self._align_embed_fns[key](self.params, image, mats)

    def call(self, images, faces_per_image=None):
        """Extract embeddings; same contract as the reference wrapper
        (wrapper.py:109-184)."""
        if faces_per_image is not None:
            per_image_feats = []
            for image, faces in zip(images, faces_per_image):
                if not faces:
                    per_image_feats.append(
                        np.empty((0, EMBEDDING_DIM), np.float32)
                    )
                    continue
                mats, k = self._alignment_mats(faces)
                feats = self._align_embed(
                    np.asarray(image), jnp.asarray(mats)
                )
                per_image_feats.append(
                    np.asarray(feats, dtype=np.float32)[:k]
                )
            return per_image_feats

        # No landmarks: resize+pad each whole image and embed the batch
        # (reference wrapper.py:149-157 packs them as one pseudo-image).
        preprocessed = [
            preprocess_face_no_landmarks(image, self.image_side)
            .astype(np.float32)
            for image in images
        ]
        if not preprocessed:
            return [np.empty((0, EMBEDDING_DIM)) for _ in images]
        batch = np.stack(preprocessed, axis=0).astype(np.float32)
        return self._embed(batch)


class Recognition:
    """Generic recognition task (reference Recognition,
    face/recognition/__init__.py:7-90)."""

    def __init__(self, checkpoint=None, device=None, lazy=False,
                 **model_kwargs):
        self.device = device
        self.model_kwargs = model_kwargs
        self.recognition_cls = get_class_for_checkpoint(TASK_NAME, checkpoint)
        self.model = (
            self.recognition_cls(device=device, **model_kwargs)
            if not lazy else None
        )

    def __repr__(self):
        return f"<Recognition({self.recognition_cls.__name__})>"

    def __call__(self, images, faces_per_image=None):
        expanded = False
        if (
            not isinstance(images, (list, tuple))
            and len(images.shape) == 3
        ):
            expanded = True
            images = [images]
            # Expand faces only when provided: wrapping None into [None]
            # would route a single no-faces image into the landmark branch
            # and silently return an empty embedding array (the reference
            # has the same latent wrap at face/recognition/__init__.py:66-69
            # — there it crashes instead).
            if isinstance(faces_per_image, dict):
                faces_per_image = [[faces_per_image]]
            elif faces_per_image is not None:
                faces_per_image = [faces_per_image]

        if faces_per_image is not None and len(faces_per_image) != len(images):
            raise ValueError(
                f"`images` and `faces_per_image` must be of the same size, "
                f"but the former is of size {len(images)} while the latter of "
                f"size {len(faces_per_image)}."
            )

        if self.model is None:
            self.model = self.recognition_cls(
                device=self.device, **self.model_kwargs
            )
        out = self.model.call(images, faces_per_image)

        # Note: the reference's final `isinstance(faces_per_image, dict)`
        # check (face/recognition/__init__.py:85-86) is dead code — the
        # variable was reassigned during expansion — so its actual behaviour
        # is: single-image input always returns the per-image array.
        return out[0] if expanded else out


class _LazyRecognition:
    _instance = None

    def _resolve(self):
        if self._instance is None:
            self._instance = Recognition(lazy=True)
        return self._instance

    def __call__(self, images, faces_per_image=None):
        return self._resolve()(images, faces_per_image)


    def __getattr__(self, name):
        # Forward attribute access so the lazy proxy is a drop-in for the
        # real instance (the reference exposes a real object at import) —
        # except dunder/underscore probes (hasattr, pickling, IPython
        # introspection), which must not load the checkpoint store.
        if name.startswith("_"):
            raise AttributeError(name)
        return getattr(self._resolve(), name)


extract_features = _LazyRecognition()
"""Default entry point to face recognition."""
