"""Face search: find which images in a directory contain a reference face.

Functional port of the reference's match example: one reference embedding,
cosine-distance comparison against every detected face in a directory.
This version batches the gallery scan and reports a summary at the end.
"""

import click
import numpy as np

from terran_tpu.face import extract_features, face_detection
from terran_tpu.io import open_image, resolve_images
from terran_tpu.vis import display_image, vis_faces


def embed_reference(path):
    """Detect and embed the single face in the reference image, or None
    when the image doesn't contain exactly one face."""
    image = open_image(path)
    faces = face_detection(image)
    if len(faces) != 1:
        click.echo(
            f"Reference image must have exactly one face, found {len(faces)}."
        )
        return None
    return extract_features(image, faces)[0]


def scan_gallery(ref_embedding, image_dir, batch_size, threshold):
    """Yield (path, image, face, distance) for every match under the
    threshold."""
    for batch_paths in resolve_images(image_dir, batch_size=batch_size):
        images = [open_image(p) for p in batch_paths]
        faces_per_image = face_detection(images)
        embeddings_per_image = extract_features(images, faces_per_image)

        for path, image, faces, embeddings in zip(
            batch_paths, images, faces_per_image, embeddings_per_image
        ):
            if not len(embeddings):
                continue
            # Cosine distance = 1 - dot for unit-norm embeddings.
            distances = 1.0 - embeddings @ ref_embedding
            for face, distance in zip(faces, distances):
                if distance < threshold:
                    yield path, image, face, float(distance)


@click.command(name="match-dir")
@click.argument("reference")
@click.argument("image-dir")
@click.option("--batch-size", type=int, default=1)
@click.option("--threshold", type=float, default=0.5,
              help="Cosine-distance threshold for a match.")
@click.option("--display", is_flag=True, default=False)
def match_directory(reference, image_dir, batch_size, threshold, display):
    ref_embedding = embed_reference(reference)
    if ref_embedding is None:
        return

    matches = 0
    for path, image, face, distance in scan_gallery(
        ref_embedding, image_dir, batch_size, threshold
    ):
        matches += 1
        click.echo(f"{path}, confidence = {distance:.2f}")
        if display:
            display_image(vis_faces(image, face))

    click.echo(f"{matches} matching face(s) found.")


if __name__ == "__main__":
    match_directory()
