"""Face detection over a video, written back out with boxes drawn.

Port of the reference example (/root/reference/examples/video.py): open a
video with the background-prefetch reader, detect faces per batch of
frames, and hand `vis_faces` to the writer so rendering happens in the
writer thread, overlapped with TPU compute.
"""

import click

from terran_tpu.face.detection import face_detection
from terran_tpu.io import open_video, write_video
from terran_tpu.vis import vis_faces


@click.command(name="find-video")
@click.argument("video-path")
@click.argument("output-path")
@click.option("--threshold", type=float, default=0.5)
@click.option("--batch-size", default=32)
@click.option("--duration", "-d", default=None, type=int)
@click.option("--framerate", "-f", default=None, type=int)
@click.option("--start-time", "-ss", default=None, type=str)
def find_video(video_path, output_path, threshold, batch_size, duration,
               framerate, start_time):
    video = open_video(
        video_path,
        batch_size=batch_size,
        read_for=duration,
        start_time=start_time,
        framerate=framerate,
    )

    writer = write_video(output_path, copy_format_from=video)

    with click.progressbar(video, length=len(video)) as bar:
        for frames in bar:
            faces_per_frame = face_detection(frames)
            for frame, faces in zip(frames, faces_per_frame):
                # Deferred render: executed in the writer thread so drawing
                # overlaps the next batch's inference.
                writer.write_frame(vis_faces, frame, faces)

    writer.close()


if __name__ == "__main__":
    find_video()
