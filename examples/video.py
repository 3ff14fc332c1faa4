"""Face detection over a video, written back out with boxes drawn.

TPU-native take on the reference example
(/root/reference/examples/video.py), with three differences:

- ``--threshold`` actually works (the reference accepts and ignores it);
  it is plumbed into the detector's score threshold.
- ``--workers N`` (N > 1) decodes the source with the multi-process
  segmented reader (``ParallelVideo``) so a single high-fps file doesn't
  bottleneck on one ffmpeg process.
- ``--engine pipeline`` runs the software-pipelined fused path
  (``PerceptionPipeline.process_stream``): on-device resize + decode +
  NMS, batches dispatched ahead of the host stages — the highest-
  throughput way to run detection-only over video on a TPU.
- Rendering still happens in the writer thread (deferred render), so
  drawing overlaps the next batch's TPU inference.
"""

import click

from terran_tpu.face.detection import Detection
from terran_tpu.io import open_video, open_video_parallel, write_video
from terran_tpu.vis import vis_faces


@click.command(name="find-video")
@click.argument("video-path")
@click.argument("output-path")
@click.option("--threshold", type=float, default=0.5,
              help="Detection score threshold.")
@click.option("--batch-size", default=32)
@click.option("--duration", "-d", default=None, type=int)
@click.option("--framerate", "-f", default=None, type=int)
@click.option("--start-time", "-ss", default=None, type=str)
@click.option("--workers", "-w", default=1, type=int,
              help="Decoder processes (>1 uses the segmented reader).")
@click.option("--engine", type=click.Choice(["task", "pipeline"]),
              default="task",
              help="'task' = Detection API (host resize, reference "
                   "semantics); 'pipeline' = fused on-device path with "
                   "software-pipelined batches.")
@click.option("--transfer-plan", type=click.Choice(["device", "host"]),
              default="device",
              help="Pipeline engine only: 'host' uploads the resizes and "
                   "per-face windows instead of the raw frames (faster on "
                   "link-bound hosts; identical results).")
def find_video(video_path, output_path, threshold, batch_size, duration,
               framerate, start_time, workers, engine, transfer_plan):
    reader_options = dict(
        batch_size=batch_size,
        read_for=duration,
        start_time=start_time,
        framerate=framerate,
    )
    if workers > 1:
        video = open_video_parallel(video_path, workers=workers,
                                    **reader_options)
    else:
        video = open_video(video_path, **reader_options)

    writer = write_video(output_path, copy_format_from=video)

    if engine == "pipeline":
        from terran_tpu.pipeline import PerceptionPipeline

        pipeline = PerceptionPipeline(
            threshold=threshold, with_pose=False, with_embeddings=False,
            transfer_plan=transfer_plan,
        )
        with click.progressbar(length=len(video)) as bar:
            for frames, out in _pipeline_stream(pipeline, video):
                for frame, faces in zip(frames, pipeline.faces_from(out)):
                    writer.write_frame(vis_faces, frame, faces)
                bar.update(1)
    else:
        detect = Detection(threshold=threshold)
        with click.progressbar(video, length=len(video)) as batches:
            for frames in batches:
                faces_per_frame = detect(frames)
                for frame, faces in zip(frames, faces_per_frame):
                    # Deferred render: executed in the writer thread so
                    # drawing overlaps the next batch's inference.
                    writer.write_frame(vis_faces, frame, faces)

    writer.close()


def _pipeline_stream(pipeline, video):
    """Yield (frames, results) with the device pipelined ahead: frames are
    teed so each decoded batch is kept until its results arrive."""
    from collections import deque

    held = deque()

    def feed():
        for frames in video:
            held.append(frames)
            yield frames

    for out in pipeline.process_stream(feed()):
        yield held.popleft(), out


if __name__ == "__main__":
    find_video()
