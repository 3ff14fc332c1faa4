"""Concurrent-stream perception demo: N videos through the fused pipeline.

Batches frames from several sources (files, webcams, or synthetic streams),
runs detect+embed+pose in two jitted programs per batch, tracks faces per
stream, and prints per-stream throughput. This is BASELINE config 5's
workload shape.
"""

import time

import click
import numpy as np


@click.command(name="streams")
@click.argument("video-paths", nargs=-1)
@click.option("--batch-size", default=8)
@click.option("--synthetic", default=0,
              help="Use N synthetic 1080p streams instead of files.")
@click.option("--frames", default=64, help="Frames per synthetic stream.")
@click.option("--multichip/--single-chip", default=False)
def run_streams(video_paths, batch_size, synthetic, frames, multichip):
    from terran_tpu.io.streams import MultiStreamPerception
    from terran_tpu.pipeline import PerceptionPipeline

    if synthetic:
        from terran_tpu.io.video.synthetic import SyntheticVideo

        streams = [
            SyntheticVideo(width=1920, height=1080, num_frames=frames,
                           batch_size=4, seed=i)
            for i in range(synthetic)
        ]
    else:
        from terran_tpu.io import open_video

        streams = [
            open_video(path, batch_size=4) for path in video_paths
        ]
    if not streams:
        click.echo("Give video paths or --synthetic N.")
        return

    mesh = None
    if multichip:
        from terran_tpu.parallel.mesh import create_mesh

        mesh = create_mesh()

    pipeline = PerceptionPipeline(mesh=mesh, max_faces=8, top_k=64,
                                  max_peaks=16)
    msp = MultiStreamPerception(pipeline, streams, batch_size=batch_size)

    counts = {}
    start = time.time()
    for results in msp:
        for r in results:
            counts[r["stream"]] = counts.get(r["stream"], 0) + 1
    elapsed = time.time() - start
    total = sum(counts.values())
    click.echo(
        f"{total} frames over {len(counts)} streams in {elapsed:.1f}s "
        f"= {total / elapsed:.1f} fps total"
    )
    for stream, n in sorted(counts.items()):
        click.echo(f"  stream {stream}: {n} frames")


if __name__ == "__main__":
    run_streams()
