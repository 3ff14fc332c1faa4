"""Multi-process decode fan-in (io/video/parallel.py) — driven with fake
subprocess commands exactly like test_io.py drives the serial reader: each
'ffmpeg' is a python one-liner emitting deterministic rgb24 frames whose
pixel value encodes the global frame index, so ordering is verifiable."""

import sys

import numpy as np
import pytest

from terran_tpu.io.video import EndOfVideo, VideoClosed
from terran_tpu.io.video.parallel import ParallelVideo

W, H, FPS = 8, 6, 10

FAKE_PROBE = {
    "streams": [{
        "codec_type": "video", "width": W, "height": H,
        "avg_frame_rate": f"{FPS}/1", "duration": "4.0",
    }],
    "format": {"duration": "4.0"},
}


def segment_emitter(seg_start, seg_duration):
    """A command that writes the frames of [seg_start, seg_start+dur):
    frame k (global index) is a full frame of byte value k % 256."""
    first = int(round(seg_start * FPS))
    n = int(round(seg_duration * FPS))
    code = (
        "import sys\n"
        f"for k in range({first}, {first + n}):\n"
        f"    sys.stdout.buffer.write(bytes([k % 256]) * ({W * H * 3}))\n"
    )
    # -S skips site initialisation (this sandbox's sitecustomize imports
    # jax, which would cost seconds per fake decoder).
    return [sys.executable, "-S", "-c", code]


def make_parallel_video(monkeypatch, **kwargs):
    monkeypatch.setattr(
        "terran_tpu.io.video.reader.ffmpeg_probe", lambda p, **kw: FAKE_PROBE
    )
    kwargs.setdefault("workers", 2)
    kwargs.setdefault("batch_size", 4)
    kwargs.setdefault("segment_time", 1.0)
    video = ParallelVideo("/fake/video.mp4", **kwargs)
    monkeypatch.setattr(video, "_prepare_segment_cmd", segment_emitter)
    return video


def test_ordered_fan_in_two_workers(monkeypatch):
    video = make_parallel_video(monkeypatch)
    assert len(video.segments) == 4

    values = []
    batches = 0
    for batch in video:
        assert batch.shape[1:] == (H, W, 3)
        values.extend(batch[:, 0, 0, 0].tolist())
        batches += 1
    # 40 frames in exact source order despite 2 concurrent decoders.
    assert values == [k % 256 for k in range(40)]
    # Batches never span segments: 10 frames/segment at batch 4 -> 4+4+2.
    assert batches == 12


def test_single_worker_matches(monkeypatch):
    video = make_parallel_video(monkeypatch, workers=1, batch_size=None)
    frames = [frame[0, 0, 0] for frame in video]
    assert frames == [k % 256 for k in range(40)]


def test_start_time_and_read_for(monkeypatch):
    video = make_parallel_video(
        monkeypatch, start_time=1.0, read_for=2.0, batch_size=5
    )
    values = []
    for batch in video:
        values.extend(batch[:, 0, 0, 0].tolist())
    assert values == [k % 256 for k in range(10, 30)]


def test_worker_exception_propagates_in_order(monkeypatch):
    video = make_parallel_video(monkeypatch)

    def flaky(seg_start, seg_duration):
        if int(round(seg_start * FPS)) == 20:  # third segment
            raise RuntimeError("decoder exploded")
        return segment_emitter(seg_start, seg_duration)

    monkeypatch.setattr(video, "_prepare_segment_cmd", flaky)
    values = []
    with pytest.raises(RuntimeError, match="decoder exploded"):
        for batch in video:
            values.extend(batch[:, 0, 0, 0].tolist())
    # Everything before the failing segment arrived intact and in order.
    assert values == [k % 256 for k in range(20)]
    # Decode errors are terminal AND sticky: a retrying caller gets the
    # SAME error re-delivered (r4 converted it to a clean EndOfVideo,
    # which hid the failure from any second consumer) instead of
    # blocking forever on the dead segment's queue.
    with pytest.raises(RuntimeError, match="decoder exploded"):
        video.read_frames()
    # And the with-block's close() still works after the error — the r5
    # review found the old error path flipped the closed flag, so
    # __exit__ raised VideoClosed OVER the actual decode error.
    video.close()
    for thread in video._threads:
        assert not thread.is_alive()
    from terran_tpu.io.video import VideoClosed

    with pytest.raises(VideoClosed):
        video.close()


def test_nonzero_exit_is_a_failure_not_eof(monkeypatch):
    """A decoder that dies mid-segment with a nonzero exit code must
    surface as an FFmpegError, NOT a clean segment end — the r5 review
    found a crashed segment was indistinguishable from EOF, silently
    dropping a mid-video chunk of frames."""
    from terran_tpu.io.video.reader import FFmpegError

    video = make_parallel_video(monkeypatch, workers=1)

    def crashing(seg_start, seg_duration):
        if int(round(seg_start * FPS)) == 10:  # second segment
            # Emits half its frames, then dies nonzero mid-decode.
            code = (
                "import sys\n"
                f"for k in range(10, 15):\n"
                f"    sys.stdout.buffer.write(bytes([k]) * ({W * H * 3}))\n"
                "sys.stderr.write('simulated decoder crash')\n"
                "sys.exit(3)\n"
            )
            return [sys.executable, "-S", "-c", code]
        return segment_emitter(seg_start, seg_duration)

    monkeypatch.setattr(video, "_prepare_segment_cmd", crashing)
    values = []
    with pytest.raises(FFmpegError, match="code 3.*simulated decoder"):
        for batch in video:
            values.extend(batch[:, 0, 0, 0].tolist())
    # Segment 0 and the partial frames of the crashed segment arrived.
    assert values == [k % 256 for k in range(15)]


def test_close_mid_stream_joins_workers(monkeypatch):
    video = make_parallel_video(monkeypatch)
    first = video.read_frames()
    assert first[0, 0, 0, 0] == 0
    video.close()
    for thread in video._threads:
        assert not thread.is_alive()
    with pytest.raises(EndOfVideo):
        video.read_frames()
    with pytest.raises(VideoClosed):
        video.close()


def test_rejects_streams_and_unknown_duration(monkeypatch):
    with pytest.raises(ValueError, match="seekable"):
        ParallelVideo("http://example.com/stream")

    probe = {"streams": [dict(FAKE_PROBE["streams"][0])], "format": {}}
    del probe["streams"][0]["duration"]
    monkeypatch.setattr(
        "terran_tpu.io.video.reader.ffmpeg_probe", lambda p, **kw: probe
    )
    with pytest.raises(ValueError, match="duration"):
        ParallelVideo("/fake/video.mp4")


def test_len_and_framerate(monkeypatch):
    video = make_parallel_video(monkeypatch, batch_size=4)
    assert video.framerate == FPS
    assert len(video) == 10  # ceil(40 / 4)
    video_fr = make_parallel_video(monkeypatch, framerate=5)
    assert video_fr.framerate == 5
