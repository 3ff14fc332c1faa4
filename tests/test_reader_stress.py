"""Reader-thread shutdown stress test (SURVEY §5 race-detection item).

The reference's reader relies on a 1s-timeout put loop it calls 'hackish'
(reader.py:140-157,508-511) and can deadlock or leak its subprocess when
closed mid-stream. Hammer open/read/close cycles and assert clean joins."""

import sys
import threading

import numpy as np
import pytest

from terran_tpu.io.video import EndOfVideo
from terran_tpu.io.video.reader import Video

FAKE_PROBE = {
    "streams": [{
        "codec_type": "video", "width": 16, "height": 12,
        "avg_frame_rate": "30/1", "duration": "1000.0",
    }],
    "format": {"duration": "1000.0"},
}


def make_endless_video(monkeypatch, batch_size=2):
    monkeypatch.setattr(
        "terran_tpu.io.video.reader.ffmpeg_probe", lambda p, **kw: FAKE_PROBE
    )
    video = Video("/fake.mp4", batch_size=batch_size)
    emit = (
        "import sys\n"
        "chunk = bytes(range(256)) * (16 * 12 * 3 // 256 + 1)\n"
        "chunk = chunk[:16 * 12 * 3]\n"
        "while True:\n"
        "    try:\n"
        "        sys.stdout.buffer.write(chunk)\n"
        "    except BrokenPipeError:\n"
        "        break\n"
    )
    monkeypatch.setattr(
        video, "_prepare_ffmpeg_cmd", lambda: [sys.executable, "-c", emit]
    )
    return video


def test_close_mid_stream_many_times(monkeypatch):
    for trial in range(8):
        video = make_endless_video(monkeypatch)
        for _ in range(trial % 3 + 1):
            frames = video.read_frames()
            assert frames.shape == (2, 12, 16, 3)
        video.close()
        assert not video._thread.is_alive()
        with pytest.raises(EndOfVideo):
            video.read_frames()


def test_close_without_reading(monkeypatch):
    video = make_endless_video(monkeypatch)
    video.close()  # no thread ever started
    assert video._closed


def test_close_while_consumer_blocked(monkeypatch):
    """Closing from another thread while a reader could be mid-queue."""
    video = make_endless_video(monkeypatch)
    video.read_frames()

    results = []

    def consumer():
        try:
            for _ in range(1000):
                video.read_frames()
        except EndOfVideo:
            results.append("eof")
        except Exception as exc:  # pragma: no cover
            results.append(exc)

    thread = threading.Thread(target=consumer)
    thread.start()
    video.close()
    thread.join(timeout=10)
    assert not thread.is_alive()
    # The consumer either drained to EndOfVideo or exited via the closed
    # flag; no deadlock, no stray exception.
    assert results in ([], ["eof"]) or results == ["eof"]


def test_no_thread_leak(monkeypatch):
    baseline = threading.active_count()
    for _ in range(5):
        video = make_endless_video(monkeypatch)
        video.read_frames()
        video.close()
    assert threading.active_count() <= baseline + 1
