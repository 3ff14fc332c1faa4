"""Multi-stream multiplexer and concurrent-stream perception tests."""

import numpy as np
import pytest

from terran_tpu.io.streams import MultiStreamPerception, StreamMultiplexer
from terran_tpu.io.video.synthetic import SyntheticVideo


def make_streams(counts, w=16, h=8, batch=3):
    return [
        SyntheticVideo(width=w, height=h, num_frames=n, batch_size=batch,
                       seed=i)
        for i, n in enumerate(counts)
    ]


def test_multiplexer_round_robin_and_flush():
    mux = StreamMultiplexer(make_streams([5, 3, 4]), batch_size=4)
    batches = list(mux)
    total = sum(len(m) for _, m in batches)
    assert total == 12  # all frames from all streams exactly once

    seen = set()
    for frames, meta in batches:
        assert frames.shape[0] == len(meta)
        assert frames.shape[1:] == (8, 16, 3)
        for pair in meta:
            assert pair not in seen
            seen.add(pair)
    # Per-stream frame indices are contiguous from 0.
    for stream_idx, count in enumerate([5, 3, 4]):
        frames_for = sorted(f for s, f in seen if s == stream_idx)
        assert frames_for == list(range(count))
    # Full batches until sources drain; the remainder is flushed.
    sizes = [len(m) for _, m in batches]
    assert sum(sizes) == 12 and all(s <= 4 for s in sizes)


def test_multiplexer_interleaves_streams():
    mux = StreamMultiplexer(make_streams([4, 4]), batch_size=4)
    first_frames, first_meta = next(iter(mux))
    # Round-robin: alternating streams in the first batch.
    assert [s for s, _ in first_meta] == [0, 1, 0, 1]


def test_multistream_perception_demuxes(tiny_pipeline):
    streams = make_streams([4, 2], w=128, h=96, batch=2)
    msp = MultiStreamPerception(
        tiny_pipeline, streams, batch_size=4, track=False
    )
    results = [r for batch in msp for r in batch]
    assert len(results) == 6
    by_stream = {}
    for r in results:
        by_stream.setdefault(r["stream"], []).append(r["frame"])
        assert isinstance(r["faces"], list)
        assert r["pose"] is not None
    assert sorted(by_stream[0]) == [0, 1, 2, 3]
    assert sorted(by_stream[1]) == [0, 1]


@pytest.fixture(scope="module")
def tiny_pipeline():
    from terran_tpu.pipeline import PerceptionPipeline
    from terran_tpu.utils.convert import (
        convert_arcface, convert_openpose, convert_retinaface,
    )
    from torch_oracle import (
        random_arcface_state_dict, random_openpose_state_dict,
        random_retinaface_state_dict,
    )

    rng = np.random.default_rng(44)
    return PerceptionPipeline(
        det_params=convert_retinaface(random_retinaface_state_dict(rng)),
        rec_params=convert_arcface(random_arcface_state_dict(rng)),
        pose_params=convert_openpose(random_openpose_state_dict(rng)),
        det_short_side=64, pose_short_side=48, top_k=16, max_faces=4,
        max_peaks=8,
    )
