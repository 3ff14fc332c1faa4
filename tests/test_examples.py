"""Example scripts drive end to end with a stocked checkpoint store and a
fake video/ffmpeg (no network, no binaries)."""

import sys
from pathlib import Path

import numpy as np
import pytest
from click.testing import CliRunner
from PIL import Image

sys.path.insert(0, str(Path(__file__).parent.parent / "examples"))


@pytest.fixture(scope="module")
def stocked_store():
    """Convert random reference-format checkpoints into the test store."""
    import torch

    from terran_tpu import checkpoint as ckpt
    from torch_oracle import (
        random_arcface_state_dict, random_retinaface_state_dict,
    )

    rng = np.random.default_rng(0)
    for cid, gen in (("b5d77fff", random_retinaface_state_dict),
                     ("d206e4b0", random_arcface_state_dict)):
        db = ckpt.read_checkpoint_db()
        entry = ckpt.get_checkpoint(db, cid)
        if entry["status"] == "DOWNLOADED":
            continue
        sd = {k: torch.as_tensor(np.ascontiguousarray(v))
              for k, v in gen(rng).items()}
        pth = ckpt.get_home() / f"{cid}.pth"
        torch.save(sd, pth)
        ckpt.convert_local_checkpoint(entry, pth)
    yield


def test_match_example(stocked_store, tmp_path, rng):
    from match import match_directory

    ref_path = tmp_path / "ref.png"
    Image.fromarray(
        rng.integers(0, 255, (120, 120, 3), dtype=np.uint8)
    ).save(ref_path)
    img_dir = tmp_path / "gallery"
    img_dir.mkdir()
    for i in range(2):
        Image.fromarray(
            rng.integers(0, 255, (100, 140, 3), dtype=np.uint8)
        ).save(img_dir / f"g{i}.png")

    runner = CliRunner()
    result = runner.invoke(
        match_directory, [str(ref_path), str(img_dir), "--threshold", "2.0"]
    )
    # Random weights either detect exactly one face in the reference image
    # (then the search runs and prints matches at the permissive threshold)
    # or not (then the script reports it and exits) — both are clean runs.
    assert result.exit_code == 0, result.output
    assert (
        "confidence" in result.output
        or "exactly one face" in result.output
    )


def test_video_example(stocked_store, tmp_path, monkeypatch, rng):
    import video as video_example

    frames = 6
    probe = {
        "streams": [{"codec_type": "video", "width": 64, "height": 48,
                     "avg_frame_rate": "3/1", "duration": "2.0"}],
        "format": {"duration": "2.0"},
    }
    monkeypatch.setattr(
        "terran_tpu.io.video.reader.ffmpeg_probe", lambda p, **kw: probe
    )
    emit = (
        "import sys\n"
        f"data = bytes(range(256)) * (64 * 48 * 3 * {frames} // 256 + 1)\n"
        f"sys.stdout.buffer.write(data[:64 * 48 * 3 * {frames}])\n"
    )
    monkeypatch.setattr(
        "terran_tpu.io.video.reader.Video._prepare_ffmpeg_cmd",
        lambda self: [sys.executable, "-c", emit],
    )
    out_raw = tmp_path / "sink.raw"
    sink = (
        "import sys, shutil\n"
        f"shutil.copyfileobj(sys.stdin.buffer, open(r'{out_raw}', 'wb'))\n"
    )
    monkeypatch.setattr(
        "terran_tpu.io.video.writer.VideoWriter._prepare_ffmpeg_cmd",
        lambda self: [sys.executable, "-c", sink],
    )

    runner = CliRunner()
    result = runner.invoke(
        video_example.find_video,
        [str(tmp_path / "in.mp4"), str(tmp_path / "out.mp4"),
         "--batch-size", "3"],
    )
    assert result.exit_code == 0, result.output
    # Every frame was rendered and written.
    assert out_raw.stat().st_size == frames * 64 * 48 * 3


def test_video_example_pipeline_engine(stocked_store, tmp_path, monkeypatch,
                                       rng):
    import video as video_example

    frames = 6
    probe = {
        "streams": [{"codec_type": "video", "width": 64, "height": 48,
                     "avg_frame_rate": "3/1", "duration": "2.0"}],
        "format": {"duration": "2.0"},
    }
    monkeypatch.setattr(
        "terran_tpu.io.video.reader.ffmpeg_probe", lambda p, **kw: probe
    )
    emit = (
        "import sys\n"
        f"data = bytes(range(256)) * (64 * 48 * 3 * {frames} // 256 + 1)\n"
        f"sys.stdout.buffer.write(data[:64 * 48 * 3 * {frames}])\n"
    )
    monkeypatch.setattr(
        "terran_tpu.io.video.reader.Video._prepare_ffmpeg_cmd",
        lambda self: [sys.executable, "-c", emit],
    )
    out_raw = tmp_path / "sink.raw"
    sink = (
        "import sys, shutil\n"
        f"shutil.copyfileobj(sys.stdin.buffer, open(r'{out_raw}', 'wb'))\n"
    )
    monkeypatch.setattr(
        "terran_tpu.io.video.writer.VideoWriter._prepare_ffmpeg_cmd",
        lambda self: [sys.executable, "-c", sink],
    )

    runner = CliRunner()
    result = runner.invoke(
        video_example.find_video,
        [str(tmp_path / "in.mp4"), str(tmp_path / "out.mp4"),
         "--batch-size", "3", "--engine", "pipeline"],
    )
    assert result.exit_code == 0, result.output
    assert out_raw.stat().st_size == frames * 64 * 48 * 3
