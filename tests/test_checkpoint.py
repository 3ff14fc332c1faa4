"""Checkpoint registry resolution, store round-trips, CLI, and download
retry behaviour (network mocked)."""

import numpy as np
import pytest
from click.testing import CliRunner

from terran_tpu import checkpoint as ckpt
from terran_tpu.utils.convert import load_params, save_params


def test_registry_resolution_by_id_and_alias():
    db = ckpt.read_checkpoint_db()
    by_id = ckpt.get_checkpoint(db, "b5d77fff")
    assert by_id["name"] == "RetinaFace"
    by_alias = ckpt.get_checkpoint(db, ("face-detection", "gpu-realtime"))
    assert by_alias["id"] == "b5d77fff"
    by_default = ckpt.get_checkpoint(db, ("pose-estimation", None))
    assert by_default["name"] == "OpenPose"
    assert ckpt.get_checkpoint(db, "nope") is None


def test_get_class_for_checkpoint_imports_wrappers():
    cls = ckpt.get_class_for_checkpoint("face-detection", None)
    assert cls.__name__ == "RetinaFaceDetector"
    with pytest.raises(ValueError):
        ckpt.get_class_for_checkpoint("no-such-task", None)


def test_params_store_roundtrip(tmp_path):
    params = {"a": {"b": np.arange(6).reshape(2, 3).astype(np.float32)},
              "c": np.ones(4)}
    path = tmp_path / "x.npz"
    save_params(path, params)
    loaded = load_params(path)
    np.testing.assert_array_equal(loaded["a"]["b"], params["a"]["b"])
    np.testing.assert_array_equal(loaded["c"], params["c"])


def test_download_retries_then_succeeds(monkeypatch, tmp_path):
    """Transient network failures retry with backoff (the reference died on
    the first error, checkpoint.py:351-352)."""
    import requests as requests_module

    calls = {"n": 0}

    class FakeResponse:
        status_code = 200
        headers = {"Content-Length": "64"}

        def iter_content(self, chunk_size):
            yield b"x" * 64

    def fake_get(url, stream=True, timeout=None):
        calls["n"] += 1
        if calls["n"] < 3:
            raise requests_module.ConnectionError("flaky")
        return FakeResponse()

    monkeypatch.setattr(requests_module, "get", fake_get)
    monkeypatch.setattr("time.sleep", lambda s: None)

    converted = {}

    def fake_convert(checkpoint, pth_path):
        converted["path"] = pth_path
        out = ckpt.get_checkpoints_directory() / f"{checkpoint['id']}.npz"
        out.write_bytes(b"npz")
        checkpoint["status"] = "DOWNLOADED"
        checkpoint["local_path"] = out
        return out

    monkeypatch.setattr(ckpt, "convert_local_checkpoint", fake_convert)

    db = ckpt.read_checkpoint_db()
    checkpoint = ckpt.get_checkpoint(db, "b5d77fff")
    ckpt.download_remote_checkpoint(db, checkpoint)
    assert calls["n"] == 3
    assert checkpoint["status"] == "DOWNLOADED"
    checkpoint["local_path"].unlink()


def test_download_gives_up_after_retries(monkeypatch):
    import requests as requests_module

    def always_fail(url, stream=True, timeout=None):
        raise requests_module.ConnectionError("down")

    monkeypatch.setattr(requests_module, "get", always_fail)
    monkeypatch.setattr("time.sleep", lambda s: None)

    db = ckpt.read_checkpoint_db()
    checkpoint = ckpt.get_checkpoint(db, "b5d77fff")
    with pytest.raises(requests_module.ConnectionError):
        ckpt.download_remote_checkpoint(db, checkpoint)


def test_cli_list_and_info():
    runner = CliRunner()
    result = runner.invoke(ckpt.checkpoint_cmd, ["list"])
    assert result.exit_code == 0
    assert "RetinaFace (b5d77fff)" in result.output
    assert "NOT_DOWNLOADED" in result.output

    result = runner.invoke(ckpt.checkpoint_cmd, ["info", "d206e4b0"])
    assert result.exit_code == 0
    assert "ArcFace" in result.output
    assert "terran_tpu.face.recognition.ArcFaceRecognizer" in result.output

    result = runner.invoke(ckpt.checkpoint_cmd, ["info", "bogus"])
    assert "not found" in result.output


def test_cli_convert_and_delete(tmp_path, monkeypatch):
    import torch

    from torch_oracle import random_retinaface_state_dict

    sd = {
        k: torch.as_tensor(np.ascontiguousarray(v))
        for k, v in random_retinaface_state_dict(
            np.random.default_rng(0)
        ).items()
    }
    pth = tmp_path / "rf.pth"
    torch.save(sd, pth)

    runner = CliRunner()
    result = runner.invoke(ckpt.checkpoint_cmd, ["convert", "b5d77fff",
                                                 str(pth)])
    assert result.exit_code == 0, result.output
    db = ckpt.read_checkpoint_db()
    assert ckpt.get_checkpoint(db, "b5d77fff")["status"] == "DOWNLOADED"

    # The converted params load into the model wrapper.
    params = ckpt.load_checkpoint_params(
        "terran_tpu.face.detection.RetinaFaceDetector"
    )
    assert "base" in params and "heads" in params

    result = runner.invoke(ckpt.checkpoint_cmd, ["delete", "b5d77fff"])
    assert "deleted successfully" in result.output
    db = ckpt.read_checkpoint_db()
    assert ckpt.get_checkpoint(db, "b5d77fff")["status"] == "NOT_DOWNLOADED"
