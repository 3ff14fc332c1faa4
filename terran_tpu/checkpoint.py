"""Pretrained-checkpoint registry, resolution, download and CLI.

Mirrors the reference's checkpoint manager
(/root/reference/terran/checkpoint.py): a hardcoded registry of pretrained
weights with (task, alias) addressing, a filesystem database under the user's
home directory, lazy interactive download on first model use, and
list/info/download/delete CLI commands.

Differences from the reference:
- Weights are stored as converted JAX pytrees (``<id>.npz``); a ``convert``
  command (and automatic conversion on download) turns the upstream torch
  ``.pth`` files into that format via ``terran_tpu.utils.convert``.
- Checkpoint download retries with backoff (the reference fails on the first
  error, checkpoint.py:351-352).
"""

import importlib
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

import click

DEFAULT_HOME = Path("~/.terran-tpu")
CHECKPOINT_DIR = "checkpoints"

LABELS_BY_TASK = {
    "face-detection": "Face detection (`terran_tpu.face.Detection`)",
    "face-recognition": "Face recognition (`terran_tpu.face.Recognition`)",
    "pose-estimation": "Pose estimation (`terran_tpu.pose.Estimation`)",
}

# Same ids/tasks/aliases as the reference registry (checkpoint.py:29-103) so
# users can address checkpoints identically; URLs point at the reference's
# released torch weights, converted on download.
CHECKPOINTS = [
    {
        "id": "b5d77fff",
        "name": "RetinaFace",
        "description": "RetinaFace with mnet backbone.",
        "task": "face-detection",
        "class": "terran_tpu.face.detection.RetinaFaceDetector",
        "model_key": "retinaface",
        "alias": "gpu-realtime",
        "default": True,
        "performance": 1.0,
        "evaluation": {"value": 0.76, "metric": "mAP", "is_reported": False},
        "url": (
            "https://github.com/nagitsu/terran/releases/download/0.0.1/"
            "retinaface-mnet.pth"
        ),
    },
    {
        "id": "d206e4b0",
        "name": "ArcFace",
        "description": "ArcFace with Resnet 100 backbone.",
        "task": "face-recognition",
        "class": "terran_tpu.face.recognition.ArcFaceRecognizer",
        "model_key": "arcface",
        "alias": "gpu-realtime",
        "default": True,
        "performance": 0.9,
        "evaluation": {"value": 0.80, "metric": "accuracy", "is_reported": False},
        "url": (
            "https://github.com/nagitsu/terran/releases/download/0.0.1/"
            "arcface-resnet100.pth"
        ),
    },
    {
        "id": "11a769ad",
        "name": "OpenPose",
        "description": (
            "OpenPose with VGG backend, 2017 version. Has some modifications, "
            "improving computational efficiency by giving up mAP."
        ),
        "task": "pose-estimation",
        "class": "terran_tpu.pose.openpose.OpenPoseEstimator",
        "model_key": "openpose",
        "alias": "gpu-realtime",
        "default": True,
        "performance": 1.8,
        "evaluation": {"value": 0.65, "metric": "mAP", "is_reported": True},
        "url": (
            "https://github.com/nagitsu/terran/releases/download/0.0.1/"
            "openpose-body.pth"
        ),
    },
]


def get_home(create_if_missing=True):
    """Framework home dir; override with TERRAN_TPU_HOME (ref: TERRAN_HOME,
    checkpoint.py:118-120)."""
    path = Path(os.environ.get("TERRAN_TPU_HOME", DEFAULT_HOME)).expanduser()
    if create_if_missing:
        path.mkdir(parents=True, exist_ok=True)
    return path


def get_checkpoints_directory():
    path = get_home() / CHECKPOINT_DIR
    path.mkdir(parents=True, exist_ok=True)
    return path


def read_checkpoint_db():
    """Database = registry x filesystem presence (checkpoint.py:145-169)."""
    local = {p.stem for p in get_checkpoints_directory().glob("*.npz")}
    checkpoints = [
        {
            "status": "DOWNLOADED" if c["id"] in local else "NOT_DOWNLOADED",
            "local_path": (
                get_checkpoints_directory() / f"{c['id']}.npz"
                if c["id"] in local else None
            ),
            **c,
        }
        for c in CHECKPOINTS
    ]
    return {"checkpoints": checkpoints}


def get_checkpoint(db, id_or_alias):
    """Resolve by id, or by (task, alias-or-default) tuple (ref :172-210)."""
    if isinstance(id_or_alias, tuple):
        task_name, alias = id_or_alias
        selected = [
            c for c in db["checkpoints"]
            if c["task"] == task_name
            and (c["alias"] == alias if alias is not None else c["default"])
        ]
    else:
        selected = [c for c in db["checkpoints"] if c["id"] == id_or_alias]
    if not selected:
        return None
    if len(selected) > 1:
        click.echo(
            f"Multiple checkpoints found for '{id_or_alias}' "
            f"({len(selected)}). Returning first."
        )
    return selected[0]


def get_class_for_checkpoint(task_name, alias):
    """Dynamic-import the wrapper class for a (task, alias) (ref :213-245)."""
    db = read_checkpoint_db()
    checkpoint = get_checkpoint(db, (task_name, alias))
    if not checkpoint:
        raise ValueError("Checkpoint not found.")
    module_path, class_name = checkpoint["class"].rsplit(".", maxsplit=1)
    return getattr(importlib.import_module(module_path), class_name)


def get_checkpoint_by_class(db, class_path):
    selected = [c for c in db["checkpoints"] if c["class"] == class_path]
    return selected[0] if selected else None


def get_checkpoint_path(model_class_path, prompt=True):
    """Local path to converted weights, downloading+converting if needed
    (ref :277-328)."""
    db = read_checkpoint_db()
    checkpoint = get_checkpoint_by_class(db, model_class_path)
    if not checkpoint:
        raise ValueError("Checkpoint not found.")

    if checkpoint["status"] == "NOT_DOWNLOADED":
        if prompt and sys.stdout.isatty():
            try:
                click.confirm(
                    "Checkpoint not present locally. Want to download it?",
                    abort=True,
                )
            except click.Abort:
                raise
            except Exception:
                click.echo("Checkpoint not present locally. Downloading it")
        download_remote_checkpoint(db, checkpoint)

    return checkpoint["local_path"]


def load_checkpoint_params(model_class_path, prompt=True):
    from terran_tpu.utils.convert import load_params

    return load_params(get_checkpoint_path(model_class_path, prompt=prompt))


def convert_local_checkpoint(checkpoint, pth_path):
    """Convert a local torch ``.pth`` into the store as ``<id>.npz``."""
    from terran_tpu.utils.convert import convert_torch_checkpoint

    out_path = get_checkpoints_directory() / f"{checkpoint['id']}.npz"
    convert_torch_checkpoint(checkpoint["model_key"], pth_path, out_path)
    checkpoint["status"] = "DOWNLOADED"
    checkpoint["local_path"] = out_path
    return out_path


def download_remote_checkpoint(db, checkpoint, retries=3):
    """Stream-download the upstream ``.pth``, convert, and store (ref
    :331-377, plus retry-with-backoff)."""
    import requests

    if checkpoint["local_path"] and checkpoint["local_path"].exists():
        click.echo(
            f"Checkpoint file already present at {checkpoint['local_path']}."
        )
        return

    tempdir = tempfile.mkdtemp()
    pth_path = Path(tempdir) / f"{checkpoint['id']}.pth"
    try:
        for attempt in range(retries):
            try:
                response = requests.get(checkpoint["url"], stream=True, timeout=60)
                if response.status_code != 200:
                    raise ValueError(
                        f"Invalid checkpoint URL {checkpoint['url']}"
                    )
                length = int(response.headers.get("Content-Length", 0))
                chunk_size = 16 * 1024
                progressbar = click.progressbar(
                    response.iter_content(chunk_size=chunk_size),
                    length=max(1, length // chunk_size),
                    label="Downloading checkpoint...",
                )
                with open(pth_path, "wb") as f, progressbar as content:
                    for chunk in content:
                        f.write(chunk)
                break
            except (requests.RequestException, ValueError):
                if attempt == retries - 1:
                    raise
                time.sleep(2.0 ** attempt)

        out_path = convert_local_checkpoint(checkpoint, pth_path)
        click.echo(f"Checkpoint downloaded and converted to {out_path}.")
    finally:
        shutil.rmtree(tempdir, ignore_errors=True)


# ---------------------------------------------------------------------------
# CLI. Same command surface as the reference (list/info/download/delete,
# ref :380-508) plus `convert`; the presentation below is this framework's
# own (content-sized columns, field tables) rather than the reference's
# fixed templates.
# ---------------------------------------------------------------------------

def _columns(rows, min_widths):
    """Per-column widths sized to content (with floors)."""
    widths = list(min_widths)
    for row in rows:
        for i, cell in enumerate(row):
            widths[i] = max(widths[i], len(str(cell)))
    return widths


def _grid_row(cells, widths):
    return "  ".join(str(c).ljust(w) for c, w in zip(cells, widths)).rstrip()


@click.command(name="list", help="List available checkpoints.")
def list_cmd():
    db = read_checkpoint_db()
    if not db["checkpoints"]:
        click.echo("No checkpoints available.")
        return

    by_task = {}
    for checkpoint in db["checkpoints"]:
        by_task.setdefault(checkpoint["task"], []).append(checkpoint)

    heading = ("NAME", "ALIAS", "EVAL", "PERF", "STATUS")
    all_rows = []
    sections = []
    for task, group in by_task.items():
        rows = [
            (
                f"{c['name']} ({c['id']})",
                c["alias"],
                "{:.2f} {}".format(
                    c["evaluation"]["value"], c["evaluation"]["metric"]
                ),
                f"{c['performance']:.1f}",
                c["status"],
            )
            for c in group
        ]
        sections.append((LABELS_BY_TASK.get(task, task), rows))
        all_rows.extend(rows)

    widths = _columns([heading] + all_rows, min_widths=(4, 4, 4, 4, 4))
    rule = "-" * (sum(widths) + 2 * (len(widths) - 1))
    for label, rows in sections:
        click.echo(label)
        click.echo(rule)
        click.echo(_grid_row(heading, widths))
        for row in rows:
            click.echo(_grid_row(row, widths))
        click.echo()


@click.command(name="info", help="Display detailed information on checkpoint.")
@click.argument("checkpoint_id")
def info_cmd(checkpoint_id):
    db = read_checkpoint_db()
    checkpoint = get_checkpoint(db, checkpoint_id)
    if not checkpoint:
        click.echo(f"Checkpoint '{checkpoint_id}' not found in index.")
        return

    evaluation = "{:.3f} {}".format(
        checkpoint["evaluation"]["value"], checkpoint["evaluation"]["metric"]
    )
    if checkpoint["evaluation"]["is_reported"]:
        evaluation += " (self-reported)"
    if checkpoint["local_path"]:
        status = f"DOWNLOADED (at `{checkpoint['local_path']}`)"
    else:
        status = "NOT_DOWNLOADED"

    click.echo(
        f"{checkpoint['name']} ({checkpoint['id']}, {checkpoint['alias']})"
    )
    if checkpoint["description"]:
        click.echo(f" > {checkpoint['description']}")
    click.echo()

    fields = [
        ("Task", LABELS_BY_TASK.get(checkpoint["task"], checkpoint["task"])),
        ("Class", f"`{checkpoint['class']}`"),
        ("Evaluation", evaluation),
        ("Performance", f"{checkpoint['performance']:.2f} units"),
        ("Upstream URL", checkpoint["url"]),
        ("Status", status),
    ]
    name_width = max(len(name) for name, _ in fields)
    for name, value in fields:
        click.echo(f"{name.ljust(name_width)}  {value}")


@click.command(name="delete", help="Delete local files for a checkpoint.")
@click.argument("checkpoint_id")
def delete_cmd(checkpoint_id):
    db = read_checkpoint_db()
    checkpoint = get_checkpoint(db, checkpoint_id)
    if not checkpoint:
        click.echo(f"Checkpoint `{checkpoint_id}` not found in index.")
        return
    if checkpoint["status"] == "NOT_DOWNLOADED":
        click.echo("Checkpoint isn't downloaded. Nothing to delete.")
        return
    checkpoint["local_path"].unlink()
    click.echo(f"Checkpoint `{checkpoint['id']}` deleted successfully.")


@click.command(name="download", help="Download a remote checkpoint.")
@click.argument("checkpoint_id")
def download_cmd(checkpoint_id):
    db = read_checkpoint_db()
    checkpoint = get_checkpoint(db, checkpoint_id)
    if not checkpoint:
        click.echo(f"Checkpoint `{checkpoint_id}` not found in index.")
        return
    if checkpoint["status"] != "NOT_DOWNLOADED":
        click.echo("Checkpoint is already downloaded.")
        return
    download_remote_checkpoint(db, checkpoint)


@click.command(
    name="convert",
    help="Convert a local torch .pth file into the checkpoint store.",
)
@click.argument("checkpoint_id")
@click.argument("pth_path", type=click.Path(exists=True))
def convert_cmd(checkpoint_id, pth_path):
    db = read_checkpoint_db()
    checkpoint = get_checkpoint(db, checkpoint_id)
    if not checkpoint:
        click.echo(f"Checkpoint `{checkpoint_id}` not found in index.")
        return
    out_path = convert_local_checkpoint(checkpoint, pth_path)
    click.echo(f"Converted to {out_path}.")


@click.group(name="checkpoint", help="Checkpoint management commands.")
def checkpoint_cmd():
    pass


checkpoint_cmd.add_command(delete_cmd)
checkpoint_cmd.add_command(download_cmd)
checkpoint_cmd.add_command(info_cmd)
checkpoint_cmd.add_command(list_cmd)
checkpoint_cmd.add_command(convert_cmd)
