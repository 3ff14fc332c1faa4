"""Image input utilities (ref: /root/reference/terran/io/image.py).

``open_image`` accepts filesystem paths and URLs (with a Chrome user agent
for URLs, image.py:10-13). ``resolve_images`` recursively collects valid
images in batches; unlike the reference, the trailing partial batch is
flushed instead of silently dropped (reference generator ends at
image.py:94 without yielding the remainder — a real data-loss bug for
directory sizes not divisible by the batch size).
"""

from io import BytesIO
from pathlib import Path
from urllib.parse import urlparse

import numpy as np
from PIL import Image

USER_AGENT = (
    "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 (KHTML, like Gecko) "
    "Chrome/51.0.2704.103 Safari/537.36"
)


def open_image(uri):
    """Open the image at ``uri`` (path or URL) as an RGB HWC uint8 array."""
    if isinstance(uri, Path):
        image = Image.open(uri)
    elif urlparse(str(uri)).scheme in ("http", "https"):
        import requests

        response = requests.get(uri, headers={"User-Agent": USER_AGENT})
        image = Image.open(BytesIO(response.content))
    else:
        image = Image.open(Path(uri).expanduser())

    image = np.asarray(image.convert("RGB"))
    if len(image.shape) == 2:
        image = np.stack([image] * 3, axis=-1)
    return image


def resolve_images(path, batch_size=None):
    """Yield paths (or batches of paths) of all valid images under ``path``.

    Validity is checked by PIL ``verify()`` like the reference
    (image.py:80-84). With ``batch_size`` set, the final partial batch IS
    yielded (reference bug fixed; see module docstring).
    """
    if not isinstance(path, Path):
        path = Path(path).expanduser()

    batch = []
    for f in sorted(path.glob("**/*")):
        if not f.is_file():
            continue
        try:
            Image.open(f).verify()
        except Exception:
            continue

        if batch_size is None:
            yield f
            continue

        batch.append(f)
        if len(batch) >= batch_size:
            yield batch
            batch = []

    if batch_size is not None and batch:
        yield batch
