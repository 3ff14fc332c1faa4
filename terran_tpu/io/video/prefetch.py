"""Host->HBM double-buffered prefetch for video batches.

The reference overlaps ffmpeg decode with GPU compute via a reader thread
(/root/reference/terran/io/video/reader.py:126-162). On TPU the remaining
gap is the host->device transfer itself: this iterator keeps ``depth``
batches in flight on device, so while the model consumes batch *i*, batch
*i+1* is already crossing PCIe/ICI and batch *i+2* is being decoded by the
reader thread. JAX's async dispatch does the rest.
"""

from collections import deque

import jax


def device_prefetch(batch_iterator, depth=2, device=None):
    """Yield device-resident arrays from a host batch iterator.

    Parameters
    ----------
    batch_iterator : iterator of numpy arrays (e.g. a ``Video``).
    depth : number of batches to keep in flight on device (>= 1).
    device : target ``jax.Device`` (default: first device).
    """
    if device is None:
        device = jax.devices()[0]

    buffer = deque()
    iterator = iter(batch_iterator)

    def enqueue():
        try:
            batch = next(iterator)
        except StopIteration:
            return False
        buffer.append(jax.device_put(batch, device))
        return True

    for _ in range(depth):
        if not enqueue():
            break

    while buffer:
        batch = buffer.popleft()
        enqueue()
        yield batch
