"""Host->HBM double-buffered prefetch for video batches.

The reference overlaps ffmpeg decode with GPU compute via a reader thread
(/root/reference/terran/io/video/reader.py:126-162). On TPU the remaining
gap is the host->device transfer itself: this iterator keeps ``depth``
batches in flight on device, so while the model consumes batch *i*, batch
*i+1* is already crossing PCIe/ICI and batch *i+2* is being decoded by the
reader thread. JAX's async dispatch does the rest.
"""

import queue
import threading
from collections import deque

import numpy as np
import jax


def fixed_shape_batches(batch_iterator, batch_size=None):
    """Re-emit batches at a fixed leading size, padding the trailing batch.

    XLA compiles one program per shape, so a short final batch from a video
    would trigger a fresh multi-minute compilation for one batch of work.
    Yields ``(batch, valid_count)`` where the batch always has
    ``batch_size`` frames (trailing frames repeat the last valid frame) and
    ``valid_count`` says how many are real.

    ``batch_size`` defaults to the first batch's size.
    """
    for batch in batch_iterator:
        batch = np.asarray(batch)
        if batch.ndim == 3:
            batch = batch[None]
        if batch_size is None:
            batch_size = batch.shape[0]
        start = 0
        while start < batch.shape[0]:
            chunk = batch[start: start + batch_size]
            start += batch_size
            n = chunk.shape[0]
            if n < batch_size:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], batch_size - n, axis=0)]
                )
            yield chunk, n


def device_prefetch(batch_iterator, depth=None, device=None):
    """Yield device-resident arrays from a host batch iterator.

    Parameters
    ----------
    batch_iterator : iterator of numpy arrays (e.g. a ``Video``).
    depth : number of batches to keep in flight on device (>= 1).
    device : target ``jax.Device`` (default: first device).
    """
    if depth is None:
        from terran_tpu.config import get_config

        depth = get_config().device_prefetch_depth
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


def threaded_device_put(batch_iterator, depth=2, put=None):
    """Yield device-resident arrays, uploading from a background thread.

    ``device_prefetch`` relies on ``jax.device_put`` being asynchronous; on
    runtimes where the transfer blocks the calling thread (e.g. tunneled
    TPU relays), that stalls the dispatch loop. Here a worker thread owns
    the uploads and feeds a bounded queue of ``depth`` in-flight batches,
    so host->device transfer always overlaps the consumer's dispatch,
    compute wait, and result downloads.

    Exceptions from the source iterator or the upload propagate to the
    consumer at the point of ``next()``.
    """
    if put is None:
        put = jax.device_put

    results = queue.Queue(maxsize=max(1, depth))
    done = object()
    stop = threading.Event()
    failure = []

    def offer(item):
        """Bounded put that gives up if the consumer went away."""
        while not stop.is_set():
            try:
                results.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def uploader():
        try:
            for batch in batch_iterator:
                if not offer(put(batch)):
                    return
        except BaseException as error:  # propagated below
            failure.append(error)
        finally:
            offer(done)

    worker = threading.Thread(
        target=uploader, name="terran-tpu-uploader", daemon=True
    )
    worker.start()

    try:
        while True:
            item = results.get()
            if item is done:
                worker.join()
                if failure:
                    raise failure[0]
                return
            yield item
    finally:
        stop.set()
