"""Video I/O: ffmpeg-subprocess reader/writer with background threads.

Constants match the reference (/root/reference/terran/io/video/__init__.py):
reader prefetch of 1 batch (~190 MB for 32x1080p) and a 64-frame writer
buffer.
"""

DEFAULT_READER_BUFFER_SIZE = 1
DEFAULT_WRITER_BUFFER_SIZE = 64


class EndOfVideo(Exception):
    pass


class VideoClosed(Exception):
    pass


from terran_tpu.io.video.reader import Video, open_video  # noqa
from terran_tpu.io.video.parallel import ParallelVideo, open_video_parallel  # noqa
from terran_tpu.io.video.writer import VideoWriter, write_video  # noqa
from terran_tpu.io.video.synthetic import SyntheticVideo  # noqa
from terran_tpu.io.video.prefetch import (  # noqa
    device_prefetch, fixed_shape_batches, threaded_device_put,
)
