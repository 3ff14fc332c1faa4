from terran_tpu.io.image import open_image, resolve_images  # noqa
from terran_tpu.io.video import (  # noqa
    EndOfVideo, ParallelVideo, SyntheticVideo, Video, VideoClosed,
    VideoWriter, device_prefetch, fixed_shape_batches, open_video,
    open_video_parallel, threaded_device_put, write_video,
)
